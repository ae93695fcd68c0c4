"""Benchmark: val_lm 100-candidate ranking throughput (dialogs/sec/chip).

Measures the flagship eval path — the BASELINE.json north-star metric: score
all 100 answer candidates per round, 10 rounds per dialog = 1000 sequences of
length 256 per dialog, returning per-sequence answer log-likelihood + NSP
logits (what /root/reference/val_lm.py does in 250-sequence chunks on 2 GPUs).

Baseline: the reference publishes no throughput numbers. The documented
estimate used for ``vs_baseline`` is a FLOPs model of its 2x 12GB-GPU eval:
~85 GFLOP fwd/sequence (incl. the full [256, 30522] MLM logits the reference
always materialises), ~11 TFLOP/s fp32 peak/GPU at 25% utilisation
=> ~32 seq/s/GPU => 0.032 dialogs/s per GPU; rounded to 0.03.

Prints ONE JSON line.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_DIALOGS_PER_SEC_PER_CHIP = 0.03


def main():
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.models import unimm, vilbert
    from __graft_entry__ import _synthetic_batch

    cfg = VilbertConfig()
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def score(params, batch):
        out = unimm.forward_eval(params, cfg, batch, dtype=jnp.bfloat16)
        return out["nsp_logits"], out["lm_nll_sum"]

    rng = np.random.default_rng(0)
    for B in (512, 256, 128, 64):
        # Distinct batches per iteration, and a forced host fetch per call:
        # jax.block_until_ready does not reliably block through the remote
        # TPU relay, so timing must be closed by a device->host transfer.
        batches = [_synthetic_batch(rng, cfg, B=B) for _ in range(4)]
        try:
            for b in batches:                      # compile + warmup
                float(np.asarray(score(params, b)[1]).sum())
            iters = 8
            t0 = time.perf_counter()
            for i in range(iters):
                out = score(params, batches[i % 4])
                float(np.asarray(out[1]).sum())
            dt = time.perf_counter() - t0
            seq_per_sec = B * iters / dt
            break
        except Exception:  # OOM fallback to smaller batch
            if B == 64:
                raise
            continue

    dialogs_per_sec = seq_per_sec / 1000.0   # 10 rounds x 100 options
    print(json.dumps({
        "metric": "val_lm_dialogs_per_sec_per_chip",
        "value": round(dialogs_per_sec, 4),
        "unit": "dialogs/s/chip",
        "vs_baseline": round(dialogs_per_sec / BASELINE_DIALOGS_PER_SEC_PER_CHIP, 2),
        "detail": {"seq_per_sec": round(seq_per_sec, 1), "batch": B,
                   "backend": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
