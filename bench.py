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

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the pallas_block eval graph compiles through the
# remote Mosaic server (~minutes cold); cached recompiles are seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_DIALOGS_PER_SEC_PER_CHIP = 0.03


def main():
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.data.dataset import flatten_for_forward
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.models import vilbert

    # production eval configuration: fused whole-sub-block Pallas kernels
    # (scripts/bench_e2e_ab.py: 1.59 vs 1.31 dialogs/s/chip for plain XLA)
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    # val_lm-shaped work: 2 dialogs x 10 rounds x 100 candidates per batch,
    # full host->device path through the production evaluator (compact
    # per-image feature staging + pipelined chunks).
    B, R, O, L, Rg = 2, 10, 100, cfg.max_seq_len, cfg.max_regions

    def make_val_batch():
        # label tokens sit in the masked SECOND answer copy
        # [ctx_end, ctx_end + ans_len) like real val_lm data
        # (data/encoding.py encode_gen flags the copy starting AT ctx_end);
        # earlier revisions parked them at a fixed 200:208 window, which
        # contradicted the descriptors' own layout
        ctx_end = rng.integers(60, 200, (B, R, O)).astype(np.int32)
        ans_len = rng.integers(2, 9, (B, R, O)).astype(np.int32)
        labels = np.full((B, R, O, L), -1, np.int32)
        pos = np.arange(L)[None, None, None, :]
        span = (pos >= ctx_end[..., None]) & \
               (pos < (ctx_end + ans_len)[..., None])
        labels[span] = rng.integers(0, cfg.vocab_size, int(span.sum()))
        return {
            "tokens": rng.integers(1, cfg.vocab_size,
                                   (B, R, O, L)).astype(np.int32),
            "segments": rng.integers(0, 2, (B, R, O, L)).astype(np.int32),
            "mode": np.ones((B, R, O), np.int32),
            "ctx_end": ctx_end,
            "ans_len": ans_len,
            "mlm_labels": labels,
            "image_feat": rng.normal(size=(B, Rg, 2048)).astype(np.float32),
            "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
            "image_mask": np.ones((B, Rg), np.float32),
        }

    # chunk scan on v5e (scripts/bench_e2e_ab.py, pallas_block):
    # 125 -> 1.67, 200 -> 1.68, 250 -> 1.79/1.72, 500 -> 1.58-1.67,
    # 1000 -> 1.63 dialogs/s/chip; 250 wins (host->device staging of the
    # next chunk overlaps device compute of the current one).
    # Round 3: the evaluator scores in ascending-extent order at per-chunk
    # length buckets (multiples of L/8, exact under the descriptor masks)
    # — 1.86 -> 2.59 d/s/chip on this protocol
    for chunk in (250, 125):
        try:
            ev = RankingEvaluator(cfg, chunk_size=chunk, dtype=jnp.bfloat16,
                                  need_lm=True, need_nsp=False)
            flats = [flatten_for_forward(make_val_batch(), train=False,
                                         compact_images=True)
                     for _ in range(3)]
            for f in flats:                      # compile + warmup
                ev.score_flat(params, f)
            # pinned protocol: 9 repeats of 6 scoring passes over 3 distinct
            # batches (byte-identical dispatches can return memoised through
            # the TPU relay); report the median repeat. 9 (was 5) damps the
            # +/-4% cross-process thermal/tunnel drift observed on v5e.
            iters, repeats = 6, []
            for _ in range(9):
                t0 = time.perf_counter()
                for i in range(iters):
                    ev.score_flat(params, flats[i % 3])
                dt = time.perf_counter() - t0
                repeats.append(B * R * O * iters / dt)
            seq_per_sec = sorted(repeats)[len(repeats) // 2]
            B_used = chunk
            break
        except Exception:  # OOM fallback to smaller chunks
            if chunk == 125:
                raise
            continue
    B = B_used

    dialogs_per_sec = seq_per_sec / 1000.0   # 10 rounds x 100 options
    print(json.dumps({
        "metric": "val_lm_dialogs_per_sec_per_chip",
        "value": round(dialogs_per_sec, 4),
        "unit": "dialogs/s/chip",
        "vs_baseline": round(dialogs_per_sec / BASELINE_DIALOGS_PER_SEC_PER_CHIP, 2),
        # the reference publishes no throughput number; the baseline is the
        # documented FLOPs-model estimate above, not a measurement
        "baseline_basis": "flops-model-estimate",
        "detail": {"seq_per_sec": round(seq_per_sec, 1), "batch": B,
                   "repeats_seq_per_sec": [round(r, 1) for r in repeats],
                   "backend": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
