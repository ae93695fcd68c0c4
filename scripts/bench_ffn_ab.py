"""Interleaved A/B: fused Pallas FFN vs XLA FFN in the prefix answer pass.

The answer pass's per-layer attention sub-block is a fused kernel
(ops/pallas_prefix.py) but its 18 FFNs (12 t-layers + 6 c-layer t-FFNs)
ran on XLA, whose two matmuls materialise the [rows, 3072] intermediate
in HBM between them. On the flat path the fused FFN measured a tie at
[512, 256, 768] (ROADMAP), but the packed answer rows are a different
regime (16k rows/group at group 40). This A/Bs ``cfg.fused_ffn`` wired
into PrefixScorer._make_ffn over the production coalesced-pair workload,
same protocol as scripts/bench_rowblock_ab.py (interleaved same-process
reps — the only decisive protocol through the tunnel, CLAUDE.md).

Usage: python scripts/bench_ffn_ab.py [reps=7] [workload=pinned|realistic|bucketN]
"""

import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from scripts.bench_workload import make_val_batch  # noqa: E402
from scripts.bench_workload import realistic_ctx_range  # noqa: E402
from unimm_tpu.config import VilbertConfig  # noqa: E402
from unimm_tpu.eval.evaluator import _merge_batches  # noqa: E402
from unimm_tpu.eval.prefix import PrefixScorer  # noqa: E402
from unimm_tpu.models import vilbert  # noqa: E402


def run_pipelined(sc, params, batches):
    t0 = time.perf_counter()
    pending = sc.score_async(params, batches[0])
    for b in batches[1:]:
        nxt = sc.score_async(params, b)
        pending()
        pending = nxt
    pending()
    return time.perf_counter() - t0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    workload = sys.argv[2] if len(sys.argv) > 2 else "pinned"
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, R, O = 2, 10, 100
    ctx_fn = (realistic_ctx_range(cfg.max_seq_len)
              if workload == "realistic" else None)
    ctx_range = (58, 192)
    if workload.startswith("bucket"):
        # contexts inside ONE eighth-bucket (Lcb == n), capped to leave
        # room for the two answer copies (realistic_ctx_range's L-18 rule)
        n = int(workload[len("bucket"):])
        ctx_range = (n - 30, min(n + 1, cfg.max_seq_len - 17))
    batches = [make_val_batch(rng, cfg, B, R, O, ctx_range=ctx_range,
                              ctx_range_fn=ctx_fn)
               for _ in range(6)]
    pairs = [_merge_batches(batches[i:i + 2]) for i in range(0, 6, 2)]
    n_dialogs = 6 * B * R / 10

    scs = {}
    for name, ff in (("ffn_xla", False), ("ffn_fused", True)):
        sc = PrefixScorer(dataclasses.replace(cfg, fused_ffn=ff),
                          dtype=jnp.bfloat16, group=40)
        for p in pairs:
            scores, ok = sc.score(params, p)      # warmup/compile
            assert ok.all() and np.isfinite(scores["ll_sum"]).all()
        scs[name] = sc

    out = {name: [] for name in scs}
    for r in range(reps):
        for name, sc in scs.items():              # interleaved
            out[name].append(n_dialogs / run_pipelined(sc, params, pairs))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for name, xs in out.items():
        print(name, "d/s:", [round(x, 2) for x in xs],
              "median", round(med(xs), 2))


if __name__ == "__main__":
    main()
