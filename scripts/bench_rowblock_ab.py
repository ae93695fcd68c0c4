"""Interleaved A/B: packed answer-pass row-block size (PrefixScorer
``row_block``).

The serving loop is device-bound on the answer pass (ROADMAP "TPU backlog"
#7), whose fused kernel grid runs one (group, 128-row block) step at a
time. A bigger block halves the grid steps and doubles the projection
matmul M-dim (128 -> 256 rows against the same [768, 768] weights); a
smaller one cuts bin-packing fragmentation for short answers. This sweeps
row_block over the production coalesced-pair workload (40-slate batches,
group 40) with the scorer driven directly (all bench slates are
prefix-eligible), pipelined one batch in flight, reps interleaved
(CLAUDE.md: only same-process interleaved A/Bs are decisive through the
tunnel).

Note: kernel VMEM grows with the block (x/k/v rows, [Rw, K+Rw] fp32 probs
per head, the [Rw, Rw] row->row bias) — row_block 512 exceeds what the
16 MB scoped limit can hold with the weights resident, so the sweep tops
out at 256.

Usage: python scripts/bench_rowblock_ab.py [reps=7] [blocks=64,128,256] \
           [workload=pinned|realistic]

The pinned workload is the headline's uniform[58,192) extents; realistic
is bench.py's second series (ctx 30->250 growth over the 10 rounds — longer
max contexts, so the K/V-cache traffic per extra grid step is larger).
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
    blocks = ([int(x) for x in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [64, 128, 256])
    workload = sys.argv[3] if len(sys.argv) > 3 else "pinned"
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, R, O = 2, 10, 100
    ctx_fn = (realistic_ctx_range(cfg.max_seq_len)
              if workload == "realistic" else None)
    ctx_range = (58, 192)
    if workload.startswith("bucket"):
        # pin every group's context into ONE eighth-bucket (Lcb == N):
        # contexts drawn from (N-30, N] so quarter_bucket(max lc) == N
        n = int(workload[len("bucket"):])
        ctx_range = (n - 30, n + 1)
    batches = [make_val_batch(rng, cfg, B, R, O, ctx_range=ctx_range,
                              ctx_range_fn=ctx_fn)
               for _ in range(6)]
    pairs = [_merge_batches(batches[i:i + 2]) for i in range(0, 6, 2)]
    n_dialogs = 6 * B * R / 10

    scs = {}
    for rb in blocks:
        sc = PrefixScorer(cfg, dtype=jnp.bfloat16, group=40, row_block=rb)
        for p in pairs:
            scores, ok = sc.score(params, p)      # warmup/compile
            assert ok.all() and np.isfinite(scores["ll_sum"]).all()
        scs[f"rb{rb}"] = sc

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
