"""Interleaved A/B: coalesced serving dispatches (-eval_coalesce).

The staging probe (scripts/bench_staging_probe.py, ROADMAP TPU backlog #7)
showed ~25-30 ms of per-dispatch relay overhead that one-batch-in-flight
pipelining does not fully hide. Coalescing pairs of val batches into ONE
prefix-scorer dispatch (group 40 over 40 slates instead of 2x group 20)
amortises that fixed cost over twice the work.

A: the pinned bench loop — 6 batches of B=2 (20 slates each), group 20.
B: the same 12 dialogs as 3 coalesced batches (40 slates each), group 40.
C: the same 12 dialogs as 2 coalesced batches (60 slates each), group 60.
All pipelined one batch in flight; reps interleaved (CLAUDE.md: only
same-process interleaved A/Bs are decisive through the tunnel).

Usage: python scripts/bench_coalesce_ab.py [reps=7] [realistic]
('realistic' switches the workload to the real-VisDial context growth
series, ctx 30->250 over 10 rounds)
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
from unimm_tpu.config import VilbertConfig  # noqa: E402
from unimm_tpu.eval.evaluator import RankingEvaluator, _merge_batches  # noqa: E402
from unimm_tpu.models import vilbert  # noqa: E402


def run_pipelined(ev, params, batches):
    t0 = time.perf_counter()
    pending = ev.score_slates_async(params, batches[0])
    for b in batches[1:]:
        nxt = ev.score_slates_async(params, b)
        pending()
        pending = nxt
    pending()
    return time.perf_counter() - t0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    realistic = "realistic" in sys.argv[2:]
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, R, O = 2, 10, 100
    kw = {}
    if realistic:
        from scripts.bench_workload import realistic_ctx_range
        kw["ctx_range_fn"] = realistic_ctx_range(cfg.max_seq_len)
        print("workload: realistic ctx growth 30->250")
    batches = [make_val_batch(rng, cfg, B, R, O, **kw) for _ in range(6)]
    series = {
        "coalesce1/group20": (20, batches),
        "coalesce2/group40": (40, [_merge_batches(batches[i:i + 2])
                                   for i in range(0, 6, 2)]),
        "coalesce3/group60": (60, [_merge_batches(batches[i:i + 3])
                                   for i in range(0, 6, 3)]),
    }
    n_dialogs = 6 * B * R / 10  # = 12 dialogs of 10 rounds

    evs = {}
    for name, (group, bs) in series.items():
        evs[name] = RankingEvaluator(cfg, chunk_size=250, dtype=jnp.bfloat16,
                                     need_lm=True, need_nsp=False,
                                     prefix_group=group)
        for b in bs:
            evs[name].score_slates(params, b)     # warmup/compile

    out = {name: [] for name in series}
    for r in range(reps):
        for name, (_, bs) in series.items():      # interleaved
            out[name].append(n_dialogs / run_pipelined(evs[name], params, bs))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for name, xs in out.items():
        print(name, "d/s:", [round(x, 2) for x in xs],
              "median", round(med(xs), 2))


if __name__ == "__main__":
    main()
