"""Attribution for the PRODUCTION packed prefix path (round-5 refresh of
scripts/bench_prefix_attr.py, which probes the legacy W-layout at group 10).

Captures the exact (ctx_batch, rows, rb) the scorer stages for a coalesced
pair (group 40, adaptive row block) by wrapping _grp_fn_packed during a
normal score(), then times per-stage variants on the captured args with
the async-dispatch protocol (N distinct groups in flight, one host fetch):

  full       — production dispatch (prefill + packed answer pass + head)
  ans        — packed answer pass (+head) on precomputed caches
  nohead     — answer pass minus the label head
  nohead_xf  — same with the FFNs back on XLA (isolates the fused-FFN win)

Usage: python scripts/bench_prefix_attr_packed.py [reps=5] \
           [workload=bucket256|bucket192|pinned|realistic]
"""

import dataclasses
import functools
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


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    workload = sys.argv[2] if len(sys.argv) > 2 else "bucket256"
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ctx_fn = (realistic_ctx_range(cfg.max_seq_len)
              if workload == "realistic" else None)
    ctx_range = (58, 192)
    if workload.startswith("bucket"):
        n = int(workload[len("bucket"):])
        ctx_range = (n - 30, min(n + 1, cfg.max_seq_len - 17))
    batches = [make_val_batch(rng, cfg, 2, 10, 100, ctx_range=ctx_range,
                              ctx_range_fn=ctx_fn) for _ in range(6)]
    pairs = [_merge_batches(batches[i:i + 2]) for i in range(0, 6, 2)]

    sc = PrefixScorer(cfg, dtype=jnp.bfloat16, group=40)
    sx = PrefixScorer(dataclasses.replace(cfg, fused_ffn=False),
                      dtype=jnp.bfloat16, group=40)
    captured = []
    orig = sc._grp_fn_packed

    def spy(p, cb, r, rb):
        captured.append((cb, r, rb))
        return orig(p, cb, r, rb)

    sc._grp_fn_packed = spy
    for p in pairs:
        scores, ok = sc.score(params, p)
        assert ok.all() and np.isfinite(scores["ll_sum"]).all()
    sc._grp_fn_packed = orig
    assert captured, "no packed groups staged (workload fell back to W layout)"
    print(f"{len(captured)} packed groups captured; "
          f"rb={sorted({c[2] for c in captured})}, "
          f"P={sorted({c[1]['tokens'].shape[1] for c in captured})}, "
          f"Lcb={sorted({c[0]['tokens'].shape[1] for c in captured})}")

    caches = [jax.jit(sc._context_impl)(params, cb) for cb, _, _ in captured]
    jax.block_until_ready(caches)
    f_ans = jax.jit(sc._answer_impl_packed, static_argnames="rb")
    f_nohead = jax.jit(
        lambda p, c, r, rb: sc._answer_impl_packed(p, c, r, rb,
                                                   with_head=False),
        static_argnames="rb")
    f_nohead_xf = jax.jit(
        lambda p, c, r, rb: sx._answer_impl_packed(p, c, r, rb,
                                                   with_head=False),
        static_argnames="rb")

    variants = {
        "full": lambda i: orig(params, captured[i][0], captured[i][1],
                               rb=captured[i][2]),
        # the SAME production dispatch with the FFNs back on XLA — isolates
        # the fused-FFN effect inside the full graph (scheduling/memory
        # pressure differs from the precomputed-caches ans variants)
        "full_xf": lambda i: sx._grp_fn_packed(params, captured[i][0],
                                               captured[i][1],
                                               rb=captured[i][2]),
        "ans": lambda i: f_ans(params, caches[i], captured[i][1],
                               rb=captured[i][2]),
        "nohead": lambda i: f_nohead(params, caches[i], captured[i][1],
                                     captured[i][2]),
        "nohead_xf": lambda i: f_nohead_xf(params, caches[i],
                                           captured[i][1], captured[i][2]),
    }
    n = len(captured)
    res = {}
    for name, fn in variants.items():
        for i in range(n):
            fn(i)
        jax.block_until_ready([fn(i) for i in range(n)])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(i) for i in range(n)]
            s = sum(float(np.asarray(list(o.values())[0]).sum())
                    for o in outs)
            ts.append((time.perf_counter() - t0) / n * 1000)
        assert np.isfinite(s)
        res[name] = min(ts)
        print(f"{name:10s} {min(ts):7.2f} ms/group  (runs: "
              + " ".join(f"{t:.2f}" for t in ts) + ")", flush=True)
    print(f"ctx prefill ~= {res['full'] - res['ans']:.2f} ms/group; "
          f"label head ~= {res['ans'] - res['nohead']:.2f}; "
          f"fused-FFN saving (ans-only) ~= "
          f"{res['nohead_xf'] - res['nohead']:.2f}; "
          f"fused-FFN saving (full graph) ~= "
          f"{res['full_xf'] - res['full']:.2f}", flush=True)


if __name__ == "__main__":
    main()
