"""Attribution for the prefix-cache scorer: pure-compute floor per group
dispatch via the feedback-carried scan protocol (CLAUDE.md: output feeds the
next iteration's input inside ONE jit, defeating hoisting and relay
memoisation), against the end-to-end per-group wall time.

Variants:
  full      — context prefill + answer pass (production _group_impl)
  ctx       — context prefill alone (reduced to a scalar)
  ans       — answer pass on fixed caches (prefill outside the scan)
  nohead    — full minus the MLM label head (answer hiddens reduced)

Usage: python scripts/bench_prefix_attr.py [Lcb] [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench_prefix_ab import make_val_batch  # noqa: E402  (same workload)


def main():
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.eval.prefix import PrefixScorer, slate_eligibility
    from unimm_tpu.models import vilbert
    from unimm_tpu.ops import masks

    Lcb = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = VilbertConfig()
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = make_val_batch(rng, cfg, B=2, R=10, O=100)
    sc = PrefixScorer(cfg, dtype=jnp.bfloat16, group=10)

    # stage ONE group of 10 slates exactly as score() does
    ok, lc, rows_max = slate_eligibility(batch)
    NS, O, Lx = 20, 100, cfg.max_seq_len
    toks = np.asarray(batch["tokens"]).reshape(NS, O, Lx)
    segs = np.asarray(batch["segments"]).reshape(NS, O, Lx)
    labs = np.asarray(batch["mlm_labels"]).reshape(NS, O, Lx)
    ce = np.asarray(batch["ctx_end"]).reshape(NS, O).astype(np.int32)
    al = np.asarray(batch["ans_len"]).reshape(NS, O).astype(np.int32)
    g = np.nonzero(ok & (lc <= Lcb - 1))[0][:10]
    assert g.size == 10, (g.size, Lcb)
    W = 16
    img_of = np.repeat(np.arange(2, dtype=np.int32), 10)
    ctx_batch = dict(
        tokens=np.ascontiguousarray(toks[g, 0, :Lcb]),
        segments=np.ascontiguousarray(segs[g, 0, :Lcb]),
        mode=np.ones(10, np.int32), ctx_end=lc[g],
        ans_len=np.zeros(10, np.int32), img_index=img_of[g],
        image_feat=batch["image_feat"], image_loc=batch["image_loc"],
        image_mask=batch["image_mask"])
    idx = np.minimum(lc[g][:, None, None]
                     + np.arange(W, dtype=np.int64)[None, None, :], Lx - 1)
    take = np.broadcast_to(idx, (10, O, W))
    rows = dict(
        tokens=np.take_along_axis(toks[g], take, -1),
        segments=np.take_along_axis(segs[g], take, -1),
        mlm_labels=np.take_along_axis(labs[g], take, -1),
        lc=lc[g], ans_len=al[g], ctx_end=ce[g],
        image_mask=batch["image_mask"][img_of[g]])
    ctx_batch = {k: jnp.asarray(v) for k, v in ctx_batch.items()}
    rows = {k: jnp.asarray(v) for k, v in rows.items()}

    def feedback(d, v, key="tokens"):
        # data-dependent, value-preserving perturbation of an int input
        return dict(d, **{key: d[key] + (jnp.sum(v) * 0).astype(jnp.int32)})

    def v_full(c):
        out = sc._group_impl(params, feedback(ctx_batch, c), rows)
        return jnp.sum(out["ll_sum"])

    def v_ctx(c):
        caches = sc._context_impl(params, feedback(ctx_batch, c))
        return sum(jnp.sum(t.astype(jnp.float32)) for t in caches["t"])

    caches0 = jax.jit(sc._context_impl)(params, ctx_batch)

    def v_ans(c):
        out = sc._answer_impl(params, caches0, feedback(rows, c))
        return jnp.sum(out["ll_sum"])

    variants = {"full": v_full, "ctx": v_ctx, "ans": v_ans}

    for name, fn in variants.items():
        def loop(c, _, fn=fn):
            return fn(c), None
        run = jax.jit(lambda c0, fn=fn, loop=loop: jax.lax.scan(
            loop, c0, None, length=iters)[0])
        r = run(jnp.float32(0.0))            # compile + warm
        float(np.asarray(r))
        ts = []
        for i in range(5):                   # distinct carries: byte-identical
            t0 = time.perf_counter()         # dispatches can memoise (CLAUDE)
            r = run(jnp.float32(1.0 + i))
            float(np.asarray(r))
            ts.append((time.perf_counter() - t0) / iters * 1000)
        print(f"{name:7s} {min(ts):7.2f} ms/group  (runs: "
              + " ".join(f"{t:.2f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
