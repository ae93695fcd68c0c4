"""Attribution for the prefix-cache scorer: per-stage cost of the group
dispatch, measured the way production runs it — N async dispatches over
DISTINCT staged groups (relay memoisation needs byte-identical inputs,
CLAUDE.md) closed by one host fetch, so per-dispatch tunnel overhead
overlaps compute exactly as RankingEvaluator.score_slates does.

(A feedback-carried lax.scan variant was tried first; the scan-wrapped
full-model graph broke the remote Mosaic/XLA compile server — "Broken
pipe" after ~20 min. The async protocol needs no scan.)

Variants:
  full      — context prefill + answer pass (XLA answer path)
  full_k    — same with the fused answer-attention kernel
              (ops/pallas_prefix.py, attention_impl=pallas_block)
  ans       — XLA answer pass on precomputed caches
  ans_k     — kernel answer pass on precomputed caches
  nohead    — XLA answer pass minus the MLM label head (isolates the
              [P,30522] online-softmax decode cost)
  ans_xh    — kernel attention + XLA head (head-impl A/B at fixed attention)

Usage: python scripts/bench_prefix_attr.py [Lcb] [n_groups] [repeats]
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

from bench_workload import make_val_batch  # noqa: E402  (canonical workload)


def stage_group(batch, sc, Lcb, W=16, gsize=10):
    """Stage ONE group of ``gsize`` slates exactly as PrefixScorer.score."""
    from unimm_tpu.eval.prefix import slate_eligibility

    ok, lc, rows_max = slate_eligibility(batch)
    B, R, O, Lx = batch["tokens"].shape
    NS = B * R
    toks = np.asarray(batch["tokens"]).reshape(NS, O, Lx)
    segs = np.asarray(batch["segments"]).reshape(NS, O, Lx)
    labs = np.asarray(batch["mlm_labels"]).reshape(NS, O, Lx)
    ce = np.asarray(batch["ctx_end"]).reshape(NS, O).astype(np.int32)
    al = np.asarray(batch["ans_len"]).reshape(NS, O).astype(np.int32)
    img_of = np.repeat(np.arange(B, dtype=np.int32), R)
    g = np.nonzero(ok & (lc <= Lcb - 1))[0][:gsize]
    assert g.size == gsize, (g.size, Lcb)
    ctx_batch = dict(
        tokens=np.ascontiguousarray(toks[g, 0, :Lcb]),
        segments=np.ascontiguousarray(segs[g, 0, :Lcb]),
        mode=np.ones(gsize, np.int32), ctx_end=lc[g],
        ans_len=np.zeros(gsize, np.int32), img_index=img_of[g],
        image_feat=batch["image_feat"], image_loc=batch["image_loc"],
        image_mask=batch["image_mask"])
    idx = np.minimum(lc[g][:, None, None]
                     + np.arange(W, dtype=np.int64)[None, None, :], Lx - 1)
    take = np.broadcast_to(idx, (gsize, O, W))
    rows = dict(
        tokens=np.take_along_axis(toks[g], take, -1),
        segments=np.take_along_axis(segs[g], take, -1),
        mlm_labels=np.take_along_axis(labs[g], take, -1),
        lc=lc[g], ans_len=al[g], ctx_end=ce[g],
        image_mask=np.asarray(batch["image_mask"])[img_of[g]])
    return ({k: jnp.asarray(v) for k, v in ctx_batch.items()},
            {k: jnp.asarray(v) for k, v in rows.items()})


def main():
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.eval.prefix import PrefixScorer

    Lcb = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg = VilbertConfig()
    from unimm_tpu.models import vilbert
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # sc is the explicit XLA baseline: attention_impl gates BOTH the answer
    # attention kernel and the fused label head, and the config default is
    # pallas_block since 78b009d — without the replace, full == full_k.
    sc = PrefixScorer(cfg.replace(attention_impl="xla"),
                      dtype=jnp.bfloat16, group=10)

    groups = [stage_group(make_val_batch(rng, cfg, B=2, R=10, O=100),
                          sc, Lcb) for _ in range(n_groups)]
    caches = [jax.jit(sc._context_impl)(params, cb) for cb, _ in groups]
    jax.block_until_ready(caches)

    # full reuses the PRODUCTION _grp_fn executable (same (Lcb, W) shapes as
    # the pinned bench -> warm compile cache); ctx cost falls out as
    # full - ans (a separate reduced-ctx jit would be one more full-model
    # remote compile). Outputs are small [G, O] score dicts — fetch cost nil.
    f_ans = jax.jit(sc._answer_impl)
    f_nohead = jax.jit(
        lambda p, c, r: sc._answer_impl(p, c, r, with_head=False))
    sck = PrefixScorer(cfg.replace(attention_impl="pallas_block"),
                       dtype=jnp.bfloat16, group=10)
    f_ans_k = jax.jit(sck._answer_impl)
    f_nohead_k = jax.jit(
        lambda p, c, r: sck._answer_impl(p, c, r, with_head=False))

    # ans_xh: kernel attention + XLA online-softmax head (since the
    # pallas_block default, every other variant uses the fused head — this
    # isolates the head implementations). Traced EAGERLY under a temporary
    # monkeypatch; the executable keeps the patched graph.
    from unimm_tpu.ops import losses as LL
    from unimm_tpu.ops import pallas_head as PH
    scx = PrefixScorer(cfg.replace(attention_impl="pallas_block"),
                       dtype=jnp.bfloat16, group=10)
    f_ans_xh = jax.jit(scx._answer_impl)
    orig_head = PH.online_softmax_xent_tpu
    PH.online_softmax_xent_tpu = (
        lambda h, w, b, l, **kw: LL.online_softmax_xent(h, w, b, l))
    f_ans_xh = f_ans_xh.lower(params, caches[0], groups[0][1]).compile()
    PH.online_softmax_xent_tpu = orig_head

    variants = {
        "full": lambda i: sc._grp_fn(params, *groups[i]),
        "full_k": lambda i: sck._grp_fn(params, *groups[i]),
        "ans": lambda i: f_ans(params, caches[i], groups[i][1]),
        "ans_k": lambda i: f_ans_k(params, caches[i], groups[i][1]),
        "nohead": lambda i: f_nohead(params, caches[i], groups[i][1]),
        "nohead_k": lambda i: f_nohead_k(params, caches[i], groups[i][1]),
        "ans_xh": lambda i: f_ans_xh(params, caches[i], groups[i][1]),
    }
    res = {}
    for name, fn in variants.items():
        for i in range(n_groups):      # compile + warm every distinct input
            fn(i)
        jax.block_until_ready([fn(i) for i in range(n_groups)])
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = [fn(i) for i in range(n_groups)]   # async dispatches
            s = sum(float(np.asarray(list(o.values())[0]).sum())
                    for o in outs)                    # host fetch closes
            ts.append((time.perf_counter() - t0) / n_groups * 1000)
        assert np.isfinite(s)
        res[name] = min(ts)
        print(f"{name:7s} {min(ts):7.2f} ms/group  (runs: "
              + " ".join(f"{t:.2f}" for t in ts) + ")", flush=True)
    print(f"ctx = full - ans ~= {res['full'] - res['ans']:.2f} ms/group; "
          f"label head = ans - nohead ~= {res['ans'] - res['nohead']:.2f}; "
          f"kernel head = ans_k - nohead_k ~= "
          f"{res['ans_k'] - res['nohead_k']:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
