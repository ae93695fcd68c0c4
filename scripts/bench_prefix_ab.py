"""A/B: flat chunked scoring vs the prefix-cache gen scorer (eval/prefix.py)
on the real TPU, val_lm protocol with REALISTIC slates (the 100 options of a
round share their context, as encode_gen emits for real data — bench.py's
older generator drew independent contexts per option, which no real slate
does and which makes prefix scoring inapplicable).

The flat path cannot exploit context sharing, so its throughput here matches
bench.py's unshared protocol; the prefix path prefills each shared context
once and scores options with thin answer-rows passes.

Interleaved same-process measurement (ROADMAP: cross-process varies +/-4%).

Usage: python scripts/bench_prefix_ab.py [noflat] [group ...]
(default groups: 10 20; ``noflat`` skips the flat arm — its pallas_block
length-bucket shapes cost several remote Mosaic compiles on a cold cache —
and cross-checks the prefix variants against each other instead.)
"""

import dataclasses
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


def main():
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.data.dataset import flatten_for_forward
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.models import vilbert

    argv = sys.argv[1:]
    use_flat = "noflat" not in argv
    groups = [int(g) for g in argv if g != "noflat"] or [10, 20]
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, R, O = 2, 10, 100

    batches = [make_val_batch(rng, cfg, B, R, O) for _ in range(3)]
    flats = [flatten_for_forward(b, train=False, compact_images=True)
             for b in batches]

    evs = {}
    if use_flat:
        evs["flat"] = RankingEvaluator(cfg, chunk_size=250,
                                       dtype=jnp.bfloat16, need_lm=True,
                                       need_nsp=False, gen_prefix=False)
    for g in groups:
        evs[f"prefix{g}"] = RankingEvaluator(
            cfg, chunk_size=250, dtype=jnp.bfloat16, need_lm=True,
            need_nsp=False, prefix_group=g)
    # unpacked arm at the first group size: isolates the packed answer-row
    # layout (pack_option_rows) against the round-3 W-padded layout
    evs[f"prefix{groups[0]}u"] = RankingEvaluator(
        cfg, chunk_size=250, dtype=jnp.bfloat16, need_lm=True,
        need_nsp=False, prefix_group=groups[0], prefix_packed=False)

    def score(name, i):
        ev = evs[name]
        if name == "flat":
            return ev.score_flat(params, flats[i % 3])
        return ev.score_slates(params, batches[i % 3])

    # warmup/compile + sanity: prefix scores must rank like flat (bf16);
    # under noflat, like the first prefix variant (both exact to rounding)
    ref = None
    for name in evs:
        if ref is None:
            t0 = time.perf_counter()
            ref = [score(name, i) for i in range(3)]
            print(f"{name} warm {time.perf_counter() - t0:.1f}s", flush=True)
            continue
        t0 = time.perf_counter()
        outs = [score(name, i) for i in range(3)]
        print(f"{name} warm {time.perf_counter() - t0:.1f}s", flush=True)
        for o, rf in zip(outs, ref):
            a = o["ll_mean"].reshape(-1, O)
            b = rf["ll_mean"].reshape(-1, O)
            top_same = (np.argmax(a, -1) == np.argmax(b, -1)).mean()
            md = np.abs(a - b).max()
            print(f"  {name}: top1 agree {top_same:.3f}, "
                  f"max|d ll_mean| {md:.4f}", flush=True)

    names = list(evs)
    iters = 6
    for rep in range(5):
        line = []
        for name in names:           # interleaved A/B
            t0 = time.perf_counter()
            for i in range(iters):
                score(name, i)
            dt = time.perf_counter() - t0
            line.append(f"{name}: {B * R * O * iters / dt / 1000.0:.3f} d/s")
        print(f"rep{rep}  " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
