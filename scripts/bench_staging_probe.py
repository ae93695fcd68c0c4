"""Probe: how much of a val_lm batch's wall time is HOST-side staging?

Times three spans over the pinned bench workload (same process, warm):
  stage    — ``score_slates_async`` call duration (numpy staging + device
             puts + async dispatches; everything that blocks the host)
  fetch    — the returned closure (device compute remainder + result fetch)
  total    — one pipelined pass, as bench.py runs it

If ``stage`` ~ ``total``, the serving loop is host-bound and the next eval
lever is staging (native packing helper / fewer host copies), not kernels.

Usage: python scripts/bench_staging_probe.py [n_batches] [repeats]
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

from bench_workload import make_val_batch  # noqa: E402


def main():
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.models import vilbert

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, R, O = 2, 10, 100
    ev = RankingEvaluator(cfg, chunk_size=250, dtype=jnp.bfloat16,
                          need_lm=True, need_nsp=False)
    batches = [make_val_batch(rng, cfg, B, R, O) for _ in range(n_batches)]
    for b in batches:
        ev.score_slates(params, b)            # compile + warm

    for rep in range(repeats):
        stage = fetch = 0.0
        t0 = time.perf_counter()
        pending = None
        for b in batches:                     # the bench.py pipelined loop
            ts = time.perf_counter()
            nxt = ev.score_slates_async(params, b)
            stage += time.perf_counter() - ts
            if pending is not None:
                tf = time.perf_counter()
                pending()
                fetch += time.perf_counter() - tf
            pending = nxt
        tf = time.perf_counter()
        pending()
        fetch += time.perf_counter() - tf
        total = time.perf_counter() - t0
        n = len(batches)
        print(f"rep{rep}  stage {stage / n * 1000:6.1f} ms/batch   "
              f"fetch-wait {fetch / n * 1000:6.1f}   "
              f"total {total / n * 1000:6.1f}   "
              f"({B * R * O * n / total / 1000:.2f} d/s)", flush=True)


if __name__ == "__main__":
    main()
