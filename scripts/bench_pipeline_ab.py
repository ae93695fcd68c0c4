"""Interleaved A/B: synchronous score_slates loop vs one-batch-in-flight
pipelined loop (score_slates_async — dispatch batch i+1 before finalizing
batch i, the evaluate_split production loop shape).

Same workload as bench.py (val_lm shared-context slates, prefix scorer).
Interleaved same-process measurement (ROADMAP: cross-process varies +/-4%).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


from bench_workload import make_val_batch  # noqa: E402  (canonical workload)


def main():
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.models import vilbert

    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [make_val_batch(rng, cfg) for _ in range(6)]
    nseq = 2 * 10 * 100 * len(batches)

    ev = RankingEvaluator(cfg, chunk_size=250, dtype=jnp.bfloat16,
                          need_lm=True, need_nsp=False)
    for b in batches:
        ev.score_slates(params, b)

    def run_sync():
        t0 = time.perf_counter()
        for b in batches:
            ev.score_slates(params, b)
        return nseq / (time.perf_counter() - t0)

    def run_pipe(depth: int = 1):
        # depth batches kept in flight (-eval_pipeline / evaluate_split
        # pipeline_depth); depth 1 is the round-3 production loop
        t0 = time.perf_counter()
        pending = []
        for b in batches:
            pending.append(ev.score_slates_async(params, b))
            if len(pending) > depth:
                pending.pop(0)()
        for fin in pending:
            fin()
        return nseq / (time.perf_counter() - t0)

    depths = [int(d) for d in (sys.argv[1:] or ["1", "2", "3"])]
    series = {"sync": []}
    series.update({f"pipe{d}": [] for d in depths})
    for rep in range(7):
        series["sync"].append(run_sync())
        for d in depths:
            series[f"pipe{d}"].append(run_pipe(d))
        print("rep", rep, {k: round(v[-1], 1) for k, v in series.items()},
              flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    for k, v in series.items():
        print(f"median {k}: {med(v):.1f} seq/s = {med(v)/1000:.3f} d/s")


if __name__ == "__main__":
    main()
