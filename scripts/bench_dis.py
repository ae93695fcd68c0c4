"""Discriminative (NSP-ranking) eval throughput on TPU — the previously
unmeasured second headline config (reference: 4-GPU discriminative test
ensemble, /root/reference/evaluate.py:27-132; val, /root/reference/val.py).

Three series, all through the production flat chunked scorer (prefix caching
provably cannot apply: the dis mask is bidirectional over context+answer, so
answers are visible to every row and no option-independent prefix exists):

  val       single model, [2, 10, 100] slates (2000 seqs/batch) — the val.py
            shape; dialogs/s/chip at 1000 seqs/dialog.
  ensemble  5 models over the same batches (evaluate.py's headline config);
            dialogs/s/chip for the whole ensemble pass.
  test      single model, [20, 1, 100] slates (the test split scores only
            the last round per image, evaluate.py:64); images/s/chip at
            100 seqs/image.

Protocol mirrors bench.py: distinct batches (relay memoisation), pipelined
one-batch-in-flight, median of repeats. Writes one JSON line per series.

Usage: python scripts/bench_dis.py [reps] [series ...]
"""

import dataclasses
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

_ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, _ROOT)
from bench import wait_for_backend  # noqa: E402
from scripts.bench_workload import make_dis_batch  # noqa: E402


def run_series(ev, param_list, batches, reps):
    """Median seqs/s over ``reps`` pipelined passes over ``batches``
    (every ensemble member's chunks for batch i+1 dispatched before batch
    i is fetched — the evaluate_ensemble serving loop)."""
    from unimm_tpu.data.dataset import flatten_for_forward

    flats = [flatten_for_forward(b, train=False, compact_images=True)
             for b in batches]
    for f in flats:                          # compile + warmup
        for p in param_list:
            ev.score_flat(p, f)
    n_seq = sum(f["tokens"].shape[0] for f in flats)
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pending = [ev.score_flat_async(p, flats[0]) for p in param_list]
        for i in range(1, len(flats)):
            nxt = [ev.score_flat_async(p, flats[i]) for p in param_list]
            for fin in pending:
                fin()
            pending = nxt
        for fin in pending:
            fin()
        out.append(n_seq / (time.perf_counter() - t0))
    return sorted(out)[len(out) // 2], out


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    series = sys.argv[2:] or ["val", "ensemble", "test"]
    wait_for_backend()
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.models import vilbert

    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ev = RankingEvaluator(cfg, chunk_size=250, dtype=jnp.bfloat16,
                          need_lm=False, need_nsp=True)

    results = {}
    if "val" in series or "ensemble" in series:
        val_batches = [make_dis_batch(rng, cfg, 2, 10, 100)
                       for _ in range(6)]
    if "val" in series:
        sps, rl = run_series(ev, [params], val_batches, reps)
        results["dis_val"] = {
            "metric": "dis_val_dialogs_per_sec_per_chip",
            "value": round(sps / 1000.0, 4), "unit": "dialogs/s/chip",
            "detail": {"seq_per_sec": round(sps, 1),
                       "repeats": [round(r, 1) for r in rl]}}
        print(json.dumps(results["dis_val"]), flush=True)
    if "ensemble" in series:
        fleet = [params] + [vilbert.init_params(jax.random.PRNGKey(i), cfg)
                            for i in range(1, 5)]
        sps, rl = run_series(ev, fleet, val_batches[:4], max(3, reps // 2))
        results["dis_ensemble5"] = {
            "metric": "dis_ensemble5_dialogs_per_sec_per_chip",
            "value": round(sps / 1000.0, 4), "unit": "dialogs/s/chip",
            "detail": {"seq_per_sec": round(sps, 1), "models": 5,
                       "repeats": [round(r, 1) for r in rl]}}
        print(json.dumps(results["dis_ensemble5"]), flush=True)
    if "test" in series:
        test_batches = [make_dis_batch(rng, cfg, 20, 1, 100)
                        for _ in range(6)]
        sps, rl = run_series(ev, [params], test_batches, reps)
        results["dis_test"] = {
            "metric": "dis_test_images_per_sec_per_chip",
            "value": round(sps / 100.0, 4), "unit": "images/s/chip",
            "detail": {"seq_per_sec": round(sps, 1),
                       "repeats": [round(r, 1) for r in rl]}}
        print(json.dumps(results["dis_test"]), flush=True)
    out = _ROOT + "/BENCH_dis.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
