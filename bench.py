"""Benchmark: val_lm 100-candidate ranking throughput (dialogs/sec/chip).

Measures the flagship eval path — the BASELINE.json north-star metric: score
all 100 answer candidates per round, 10 rounds per dialog = 1000 sequences of
length 256 per dialog, returning per-sequence answer log-likelihood (what
/root/reference/val_lm.py does in 250-sequence chunks on 2 GPUs).

The workload is shaped like real encode_gen output (data/encoding.py): the
100 options of a round share their context and differ only in the appended
answer + masked copy, exactly as real VisDial slates do. This lets the
production evaluator route through the prefix-cache scorer (eval/prefix.py:
one context prefill per slate + thin answer-rows passes — scores match the
full-forward path, tests/test_prefix.py), the serving optimization the
reference leaves on the table by re-running the full forward per option.
The flat full-forward path cannot exploit sharing, so its throughput is the
same on shared and unshared contexts (2.4-2.6 d/s here, scripts/
bench_prefix_ab.py) — comparability with earlier rounds' numbers holds.

Baseline: the reference publishes no throughput numbers. The documented
estimate used for ``vs_baseline`` is a FLOPs model of its 2x 12GB-GPU eval:
~85 GFLOP fwd/sequence (incl. the full [256, 30522] MLM logits the reference
always materialises), ~11 TFLOP/s fp32 peak/GPU at 25% utilisation
=> ~32 seq/s/GPU => 0.032 dialogs/s per GPU; rounded to 0.03.

Prints ONE JSON line.
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the pallas_block eval graph compiles through the
# remote Mosaic server (~minutes cold); cached recompiles are seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_DIALOGS_PER_SEC_PER_CHIP = 0.03


def wait_for_backend(probe_timeout=120.0, retries=8, retry_sleep=120.0):
    """Backend init HANGS (no exception) when the axon TPU tunnel is down
    (CLAUDE.md). Probe in a daemon thread; retry ~30 min on hangs, then fail
    loudly instead of hanging the driver. A probe that RAISES (backend
    misconfiguration, not a tunnel hang) is re-raised immediately — the
    error was available in milliseconds and retrying would only mask it."""
    import sys
    import threading

    for attempt in range(retries):
        done, err = [], []

        def probe():
            try:
                done.append(jax.devices())
            except BaseException as e:   # noqa: BLE001 — reraised below
                err.append(e)

        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(timeout=probe_timeout)
        if done:
            return
        if err:
            raise err[0]
        print(f"bench: backend probe {attempt + 1}/{retries} timed out "
              f"({probe_timeout:.0f}s) — TPU tunnel unreachable, retrying",
              file=sys.stderr, flush=True)
        time.sleep(retry_sleep)
    raise SystemExit("bench: TPU backend unreachable after "
                     f"{retries} probes — refusing to hang")


def main():
    wait_for_backend()
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.models import vilbert

    # production eval configuration: fused whole-sub-block Pallas kernels
    # (scripts/bench_e2e_ab.py: 1.59 vs 1.31 dialogs/s/chip for plain XLA)
    cfg = dataclasses.replace(VilbertConfig(), attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    # val_lm-shaped work: 2 dialogs x 10 rounds x 100 candidates per batch
    # (shared-context encode_gen slates — canonical generator shared with
    # the A/B benches so every measured series uses the same workload)
    from scripts.bench_workload import make_val_batch
    B, R, O = 2, 10, 100

    # chunk 250 for the (rare) flat fallback; the prefix scorer groups
    # slates itself (default group 40 = one dispatch per COALESCED pair of
    # 20-slate batches — the production -eval_coalesce 2 serving mode,
    # +12% over one-dispatch-per-batch in the interleaved
    # scripts/bench_coalesce_ab.py; group 20 beat the round-3 optimum 10
    # by ~13% under the packed answer-row layout)
    ev = RankingEvaluator(cfg, chunk_size=250, dtype=jnp.bfloat16,
                          need_lm=True, need_nsp=False)
    # 6 DISTINCT batches: byte-identical dispatches can return memoised
    # through the TPU relay (CLAUDE.md), so no batch repeats within a repeat
    from unimm_tpu.eval.evaluator import _merge_batches
    batches = [make_val_batch(rng, cfg, B, R, O) for _ in range(6)]
    # pinned protocol: 9 repeats of 6 scoring passes over distinct batches
    # (coalesced pairwise into 3 dispatches, the -eval_coalesce 2 default);
    # report the median repeat. 9 damps the +/-4% cross-process
    # thermal/tunnel drift observed on v5e. The loop mirrors the production
    # evaluate_split pipelining: batch i+1 is staged + dispatched before
    # batch i's scores are fetched, hiding host staging + relay latency.
    def run_series(series_batches):
        pairs = [_merge_batches(series_batches[i:i + 2])
                 for i in range(0, len(series_batches), 2)]
        for p in pairs:                      # compile + warmup (every pair:
            ev.score_slates(params, p)       # distinct shapes may compile)
        n_seq = sum(int(np.prod(b["tokens"].shape[:3]))   # B*R*O sequences
                    for b in series_batches)
        reps = []
        for _ in range(9):
            t0 = time.perf_counter()
            pending = ev.score_slates_async(params, pairs[0])
            for i in range(1, len(pairs)):
                nxt = ev.score_slates_async(params, pairs[i])
                pending()
                pending = nxt
            pending()
            dt = time.perf_counter() - t0
            reps.append(n_seq / dt)
        return sorted(reps)[len(reps) // 2], reps

    seq_per_sec, repeats = run_series(batches)
    dialogs_per_sec = seq_per_sec / 1000.0   # 10 rounds x 100 options

    # second series: REALISTIC per-round context growth (caption + r QA
    # pairs, ~30 -> ~250 tokens across the 10 rounds — real VisDial val
    # shape) instead of the pinned uniform[58,192) extents, so the headline
    # is robust to the synthetic-length critique. Reported in detail only;
    # the headline stays the pinned series for cross-round comparability.
    from scripts.bench_workload import realistic_ctx_range
    real_batches = [make_val_batch(
        rng, cfg, B, R, O,
        ctx_range_fn=realistic_ctx_range(cfg.max_seq_len))
        for _ in range(6)]
    real_seq_per_sec, real_repeats = run_series(real_batches)
    print(json.dumps({
        "metric": "val_lm_dialogs_per_sec_per_chip",
        "value": round(dialogs_per_sec, 4),
        "unit": "dialogs/s/chip",
        "vs_baseline": round(dialogs_per_sec / BASELINE_DIALOGS_PER_SEC_PER_CHIP, 2),
        # the reference publishes no throughput number; the baseline is the
        # documented FLOPs-model estimate above, not a measurement
        "baseline_basis": "flops-model-estimate",
        "detail": {"seq_per_sec": round(seq_per_sec, 1),
                   "scorer": "prefix-cache (eval/prefix.py)",
                   "repeats_seq_per_sec": [round(r, 1) for r in repeats],
                   "realistic_dialogs_per_sec": round(
                       real_seq_per_sec / 1000.0, 4),
                   "realistic_repeats_seq_per_sec": [
                       round(r, 1) for r in real_repeats],
                   "realistic_lengths": "ctx 30->250 over 10 rounds "
                                        "(real VisDial growth)",
                   "backend": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
