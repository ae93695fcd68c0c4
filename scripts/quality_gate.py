#!/usr/bin/env python
"""One-command trained-weights quality gate vs the reference golden results.

The reference's committed val logs are its de-facto acceptance test
(/root/reference/results/generative_results_v1.0_val/val_lm.log, final
``ndcg: 0.69227`` / ``mrr: 0.51311`` — produced by running the released
UniMM-UL generative checkpoint through /root/reference/val_lm.py). This
environment has neither the VisDial data nor the released weights (zero
egress), so the gate cannot RUN here against real data — this script
packages it so that, the moment a data dir and a checkpoint exist, one
command closes the loop:

    python scripts/quality_gate.py \
        -start_path /path/to/released_model.ckpt \
        -visdial_processed_val /data/visdial_1.0_val_processed.json \
        -visdial_processed_val_dense_annotations /data/..._annotations.json \
        -visdial_image_feats /data/features_val.lmdb \
        -vocab_path /data/vocab.txt -model_config config/bert_base_6layer_6conect.json

It converts the torch .ckpt mechanically (checkpoint.load_reference_ckpt via
cli.common.load_any_checkpoint), runs the full val_lm eval (prefix-cache
scorer + pipelined loop, the production path), and asserts every headline
metric against the golden log within tolerance. Exit 0 = gate passed.

Gate-specific flags (consumed here, not passed to val_lm):
    --golden PATH   golden log (default: the reference's val_lm.log; pass
                    val_avg_lm.log together with --mode ll_mean)
    --mode MODE     ll_sum (val_lm, default) or ll_mean (val_avg_lm)
    --tol F         absolute tolerance on ndcg/mrr/r@k (default 0.005;
                    bf16 + answer-order tie-breaks justify a small budget)
    --tol_mean F    absolute tolerance on the mean-rank metric (default 0.2)

The script itself is proven runnable on stub data by
tests/test_quality_gate.py (a synthetic fixture tree + a synthetic "golden"
log written from a first run), so it is known-good before data ever arrives.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DEFAULT = ("/root/reference/results/generative_results_v1.0_val/"
                  "val_lm.log")
# headline metrics gated; per-round breakdowns are reported but not gated
# (they inherit any headline drift and add noise at per-round sample sizes)
GATED = ("ndcg", "mrr", "r@1", "r@5", "r@10")


def parse_golden(path: str) -> dict:
    """Parse a reference val log: ``name: value`` lines, LAST occurrence
    wins (the reference logs running metrics every few batches; the final
    block is the full-split result — val_lm.py prints it last)."""
    metrics = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if ":" not in line:
                continue
            name, _, val = line.partition(":")
            name = name.strip()
            try:
                metrics[name] = float(val.strip())
            except ValueError:
                continue
    # reference logs use r_1/r_5/r_10; our metrics dict uses r@k for the
    # split-level numbers — accept both spellings
    for k in (1, 5, 10):
        if f"r_{k}" in metrics and f"r@{k}" not in metrics:
            metrics[f"r@{k}"] = metrics[f"r_{k}"]
    return metrics


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    gate = argparse.ArgumentParser(add_help=False)
    gate.add_argument("--golden", default=GOLDEN_DEFAULT)
    gate.add_argument("--mode", default="ll_sum",
                      choices=["ll_sum", "ll_mean"])
    gate.add_argument("--tol", type=float, default=0.005)
    gate.add_argument("--tol_mean", type=float, default=0.2)
    gate_args, passthrough = gate.parse_known_args(argv)

    golden = parse_golden(gate_args.golden)
    missing = [k for k in GATED if k not in golden]
    assert not missing, (f"golden log {gate_args.golden} lacks gated "
                         f"metrics {missing}")

    from unimm_tpu.cli import val_lm
    if "-val_dis" not in passthrough:
        passthrough += ["-val_dis", "0"]
    if "-save_name" not in passthrough:
        passthrough += ["-save_name", "quality_gate"]
    metrics = val_lm.main(passthrough, mode=gate_args.mode)

    failures = []
    print("\n=== quality gate vs", gate_args.golden, "===")
    for k in GATED + ("mean",):
        if k not in golden:
            continue
        tol = gate_args.tol_mean if k == "mean" else gate_args.tol
        got, want = metrics.get(k), golden[k]
        if got is None:
            # evaluate_split can legitimately omit a key (e.g. 'ndcg' with a
            # zero merged denominator) — that's a gate FAILURE, not a crash
            print(f"  {k:6s} MISSING from eval metrics  "
                  f"golden {want:.5f}  FAIL")
            failures.append((k, None, want, tol))
            continue
        ok = abs(got - want) <= tol
        print(f"  {k:6s} got {got:.5f}  golden {want:.5f}  "
              f"tol {tol}  {'ok' if ok else 'FAIL'}")
        if not ok:
            failures.append((k, got, want, tol))
    if failures:
        print("QUALITY GATE: FAIL", failures)
        return 1
    print("QUALITY GATE: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
