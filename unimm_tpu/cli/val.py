"""Discriminative (NSP-probability) ensemble evaluation on VisDial val.

TPU-native equivalent of /root/reference/val.py: per-model NSP probabilities
min-max normalised per 100-candidate slate and summed across the ensemble.
Checkpoints come from -model_paths (comma-separated) instead of the
reference's hard-coded in-source paths (val.py:216-222).
"""

from __future__ import annotations

import sys

from unimm_tpu.cli import common, options
from unimm_tpu.data.dataset import VisdialDataset
from unimm_tpu.eval import evaluator
from unimm_tpu.models import vilbert

import jax


def main(argv=None):
    params = options.read_command_line(argv)
    common.setup_jax(params)
    cfg = common.build_config(params)
    tokenizer = common.load_tokenizer(params)
    reader = common.open_reader(params)

    dataset = VisdialDataset(params, tokenizer, reader)
    dataset.split = "val"
    eval_batch_size = 5 if params["overfit"] else 2
    loader, mesh, sharded = common.sharded_eval_setup(
        params, dataset, eval_batch_size)
    print("len_dataloader_eval:", len(loader))

    template = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    ensemble = [common.place_params_for_eval(p, mesh)
                for p in common.load_ensemble(params, template)]
    ranks = []
    metrics = evaluator.evaluate_ensemble(
        ensemble, cfg, loader, mode="nsp", chunk_size=params["eval_chunk"],
        dtype=common.compute_dtype(params), ranks_out=ranks,
        mesh=mesh, process_merge=sharded,
        pipeline_depth=params["eval_pipeline"],
        coalesce=params["eval_coalesce"])
    name = (params["save_name"] or "val") + "_predictions.txt"
    if sharded:
        # one merged predictions file from the disjoint per-process shards
        # (the reference writes a single save_name dump, val.py:166-178)
        evaluator.dump_ranks_merged(ranks, name)
    else:
        evaluator.dump_ranks(ranks, name)
    common.print_metrics(metrics)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
