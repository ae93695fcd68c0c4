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
from unimm_tpu.data.loader import DataLoader
from unimm_tpu.cli.common import eval_mesh as _mesh
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
    loader = DataLoader(dataset, eval_batch_size, shuffle=False,
                        num_workers=params["num_workers"])

    template = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    mesh = _mesh(params)
    ensemble = [common.place_params_for_eval(p, mesh)
                for p in common.load_ensemble(params, template)]
    ranks = []
    metrics = evaluator.evaluate_ensemble(
        ensemble, cfg, loader, mode="nsp", chunk_size=params["eval_chunk"],
        dtype=common.compute_dtype(params), ranks_out=ranks,
        mesh=mesh)
    evaluator.dump_ranks(ranks, (params["save_name"] or "val")
                         + "_predictions.txt")
    common.print_metrics(metrics)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
