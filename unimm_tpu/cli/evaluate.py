"""Discriminative ensemble on the VisDial test split -> EvalAI predictions.

TPU-native equivalent of /root/reference/evaluate.py: 100 candidates at the
last round per image, per-model NSP probabilities min-max normalised per
slate, summed, ranks written in the EvalAI submission format.
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

    params = dict(params, num_options=100)
    dataset = VisdialDataset(params, tokenizer, reader)
    dataset.split = "test"
    loader = DataLoader(dataset, 4, shuffle=False,
                        num_workers=params["num_workers"])

    template = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    mesh = _mesh(params)
    ensemble = [common.place_params_for_eval(p, mesh)
                for p in common.load_ensemble(params, template)]
    ranks = []
    evaluator.evaluate_ensemble(
        ensemble, cfg, loader, mode="nsp", chunk_size=params["eval_chunk"],
        dtype=common.compute_dtype(params), ranks_out=ranks, test_split=True,
        mesh=mesh)
    out = (params["save_name"] or "evaluate") + "_predictions.txt"
    evaluator.dump_ranks(ranks, out)
    print("wrote", out, len(ranks), "records")


if __name__ == "__main__":
    main(sys.argv[1:])
