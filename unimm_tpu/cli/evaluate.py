"""Discriminative ensemble on the VisDial test split -> EvalAI predictions.

TPU-native equivalent of /root/reference/evaluate.py: 100 candidates at the
last round per image, per-model NSP probabilities min-max normalised per
slate, summed, ranks written in the EvalAI submission format.
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

    params = dict(params, num_options=100)
    dataset = VisdialDataset(params, tokenizer, reader)
    dataset.split = "test"
    loader, mesh, sharded = common.sharded_eval_setup(params, dataset, 4)
    print("len_dataloader_eval:", len(loader))

    template = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    ensemble = [common.place_params_for_eval(p, mesh)
                for p in common.load_ensemble(params, template)]
    ranks = []
    evaluator.evaluate_ensemble(
        ensemble, cfg, loader, mode="nsp", chunk_size=params["eval_chunk"],
        dtype=common.compute_dtype(params), ranks_out=ranks, test_split=True,
        mesh=mesh, pipeline_depth=params["eval_pipeline"],
        coalesce=params["eval_coalesce"])
    out = (params["save_name"] or "evaluate") + "_predictions.txt"
    if sharded:
        # ONE EvalAI submission file merged from the disjoint shards
        n = evaluator.dump_ranks_merged(ranks, out)
    else:
        evaluator.dump_ranks(ranks, out)   # process 0 writes
        n = len(ranks)
    if jax.process_index() == 0:           # only the writer reports
        print("wrote", out, n, "records")


if __name__ == "__main__":
    main(sys.argv[1:])
