"""Generative ranking on VisDial val by sequence log-likelihood.

TPU-native equivalent of /root/reference/val_lm.py (and val_avg_lm.py via
``--token_avg`` / the val_avg_lm entry): ranks all 100 candidates per round by
answer log-likelihood from the autoregressive-MLM layout, reports
R@k/MRR/mean/NDCG and dumps a predictions JSON.

Usage: python -m unimm_tpu.cli.val_lm -val_dis 0 -start_path model.ckpt ...
"""

from __future__ import annotations

import sys

from unimm_tpu.cli import common, options
from unimm_tpu.data.dataset import VisdialDataset
from unimm_tpu.eval import evaluator


def main(argv=None, mode: str = "ll_sum"):
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

    model_params = common.place_params_for_eval(
        common.init_model(params, cfg), mesh)
    ranks = []
    metrics = evaluator.evaluate_split(
        model_params, cfg, loader, mode=mode,
        chunk_size=params["eval_chunk"], dtype=common.compute_dtype(params),
        ranks_out=ranks, mesh=mesh,
        gen_prefix=bool(params["gen_prefix"]),
        prefix_group=params["prefix_group"],
        prefix_packed=bool(params["prefix_packed"]),
        prefix_rowblock=params["prefix_rowblock"], process_merge=sharded,
        pipeline_depth=params["eval_pipeline"],
        coalesce=params["eval_coalesce"])
    name = params["save_name"] or "val_lm"
    if sharded:
        # one merged predictions file, like the reference's single
        # save_name dump (val_lm.py:186-190) — the per-process shards are
        # allgathered and process 0 writes
        evaluator.dump_ranks_merged(ranks, name + "_predictions.txt")
    else:
        evaluator.dump_ranks(ranks, name + "_predictions.txt")
    common.print_metrics(metrics)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
