"""Sparse-annotation unified training (UniMM / UniMM-UL).

TPU-native equivalent of /root/reference/train.py:292-543: per-image items of
10 rounds x (1 positive + N negatives), per-sequence dis/gen mode by
train_dis_rate, subsampled to ``batch_size`` sequences, one jitted
forward+losses+backward+update step on a dp(x mp) mesh, checkpoint every
epoch, discriminative val ranking every ``eval_every_epochs``.

Usage: python -m unimm_tpu.cli.train -batch_size 240 -lr 2e-5 ...
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from unimm_tpu import checkpoint as C
from unimm_tpu.cli import common, options
from unimm_tpu.data.dataset import (VisdialDataset, flatten_for_forward,
                                    length_bucket_morsels)
from unimm_tpu.data.loader import DataLoader
from unimm_tpu.eval import evaluator
from unimm_tpu.parallel import mesh as pmesh
from unimm_tpu.train import optim, step as tstep
from unimm_tpu.utils.logging import MetricsLogger


def _log_step(iter_id, metrics, num_iter_epoch, dataset, viz, start_t):
    m = {k: float(v) for k, v in metrics.items()}
    dt = time.perf_counter() - start_t
    overflow = int(m.get("label_budget_overflow", 0))
    fallbacks = dataset.stats["neg_truncation_fallbacks"]
    print(f"[Ep: {iter_id / num_iter_epoch:.2f}][Iter: {iter_id}]"
          f"[Time: {dt:5.2f}s]"
          f"[NSP + LM Loss: {m['lm_loss'] + m['nsp_loss']:.3g}]"
          f"[LM Loss: {m['lm_loss']:.3g}]"
          f"[NSP Loss: {m['nsp_loss']:.3g}]"
          f"[IMG Loss: {m['img_loss']:.3g}]"
          f"[LabelOverflow: {overflow}]"
          f"[NegFallbacks: {fallbacks}]")
    viz.line_plot(iter_id, m["loss"], "loss", "tot loss")
    viz.line_plot(iter_id, m["lm_loss"], "loss", "lm loss")
    viz.line_plot(iter_id, m["nsp_loss"], "loss", "nsp loss")
    viz.line_plot(iter_id, m["img_loss"], "loss", "img loss")


def main(argv=None):
    params = options.read_command_line(argv)
    common.setup_jax(params)
    os.makedirs(params["save_path"], exist_ok=True)
    viz = MetricsLogger(os.path.join(params["save_path"], "logs"))
    print({k: v for k, v in sorted(params.items())})

    cfg = common.build_config(params)
    tokenizer = common.load_tokenizer(params)
    reader = common.open_reader(params)

    dataset = VisdialDataset(params, tokenizer, reader)
    dataset.split = "train"
    # multi-host: every process computes the same global shuffle, loads only
    # its slice of each global batch, and shard_batch assembles the global
    # arrays (SURVEY §5 "multi-host via jax.distributed + DCN")
    nproc, rank = jax.process_count(), jax.process_index()
    images_per_batch = (params["batch_size"] // params["sequences_per_image"]
                        or 1) if not params["overfit"] else 5
    images_per_batch = min(images_per_batch, max(1, len(dataset)))
    loader = DataLoader(dataset, images_per_batch, shuffle=True,
                        drop_last=True, num_workers=params["num_workers"],
                        seed=params["seed"],
                        process_index=rank, process_count=nproc)
    num_iter_epoch = max(len(loader), 1)
    print(f"\n{len(dataset)} train data.")
    print(f"\n{num_iter_epoch} iter per epoch.")

    mesh = pmesh.make_mesh(common.mesh_device_count(params),
                           mp=params["mesh_mp"])
    # -auto_resume (preemption-safe restart, no reference analogue —
    # SURVEY §5: recovery there is manual -continue): resume from this run's
    # own native checkpoint dir when one exists, else start fresh with
    # -start_path as the ordinary warm-start
    auto_src = None
    if params["auto_resume"] and not params["continue"]:
        auto_dir = os.path.join(params["save_path"], "native")
        if C.latest_native(auto_dir) is not None:
            auto_src = auto_dir
        else:
            print(f"auto_resume: no checkpoint under {auto_dir!r} — "
                  "fresh start")
    # under -continue (or an auto-resume hit) the restore below loads the
    # complete train state — not a params-only load from start_path
    init_params_dict = (dict(params, start_path="")
                        if params["continue"] or auto_src else params)
    model_params = common.init_model(init_params_dict, cfg)
    model_params, _ = pmesh.shard_params(model_params, mesh)

    lang = None
    if os.path.exists(params["language_weights"]):
        lang = optim.load_language_weights(params["language_weights"])
    ocfg = optim.OptimConfig(lr=params["lr"], image_lr=params["image_lr"],
                             batch_multiply=params["batch_multiply"],
                             mu_dtype=params["adam_mu_dtype"] or None)
    make_tx = (optim.make_fused_optimizer if params["fused_adamw"]
               else optim.make_optimizer)
    tx = make_tx(model_params, ocfg, lang)
    state = tstep.init_state(model_params, tx, seed=params["seed"])

    start_iter = 0
    resume_path = (params["start_path"]
                   if params["continue"] and params["start_path"]
                   else auto_src)
    if resume_path:
        if os.path.isfile(resume_path):
            # reference-format .ckpt: full-state resume (weights + AdamW
            # moments + schedule position, reference train.py:371-386)
            host_params, host_opt, iter0, n = C.load_reference_train_state(
                resume_path, jax.device_get(state["params"]), tx,
                batch_multiply=params["batch_multiply"])
            print(f"-continue from reference .ckpt: {n} tensors, "
                  f"iter_id {iter0}, Adam moments + schedule restored")
            host_state = dict(state, params=host_params, opt_state=host_opt,
                              step=jnp.asarray(iter0, jnp.int32))
        else:
            latest = C.latest_native(resume_path)
            if latest is None:
                # fail loudly: silently training from random weights under
                # -continue would overwrite the run (the reference's
                # torch.load also crashes on a missing file). Unreachable on
                # the auto_resume path (auto_src is only set when a
                # checkpoint exists).
                raise FileNotFoundError(
                    f"-continue: no native checkpoint under "
                    f"{resume_path!r}")
            path, step_no = latest
            try:
                host_state = C.restore_native(path, jax.device_get(state))
            except Exception as e:
                raise RuntimeError(
                    f"native restore from {path} failed: {e}\n"
                    "If this checkpoint was written before the grouped-"
                    "AdamW restructure (opt_state went from a 4-way "
                    "multi_transform to chain(scale_by_adam, group-scale)), "
                    "its opt-state tree no longer matches. Resume from the "
                    "reference-format .ckpt of the same run instead "
                    "(-start_path <file.ckpt> restores moments + schedule)."
                ) from e

        state = pmesh.restore_placement(state, host_state)
        start_iter = int(np.asarray(state["step"]))
        print(f"restored native checkpoint at step {start_iter}")

    train_step = tstep.make_train_step_with_fallback(
        cfg, tx, policy=params["label_overflow_policy"],
        lm_coeff=params["lm_loss_coeff"],
        nsp_coeff=params["nsp_loss_coeff"], img_coeff=params["img_loss_coeff"],
        dtype=common.compute_dtype(params),
        mesh=mesh if mesh.size > 1 else None)
    nsp_weight = jnp.asarray([float(params["num_negative_samples"]), 1.0])

    # per-process share of the global sequence batch (flatten subsamples the
    # local images' sequences down to it; shard_batch concatenates processes)
    sample_size = (48 if params["overfit"] else params["batch_size"]) // nproc
    host_rng = np.random.default_rng(
        params["seed"] if nproc == 1 else (params["seed"], rank))

    # length-bucketed accumulation: buffer batch_multiply flats, sort all
    # their sequences by attended extent and run the accumulation
    # micro-steps at per-morsel quarter-length buckets (655 -> 531 ms per
    # effective 240-batch on v5e, scripts/bench_train.py '@80x3s').
    # Multi-process: each process sorts its local rows; a tiny host
    # allgather aligns the per-morsel bucket lengths (max over processes)
    # and the group label count feeding lm_norm (sum), so every process
    # traces the same shapes and the summed gradient equals the unsorted
    # global grouping's (tests/_multihost_morsel_worker.py proves it
    # step-for-step against the unsorted run).
    k_buckets = (params["batch_multiply"]
                 if params["length_buckets"] and
                 params["batch_multiply"] > 1 else 1)
    morsel_sync = None
    if nproc > 1:
        from jax.experimental import multihost_utils

        def morsel_sync(stats):
            return np.asarray(multihost_utils.process_allgather(stats))
    bucket_div = (params["length_buckets"]
                  if params["length_buckets"] >= 2 else 4)
    flat_buffer = []

    iter_id = start_iter
    profiler = common.StepProfiler(params["profile_dir"])
    start_t = time.perf_counter()

    def run_morsels(morsels):
        nonlocal iter_id, state, start_t
        for flat in morsels:
            iter_id += 1
            profiler.step(iter_id)
            host_labels = flat["mlm_labels"]
            sharded = pmesh.shard_batch(flat, mesh)
            state, metrics = train_step(state, sharded, nsp_weight,
                                        host_mlm_labels=host_labels)
            if iter_id % 100 == 0:
                _log_step(iter_id, metrics, num_iter_epoch, dataset,
                          viz, start_t)
                start_t = time.perf_counter()
            if params["overfit"] and iter_id % 100 == 0:
                return True
        return False

    def save_checkpoint():
        # multi-process: gather shards to host in bounded groups so the
        # full state is never replicated on device at once. The native
        # orbax save must run on EVERY process (its save protocol
        # barriers across processes — a rank-0-only call deadlocks);
        # orbax itself writes from the primary only. The torch-format
        # ckpt is plain file IO, so only process 0 writes it.
        host_state = pmesh.gather_to_host(state, mesh)
        C.save_native(os.path.join(params["save_path"], "native"),
                      host_state, iter_id)
        if jax.process_index() == 0:
            C.save_reference_ckpt(
                os.path.join(params["save_path"],
                             f"visdial_dialog_encoder_{iter_id}.ckpt"),
                host_state["params"], iter_id,
                opt_state=host_state["opt_state"],
                lang_set=C.language_param_set(lang) if lang else set(),
                lr=params["lr"], image_lr=params["image_lr"])
            viz.save()  # persist the plot env at ckpt time (train.py:506)

    # -auto_resume completes the ORIGINAL epoch budget (an identical
    # relaunch of a finished run is a no-op, so an auto-relauncher
    # terminates); -continue keeps the reference semantics of training
    # num_epochs MORE on top of the restored state (train.py:405-407)
    done_epochs = (start_iter // max(1, num_iter_epoch)
                   if auto_src and not params["overfit"] else 0)
    if done_epochs >= params["num_epochs"]:
        print(f"auto_resume: run already complete at step {start_iter} "
              f"({done_epochs}/{params['num_epochs']} epochs) — nothing to do")
    for epoch_id in range(1 + done_epochs, params["num_epochs"] + 1):
        loader.set_epoch(epoch_id)
        stop_epoch = False
        for batch in loader:
            # compact per-image staging indexes process-local arrays; under
            # multi-process the batch must be fully per-sequence (expanded),
            # and length-bucketed morsels need expanded rows too (a pruned
            # per-morsel image set would have data-dependent shapes ->
            # unbounded jit/Pallas recompilation)
            flat = flatten_for_forward(
                batch, sample_size=sample_size, rng=host_rng,
                compact_images=(nproc == 1 and k_buckets == 1))
            if k_buckets > 1:
                flat_buffer.append(flat)
                if len(flat_buffer) < k_buckets:
                    continue
                morsels = length_bucket_morsels(flat_buffer,
                                                cfg.max_seq_len, k_buckets,
                                                div=bucket_div,
                                                sync=morsel_sync)
                flat_buffer = []
            else:
                morsels = [flat]
            if run_morsels(morsels):
                stop_epoch = True
                break
        if flat_buffer and not stop_epoch:
            # epoch-end remainder (num_iter_epoch % batch_multiply != 0, or
            # 1-batch overfit epochs): flush as shorter morsel groups so no
            # loader batch is ever silently dropped
            run_morsels(length_bucket_morsels(flat_buffer, cfg.max_seq_len,
                                              len(flat_buffer),
                                              div=bucket_div,
                                              sync=morsel_sync))
            flat_buffer = []

        if epoch_id % params["save_every_epochs"] == 0:
            save_checkpoint()

        if epoch_id % params["eval_every_epochs"] == 0:
            dataset.split = "val"
            eval_loader = DataLoader(dataset, 5 if params["overfit"] else 4,
                                     shuffle=False, drop_last=True,
                                     num_workers=params["num_workers"])
            all_metrics = evaluator.evaluate_split(
                state["params"], cfg, eval_loader, mode="nsp",
                chunk_size=params["eval_chunk"],
                dtype=common.compute_dtype(params),
                mesh=mesh if mesh.size > 1 else None,
                pipeline_depth=params["eval_pipeline"])
            for name, value in all_metrics.items():
                print(f"{name}: {value}")
                key = ("Retrieval Round Val Metrics" if "round" in name
                       else "Retrieval Val Metrics")
                viz.line_plot(iter_id, value, key, name)
            dataset.split = "train"
    if (params["auto_resume"] and iter_id > start_iter
            and params["num_epochs"] % params["save_every_epochs"] != 0):
        # the final epoch's end state was never checkpointed (saves land on
        # save_every_epochs boundaries): without this an auto-relauncher
        # would redo the tail epochs forever
        save_checkpoint()
    profiler.close()
    viz.close()
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
