"""Phase-2 dense-annotation finetuning.

TPU-native equivalent of /root/reference/dense_annotation_finetuning.py:
one image per step, all 100 candidates of the annotated round, loss =
neuralNDCG_transposed(softmax(nsp)[:, 0], relevance) + lm + nsp_coeff * nsp
(:263-294), gradient accumulation via batch_multiply (default 16 in the
paper recipe), option order shuffled per step with the GT first (:163-166).

Usage: python -m unimm_tpu.cli.dense_finetune -batch_multiply 16 ...
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
from unimm_tpu.config import VilbertConfig
from unimm_tpu.data.dataset import (VisdialDataset, VisdialDatasetDense,
                                    flatten_for_forward)
from unimm_tpu.data.loader import DataLoader, batch_iter
from unimm_tpu.eval import evaluator
from unimm_tpu.models import unimm, vilbert
from unimm_tpu.ops import focal_losses as FL
from unimm_tpu.ops import losses as L
from unimm_tpu.ops import rank_loss as RL
from unimm_tpu.parallel import mesh as pmesh
from unimm_tpu.train import optim
from unimm_tpu.utils.logging import MetricsLogger


def make_dense_step(cfg: VilbertConfig, tx, *, nsp_coeff=1.0,
                    dtype=jnp.bfloat16, mesh=None, n_real=100):
    """One jitted step: forward + (rank + lm + nsp) loss + update.

    batch is flat [S, ...] where S >= n_real: the first ``n_real`` rows are
    the (already GT-first-permuted) option slate and rows beyond are padding
    added so S divides the mesh dp axis — the TPU-native replacement for the
    reference's uneven 100 -> 25/25/25/25 GPU scatter tables
    (/root/reference/utils/data_parallel.py:16-57,91-132). Padding rows carry
    lm_weight 0 / mlm_labels -1 (zero LM contribution) and are statically
    sliced away before the nsp and rank losses; gt_relevance stays [n_real].
    """

    def step(state, batch, gt_relevance):
        rng = jax.random.fold_in(state["rng"], state["step"])

        def loss_fn(params):
            r_enc, r_head = jax.random.split(rng)
            t_seq, v_seq, pt, pv = unimm.encode(
                params, cfg, batch, train=True, rng=r_enc, dtype=dtype,
                mesh=mesh)
            # gathered path avoids the [100, 256, 30522] logits (~12GB fp32
            # with gradients); honors cfg.mlm_loss_impl like forward_train
            lm, img_logits, nsp_logits = unimm.lm_loss_and_heads(
                params, cfg, t_seq, v_seq, pt, pv, batch, train=True,
                rng=r_head)
            nsp_logits = nsp_logits[:n_real]
            nsp = L.nsp_loss(nsp_logits,
                             batch["next_sentence_label"][:n_real], None)
            nsp_probs = jax.nn.softmax(
                nsp_logits.astype(jnp.float32), axis=-1)[:, 0]
            rank = RL.neuralNDCG_transposed(nsp_probs[None, :],
                                            gt_relevance[None, :])
            # The reference drops the lm term when it is NaN (:291-294); its
            # NaN came from 0/0 in boolean-indexed loss reduction, which our
            # masked-sum loss structurally prevents (max(num_tokens, 1)) —
            # this guard only masks the VALUE for parity. If lm were NaN here
            # it would mean encoder NaNs, which poison all grads regardless.
            lm_term = jnp.where(jnp.isnan(lm), 0.0, lm)
            total = rank + lm_term + nsp_coeff * nsp
            # logging-only quantities (dense_annotation_finetuning.py:275-280)
            slate = nsp_logits.astype(jnp.float32)[None, :, :]
            return total, {"loss": total, "lm_loss": lm, "nsp_loss": nsp,
                           "rank_loss": rank,
                           "ce_loss": FL.dense_ce_log(
                               slate, gt_relevance[None, :]),
                           "qfocal_loss": FL.dense_qfocal_log(
                               slate, gt_relevance[None, :])}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state["params"], updates)
        return {"params": new_params, "opt_state": new_opt,
                "step": state["step"] + 1, "rng": state["rng"]}, parts

    return jax.jit(step, donate_argnums=(0,))


def main(argv=None):
    params = options.read_command_line(argv)
    common.setup_jax(params)
    os.makedirs(params["save_path"], exist_ok=True)
    viz = MetricsLogger(os.path.join(params["save_path"], "logs"))
    cfg = common.build_config(params)
    tokenizer = common.load_tokenizer(params)
    reader = common.open_reader(params)

    params = dict(params, num_options=100)
    dataset = VisdialDatasetDense(params, tokenizer, reader)
    loader = DataLoader(dataset, 1, shuffle=True, drop_last=True,
                        num_workers=params["num_workers"],
                        seed=params["seed"])
    eval_dataset = VisdialDataset(params, tokenizer, reader)
    eval_dataset.split = "val"
    num_iter_epoch = max(len(loader), 1) if not params["overfit"] else 1
    print(f"\n{num_iter_epoch} iter per epoch.")

    mesh = pmesh.make_mesh(common.mesh_device_count(params),
                           mp=params["mesh_mp"])
    nproc, rank = jax.process_count(), jax.process_index()
    dp = mesh.shape[pmesh.DP]
    if nproc > 1 and dp % nproc != 0:
        # every process loads the SAME dialog (the loader is deliberately not
        # process-sharded: the global batch IS one option slate) and
        # contributes a contiguous dp-row block of it — an mp axis spanning
        # processes would make that block non-contiguous in dp order
        raise SystemExit(
            "multi-process dense finetuning requires the dp axis to span "
            f"processes (dp={dp} % nproc={nproc} != 0); lower -mesh_mp")
    # dense slate padded up to the next dp-divisible size: the dp-sharded
    # replacement for the reference's 100 -> 25/25/25/25 scatter tables
    # (utils/data_parallel.py:16-57). On an 8-way mesh this is 100 -> 104
    # (4% padded compute) instead of 8x replicated compute.
    n_slate = 100
    S = -(-n_slate // dp) * dp if dp > 1 else n_slate
    # resume surface (reference dense_annotation_finetuning.py:95-130):
    # -continue restores weights + AdamW moments + schedule position from a
    # full .ckpt; -auto_resume (TPU-native, preemption-safe) picks this
    # run's own latest .ckpt if one exists, else starts fresh with
    # -start_path as the ordinary pretrained warm-start
    resume_path = (params["start_path"]
                   if params["continue"] and params["start_path"] else None)
    auto_hit = False
    if params["auto_resume"] and resume_path is None:
        latest = C.latest_reference_ckpt(params["save_path"])
        if latest is None:
            print(f"auto_resume: no .ckpt under {params['save_path']!r} — "
                  "fresh start")
        else:
            resume_path = latest[0]
            auto_hit = True
    init_params_dict = dict(params, start_path="") if resume_path else params
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
    state = {"params": model_params, "opt_state": tx.init(model_params),
             "step": jnp.zeros((), jnp.int32),
             "rng": jax.random.PRNGKey(params["seed"])}
    start_iter = 0
    if resume_path:
        host_params, host_opt, iter0, n = C.load_reference_train_state(
            resume_path, jax.device_get(state["params"]), tx,
            batch_multiply=params["batch_multiply"])
        print(f"dense -continue from {resume_path}: {n} tensors, "
              f"iter_id {iter0}, Adam moments + schedule restored")
        host_state = dict(state, params=host_params, opt_state=host_opt,
                          step=jnp.asarray(iter0, jnp.int32))
        state = pmesh.restore_placement(state, host_state)
        start_iter = iter0
    dense_step = make_dense_step(cfg, tx, nsp_coeff=params["nsp_loss_coeff"],
                                 dtype=common.compute_dtype(params),
                                 mesh=mesh if mesh.size > 1 else None,
                                 n_real=n_slate)

    host_rng = np.random.default_rng(params["seed"])
    start_t = time.perf_counter()
    # -auto_resume completes the ORIGINAL epoch budget (idempotent under an
    # auto-relauncher); -continue keeps the reference's train-num_epochs-more
    # semantics (dense_annotation_finetuning.py:146-147)
    done_epochs = (start_iter // max(1, num_iter_epoch)
                   if auto_hit and not params["overfit"] else 0)
    if done_epochs >= params["num_epochs"]:
        print(f"auto_resume: dense run already complete at iter {start_iter} "
              f"({done_epochs}/{params['num_epochs']} epochs) — nothing to do")
    def save_ckpt(it):
        # full-state .ckpt exactly like the reference's 4-key dict
        # (model + optimizer + scheduler + iter_id, :324-326) so dense
        # runs resume via -continue / -auto_resume. gather_to_host is a
        # collective — every process participates; the torch-format
        # write is plain file IO: process 0 only (concurrent writes to
        # one shared path would corrupt it)
        host_state = pmesh.gather_to_host(state, mesh)
        if rank == 0:
            C.save_reference_ckpt(
                os.path.join(params["save_path"],
                             f"visdial_dialog_encoder_{it}.ckpt"),
                host_state["params"], it,
                opt_state=host_state["opt_state"],
                lang_set=C.language_param_set(lang) if lang else set(),
                lr=params["lr"], image_lr=params["image_lr"])
            viz.save()  # persist the plot env at ckpt time (dense:329)

    last_saved = start_iter
    for epoch_id, idx, batch in batch_iter(loader, params["num_epochs"],
                                           start_epoch=done_epochs):
        # startIterID offset exactly as the reference (:147); under an
        # -auto_resume hit epoch_id is ABSOLUTE (earlier epochs skipped),
        # so the restored offset is already encoded in it
        iter_id = (idx + epoch_id * num_iter_epoch if auto_hit
                   else start_iter + idx + epoch_id * num_iter_epoch)

        # shuffle options with GT first (dense_annotation_finetuning.py:163-166)
        gt = int(batch["gt_option"][0])
        others = np.concatenate([np.arange(gt), np.arange(gt + 1, 100)])
        order = np.concatenate([[gt], host_rng.permutation(others)])
        flat = flatten_for_forward(
            {k: (v[:, :, order] if k in
                 ("tokens", "segments", "positions", "sep_indices",
                  "mlm_labels", "lm_weight", "mode", "ctx_end", "ans_len",
                  "hist_len", "next_sentence_label") else v)
             for k, v in batch.items() if k not in
             ("gt_relevance", "gt_option", "round_id", "image_id")})
        gt_rel = np.asarray(batch["gt_relevance"][0])[order]
        if params["length_buckets"]:
            # slice the slate to its covering length bucket (exact under
            # the descriptor masks, ops/masks.attended_extent; all options
            # share the annotated round's context, so early-round dialogs
            # train at a fraction of max_seq_len). Order-preserving — the
            # gt-first permutation and gt_relevance alignment are untouched.
            # Computed BEFORE the per-process row slice so every process
            # compiles the same shapes.
            from unimm_tpu.ops import masks as M_masks
            # capped at quarter granularity: every distinct dense bucket is
            # a full fwd+bwd graph compile (the most expensive graphs in
            # the framework — ~10+ min each through the remote Mosaic
            # relay), and the slate extent (shared round context + max
            # answer) rarely sits near a fine bucket boundary
            div = min(params["length_buckets"], 4) \
                if params["length_buckets"] >= 2 else 4
            ext = M_masks.attended_extent(
                flat["mode"], flat["ctx_end"], flat["ans_len"],
                cfg.max_seq_len, flat.get("mlm_labels"))
            Lb = M_masks.quarter_bucket(int(ext.max()), cfg.max_seq_len,
                                        div=div)
            if Lb < cfg.max_seq_len:
                for key in ("tokens", "segments", "positions",
                            "mlm_labels", "lm_weight"):
                    if key in flat:
                        flat[key] = np.ascontiguousarray(
                            np.asarray(flat[key])[:, :Lb])
        if S > n_slate:
            # pad with copies of the GT row, neutralised: lm_weight 0 and
            # labels -1 (zero LM term); nsp/rank are sliced to [:n_real] in
            # the step, so pad-row logits never reach a loss
            pad = S - n_slate
            flat = {k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                    for k, v in flat.items()}
            if "lm_weight" in flat:
                flat["lm_weight"][n_slate:] = 0.0
            flat["mlm_labels"][n_slate:] = -1
        if nproc > 1:
            # contiguous per-process block of the padded slate; shard_batch
            # reassembles via make_array_from_process_local_data
            k_loc = S // nproc
            flat = {k: v[rank * k_loc:(rank + 1) * k_loc]
                    for k, v in flat.items()}
        flat = pmesh.shard_batch(flat, mesh)
        state, parts = dense_step(state, flat, jnp.asarray(gt_rel))

        if iter_id % 10 == 0:
            m = {k: float(v) for k, v in parts.items()}
            dt = time.perf_counter() - start_t
            start_t = time.perf_counter()
            print(f"[Ep: {epoch_id:.2f}][Iter: {iter_id}][Time: {dt:5.2f}s]"
                  f"[loss: {m['loss']:.3g}][LM Loss: {m['lm_loss']:.3g}]"
                  f"[NSP Loss: {m['nsp_loss']:.3g}]"
                  f"[CE Loss: {m['ce_loss']:.3g}]"
                  f"[qfocal_loss: {m['qfocal_loss']:.3g}]"
                  f"[neuralNDCG_transposed loss: {m['rank_loss']:.3g}]")
            for k, v in m.items():
                viz.line_plot(iter_id, v, "loss", k)

        epoch_len = 100 if params["overfit"] else num_iter_epoch
        # `> start_iter` (not `> 0`): the first step of a resumed run lands
        # ON the restored iter_id, and re-saving there would overwrite the
        # just-restored checkpoint with a one-step-newer state under the
        # same label — under repeated preemption the schedule position
        # would then never advance past the resume point
        if iter_id % epoch_len == 0 and iter_id > start_iter:
            save_ckpt(iter_id)
            last_saved = iter_id
            if iter_id // epoch_len >= 2:
                eval_loader = DataLoader(
                    eval_dataset, 5 if params["overfit"] else 4,
                    shuffle=False, drop_last=True,
                    num_workers=params["num_workers"])
                mets = evaluator.evaluate_split(
                    state["params"], cfg, eval_loader, mode="nsp",
                    chunk_size=params["eval_chunk"],
                    dtype=common.compute_dtype(params),
                    mesh=mesh if mesh.size > 1 else None)
                for name, value in mets.items():
                    print(f"{name}: {value}")
    if params["auto_resume"] and not params["overfit"]:
        # the final epoch's end state is never saved by the reference's
        # epoch-boundary placement — without this an auto-relauncher would
        # redo the tail epoch forever
        final_iter = params["num_epochs"] * num_iter_epoch
        if final_iter > max(last_saved, start_iter):
            save_ckpt(final_iter)
    viz.close()
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
