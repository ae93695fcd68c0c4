"""The jitted training step: one XLA graph combining forward, all losses,
backward, and the grouped-AdamW update.

Equivalent of the reference train iteration (/root/reference/train.py:445-463)
minus its host-side pieces: no GradScaler (bf16 on TPU needs no loss
scaling), no .mean() across GPU shards (losses are computed globally on the
dp-sharded batch inside one pjit graph), gradient accumulation handled by
optax.MultiSteps inside the optimizer.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import unimm
from unimm_tpu.ops import losses as L


def make_train_step(cfg: VilbertConfig, tx, *, lm_coeff=1.0, nsp_coeff=1.0,
                    img_coeff=1.0, dtype=jnp.bfloat16, donate=True,
                    mesh=None):
    """Returns train_step(state, batch) -> (state, metrics).

    state: dict(params=..., opt_state=..., step=int32, rng=PRNGKey).
    batch: descriptor batch (see unimm.forward_train) + optional 'nsp_weight'.
    ``mesh``: optional Mesh — Pallas kernel calls inside the forward are
    shard_mapped over its dp axis (unimm.encode).
    """

    def train_step(state, batch, nsp_weight=None):
        rng = jax.random.fold_in(state["rng"], state["step"])

        def loss_fn(params):
            parts = unimm.forward_train(params, cfg, batch, rng=rng,
                                        nsp_weight=nsp_weight, dtype=dtype,
                                        mesh=mesh)
            total = L.combine_losses(parts["lm"], parts["img"], parts["nsp"],
                                     lm_coeff, nsp_coeff, img_coeff)
            return total, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u.astype(p.dtype)), state["params"], updates)
        new_state = {
            "params": new_params,
            "opt_state": new_opt,
            "step": state["step"] + 1,
            "rng": state["rng"],
        }
        metrics = {"loss": loss, "lm_loss": parts["lm"],
                   "nsp_loss": parts["nsp"], "img_loss": parts["img"]}
        # telemetry: sequences whose label count exceeds the gathered-MLM
        # budget (their tail labels are silently truncated on the 'gathered'
        # path, unimm.lm_loss_and_heads). Unreachable for real VisDial data;
        # surfaced so a config/data change that makes it reachable is visible.
        n_lab = jnp.sum(batch["mlm_labels"] != -1, axis=-1)
        metrics["label_budget_overflow"] = jnp.sum(
            (n_lab > cfg.max_train_label_positions).astype(jnp.int32))
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_step_with_fallback(cfg: VilbertConfig, tx, *,
                                  policy: str = "dense", **kw):
    """Host-dispatching wrapper around make_train_step that guarantees no
    silent gathered-MLM label truncation (vilbert_dialog.py:1577-1595
    exactness: the reference always materialises full logits, so every label
    contributes).

    Returns step(state, batch, nsp_weight=None, host_mlm_labels=None).
    ``host_mlm_labels`` is the pre-shard host [N, L] label array (the CLIs
    have it for free); when omitted the check falls back to fetching
    batch['mlm_labels'] (single-process only).

    policy:
      'dense' — batches where any sequence's label count exceeds
                cfg.max_train_label_positions run through a second step
                compiled with mlm_loss_impl='dense' (exact full-logits path;
                compiled lazily on first overflow — real VisDial data never
                overflows, ROADMAP 'label budget');
      'error' — raise ValueError instead;
      'allow' — keep the gathered step (telemetry still counts overflow).

    The check is a host-side comparison, so dispatch stays data-independent
    inside each jitted graph (a lax.cond would have to build the
    [N, L, vocab] dense logits into the gathered graph too). Multi-process:
    every process must take the same branch — the local booleans are
    process_allgather-ed (one tiny collective per step, only in
    multi-process mode).
    """
    assert policy in ("dense", "error", "allow"), policy
    gathered = make_train_step(cfg, tx, **kw)
    if cfg.mlm_loss_impl != "gathered" or policy == "allow":
        def plain(state, batch, nsp_weight=None, host_mlm_labels=None):
            return gathered(state, batch, nsp_weight)
        return plain

    import dataclasses
    dense_cfg = dataclasses.replace(cfg, mlm_loss_impl="dense")
    cache: Dict[str, Any] = {}

    def overflowed(batch, host_mlm_labels) -> bool:
        labels = host_mlm_labels
        if labels is None:
            labels = batch["mlm_labels"]  # fully-addressable fetch
        import numpy as np
        n = (np.asarray(labels) != -1).sum(axis=-1)
        over = bool(n.max(initial=0) > cfg.max_train_label_positions)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            over = bool(np.any(multihost_utils.process_allgather(
                np.asarray([over]))))
        return over

    def step(state, batch, nsp_weight=None, host_mlm_labels=None):
        if overflowed(batch, host_mlm_labels):
            if policy == "error":
                raise ValueError(
                    "gathered-MLM label budget overflow: a sequence carries "
                    f"more than max_train_label_positions="
                    f"{cfg.max_train_label_positions} labels and its tail "
                    "would be silently dropped; raise the budget or use "
                    "-label_overflow_policy dense")
            if "dense" not in cache:
                cache["dense"] = make_train_step(dense_cfg, tx, **kw)
            return cache["dense"](state, batch, nsp_weight)
        return gathered(state, batch, nsp_weight)

    return step


def init_state(params, tx, seed: int = 0) -> Dict[str, Any]:
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "rng": jax.random.PRNGKey(seed),
    }
