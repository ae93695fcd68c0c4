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
                    img_coeff=1.0, dtype=jnp.bfloat16, donate=True):
    """Returns train_step(state, batch) -> (state, metrics).

    state: dict(params=..., opt_state=..., step=int32, rng=PRNGKey).
    batch: descriptor batch (see unimm.forward_train) + optional 'nsp_weight'.
    """

    def train_step(state, batch, nsp_weight=None):
        rng = jax.random.fold_in(state["rng"], state["step"])

        def loss_fn(params):
            parts = unimm.forward_train(params, cfg, batch, rng=rng,
                                        nsp_weight=nsp_weight, dtype=dtype)
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


def init_state(params, tx, seed: int = 0) -> Dict[str, Any]:
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "rng": jax.random.PRNGKey(seed),
    }
