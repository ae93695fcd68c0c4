"""Optimizer and LR schedule.

Replicates the reference optimization setup (/root/reference/train.py:322-348,
/root/reference/utils/optim_utils.py:8-26) with optax:

* AdamW (eps 1e-6, bias correction on — pytorch_transformers defaults);
* two learning rates: parameters named in config/language_weights.json get
  ``lr``, the rest (vision stream, poolers, co-attention, image head) get
  ``image_lr``;
* no weight decay for bias/LayerNorm parameters, 0.01 otherwise;
* warmup-linear-to-floor schedule: linear 0->base over ``warmup_steps``, then
  linear decay to 0 over ``t_total``, floored at ``min_lr``;
* gradient accumulation via optax.MultiSteps (train.py ``batch_multiply``).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence

import jax
import optax

from unimm_tpu import checkpoint as ckpt


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 2e-5
    image_lr: float = 2e-5
    warmup_steps: int = 10000
    t_total: int = 200000          # hard-coded at reference call sites
    min_lr: float = 1e-5
    weight_decay: float = 0.01
    batch_multiply: int = 1
    adam_eps: float = 1e-6
    # dtype of the first Adam moment (optax mu_dtype); "bfloat16" halves the
    # mu HBM traffic in the update pass. None keeps fp32 (exact reference
    # parity; nu stays fp32 always — its magnitudes need the fp32 exponent
    # range near zero and bf16 rounding there visibly shifts step sizes).
    mu_dtype: Optional[str] = None


def warmup_linear_nonzero(base_lr: float, cfg: OptimConfig,
                          step_scale: int = 1):
    """utils/optim_utils.py:19-26 as an optax schedule.

    ``step_scale``: the reference advances the scheduler every MICRO-batch,
    including gradient-accumulation steps (train.py:463), while
    optax.MultiSteps only ticks the inner optimizer once per real update —
    so under accumulation the schedule is evaluated at
    update_count * batch_multiply to reproduce the reference's envelope."""

    def schedule(step):
        step = jax.numpy.asarray(step, jax.numpy.float32) * step_scale
        warm = step / max(1, cfg.warmup_steps)
        decay = jax.numpy.maximum(
            0.0, (cfg.t_total - step) / max(1.0, cfg.t_total - cfg.warmup_steps))
        factor = jax.numpy.where(step < cfg.warmup_steps, warm, decay)
        lr = base_lr * factor
        return jax.numpy.where(lr > cfg.min_lr, lr, cfg.min_lr)

    return schedule


def make_optimizer(params, cfg: OptimConfig,
                   language_weights: Optional[Sequence[str]] = None):
    """Build the grouped AdamW. ``language_weights`` is the parsed JSON list;
    if None, every parameter uses ``lr`` (single-group fallback)."""
    if language_weights is None:
        lang_set = {ckpt.torch_name(p) for p, _ in ckpt.iter_param_items(params)}
    else:
        lang_set = ckpt.language_param_set(list(language_weights))

    def label_tree(tree):
        def rec(node, path):
            if isinstance(node, dict):
                return {k: rec(v, path + (k,)) for k, v in node.items()}
            return ckpt.group_label(path, lang_set)
        return rec(tree, ())

    labels = label_tree(params)

    def adamw(base_lr, wd):
        return optax.adamw(
            learning_rate=warmup_linear_nonzero(base_lr, cfg,
                                                step_scale=cfg.batch_multiply),
            b1=0.9, b2=0.999, eps=cfg.adam_eps, weight_decay=wd,
            mu_dtype=cfg.mu_dtype)

    tx = optax.multi_transform({
        "lang_decay": adamw(cfg.lr, cfg.weight_decay),
        "lang_nodecay": adamw(cfg.lr, 0.0),
        "img_decay": adamw(cfg.image_lr, cfg.weight_decay),
        "img_nodecay": adamw(cfg.image_lr, 0.0),
    }, labels)

    if cfg.batch_multiply > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.batch_multiply)
    return tx


def load_language_weights(path: str):
    with open(path) as f:
        return json.load(f)
