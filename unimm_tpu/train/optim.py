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


def _group_labels(params, language_weights):
    """lr/decay group label per leaf (reference train.py:322-347 grouping:
    names in config/language_weights.json get ``lr``, the rest ``image_lr``;
    bias/LayerNorm no decay — incl. the stale-name quirk via
    ckpt.group_label). Shared by make_optimizer and make_fused_optimizer so
    the two tested-equivalent updates can never diverge in grouping."""
    if language_weights is None:
        lang_set = {ckpt.torch_name(p)
                    for p, _ in ckpt.iter_param_items(params)}
    else:
        lang_set = ckpt.language_param_set(list(language_weights))

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return ckpt.group_label(path, lang_set)

    return rec(params, ())


def make_optimizer(params, cfg: OptimConfig,
                   language_weights: Optional[Sequence[str]] = None):
    """Build the grouped AdamW. ``language_weights`` is the parsed JSON list;
    if None, every parameter uses ``lr`` (single-group fallback).

    Structure: ONE full-tree optax.scale_by_adam followed by a custom
    per-leaf (-lr_group * (dir + wd_group * p)) scaling whose group lr/wd
    are STATIC per leaf. This is numerically identical to the previous
    4-way optax.multi_transform of adamw's (test_optim proves it) but ~10
    ms/step faster at the flagship size — the masked partition cost more
    than the whole single-group update (measured on v5e: grouped 752.7,
    single-group 742.8, flattened 740.1, SGD floor 714.3 ms/step; see
    ROADMAP). The state keeps the standard ScaleByAdamState /
    ScaleByScheduleState shapes so the reference-checkpoint moment graft
    (checkpoint._graft_opt_state) and extraction work unchanged."""
    import jax.numpy as jnp

    labels = _group_labels(params, language_weights)
    lang_sched = warmup_linear_nonzero(cfg.lr, cfg,
                                       step_scale=cfg.batch_multiply)
    img_sched = warmup_linear_nonzero(cfg.image_lr, cfg,
                                      step_scale=cfg.batch_multiply)

    def init(params_):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params_):
        if params_ is None:
            raise ValueError("grouped adamw scaling requires params")
        lr = {"lang": lang_sched(state.count), "img": img_sched(state.count)}

        def leaf(u, p, lab):
            group, decay = lab.split("_")
            wd = cfg.weight_decay if decay == "decay" else 0.0
            out = u + wd * p.astype(u.dtype) if wd else u
            return (-lr[group] * out).astype(u.dtype)

        new_updates = jax.tree_util.tree_map(leaf, updates, params_, labels)
        return new_updates, optax.ScaleByScheduleState(count=state.count + 1)

    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.adam_eps,
                            mu_dtype=cfg.mu_dtype),
        optax.GradientTransformation(init, update))

    if cfg.batch_multiply > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.batch_multiply)
    return tx


def load_language_weights(path: str):
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# fused per-leaf AdamW (ops/pallas_optim.py)
# ---------------------------------------------------------------------------

def make_fused_optimizer(params, cfg: OptimConfig,
                         language_weights: Optional[Sequence[str]] = None):
    """Grouped AdamW whose whole update is one fused Pallas pass per leaf
    (ops/pallas_optim.py::adamw_update_leaf): read (g, p, mu, nu) tiles,
    write (update, mu', nu') tiles — no HBM round-trips between the moment
    update, bias correction and step computation the way the optax chain's
    separate fused passes have. Numerically matches ``make_optimizer`` step
    for step (same op order — tests/test_optim.py::test_fused_*).

    The state is LITERALLY the grouped optimizer's state tree —
    ``(optax.ScaleByAdamState(count, mu_tree, nu_tree),
    optax.ScaleByScheduleState(count))`` — so every checkpoint path
    (reference .ckpt graft/extract, Orbax native, -continue/-auto_resume)
    works unchanged and fused <-> grouped resumes are transparent. Leaves
    keep natural shapes: the flat-vector design is a measured dead end
    through the axon AOT compiler (see the pallas_optim module docstring).
    Wrap in optax.MultiSteps exactly like make_optimizer (done here when
    cfg.batch_multiply > 1)."""
    import jax.numpy as jnp

    labels = _group_labels(params, language_weights)
    lang_sched = warmup_linear_nonzero(cfg.lr, cfg,
                                       step_scale=cfg.batch_multiply)
    img_sched = warmup_linear_nonzero(cfg.image_lr, cfg,
                                      step_scale=cfg.batch_multiply)
    b1, b2 = 0.9, 0.999

    def init(params_):
        zeros = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: jnp.zeros(x.shape, jnp.float32), t)
        return (optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                       mu=zeros(params_), nu=zeros(params_)),
                optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32)))

    def update(updates, state, params_=None):
        if params_ is None:
            raise ValueError("fused adamw requires params")
        from unimm_tpu.ops import pallas_optim

        adam_s, sched_s = state
        interpret = jax.default_backend() == "cpu"
        lr = {"lang": lang_sched(sched_s.count),
              "img": img_sched(sched_s.count)}
        t = (adam_s.count + 1).astype(jnp.float32)
        bc1 = 1.0 - b1 ** t          # divide in-kernel (optax rounding)
        bc2 = 1.0 - b2 ** t

        def leaf(g, p, mu, nu, lab):
            group, decay = lab.split("_")
            wd = cfg.weight_decay if decay == "decay" else 0.0
            return pallas_optim.adamw_update_leaf(
                g.astype(jnp.float32), p.astype(jnp.float32), mu, nu,
                lr[group], wd, bc1, bc2,
                b1=b1, b2=b2, eps=cfg.adam_eps, interpret=interpret)

        out = jax.tree_util.tree_map(leaf, updates, params_,
                                     adam_s.mu, adam_s.nu, labels)
        is3 = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x[i], out, is_leaf=is3)
        new_updates = jax.tree_util.tree_map(
            lambda u, g: u.astype(g.dtype), pick(0), updates)
        new_state = (optax.ScaleByAdamState(count=adam_s.count + 1,
                                            mu=pick(1), nu=pick(2)),
                     optax.ScaleByScheduleState(count=sched_s.count + 1))
        return new_updates, new_state

    tx = optax.GradientTransformation(init, update)
    if cfg.batch_multiply > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.batch_multiply)
    return tx
