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
from typing import Any, Dict, NamedTuple, Optional, Sequence

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
# fused flat-state AdamW (ops/pallas_optim.py)
# ---------------------------------------------------------------------------

GROUPS = ("lang_decay", "lang_nodecay", "img_decay", "img_nodecay")
_PAD_Q = 8192        # pallas_optim operates on [rows, 1024] fp32, rows % 8


class FusedAdamState(NamedTuple):
    """Flat-moment AdamW state: one fp32 vector per (lr, wd) group.

    The leaf->offset layout is NOT stored here (pytree leaves must be
    arrays); it is a pure function of (params, language set) —
    ``fused_layout`` — recomputed wherever conversion to/from per-leaf
    moments is needed (checkpoint graft/extract)."""
    count: Any
    mu: Dict[str, Any]
    nu: Dict[str, Any]


def _get_path(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def fused_layout(params, language_weights: Optional[Sequence[str]] = None):
    """Deterministic flat layout: {label: [(path, offset, size, shape)...]}
    plus the zero-padded per-label totals (multiples of the kernel tile).
    Iterates dict keys SORTED so the layout depends only on the param tree
    structure, not insertion order."""
    if language_weights is None:
        lang_set = {ckpt.torch_name(p)
                    for p, _ in ckpt.iter_param_items(params)}
    else:
        lang_set = ckpt.language_param_set(list(language_weights))
    segs = {g: [] for g in GROUPS}
    off = {g: 0 for g in GROUPS}

    def rec(node, path):
        if isinstance(node, dict):
            for k in sorted(node):
                rec(node[k], path + (k,))
            return
        lab = ckpt.group_label(path, lang_set)
        segs[lab].append((path, off[lab], int(node.size), tuple(node.shape)))
        off[lab] += int(node.size)

    rec(params, ())
    n = {g: (-(-off[g] // _PAD_Q) * _PAD_Q if off[g] else 0) for g in GROUPS}
    return {"segs": segs, "n": n}


def flatten_group(tree, layout, label):
    """Concatenate a group's leaves (layout order) into one padded fp32
    vector. Works on jnp or np trees (returns the input family's arrays)."""
    import jax.numpy as jnp
    segs = layout["segs"][label]
    parts = [jnp.asarray(_get_path(tree, p)).astype(jnp.float32).reshape(-1)
             for p, _, _, _ in segs]
    v = jnp.concatenate(parts)
    n = layout["n"][label]
    if v.shape[0] < n:
        v = jnp.concatenate([v, jnp.zeros(n - v.shape[0], jnp.float32)])
    return v


def unflatten_groups(flat_by_label, layout, params_template):
    """Inverse of flatten_group: slice each leaf back out of its group's
    flat vector, shaped like ``params_template``."""
    _index_layout(layout)

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        lab, off, size, shape = layout["_by_path"][path]
        return flat_by_label[lab][off:off + size].reshape(shape)

    return rec(params_template, ())


def _index_layout(layout):
    if "_by_path" in layout:
        return
    by_path = {}
    for lab, segs in layout["segs"].items():
        for path, off, size, shape in segs:
            by_path[path] = (lab, off, size, shape)
    layout["_by_path"] = by_path


def make_fused_optimizer(params, cfg: OptimConfig,
                         language_weights: Optional[Sequence[str]] = None):
    """Grouped AdamW with flat moments and the fused single-pass update
    kernel (ops/pallas_optim.py). Numerically matches
    ``make_optimizer`` step for step (same moment/bias-correction/update
    op order — tests/test_optim.py::test_fused_matches_grouped); the state
    is one fp32 (mu, nu) vector per (lr, wd) group instead of per-leaf
    trees, so the whole update is 4 kernel launches touching each buffer
    exactly once. Wrap in optax.MultiSteps for accumulation exactly like
    make_optimizer (the CLI does)."""
    import jax.numpy as jnp

    layout = fused_layout(params, language_weights)
    lang_sched = warmup_linear_nonzero(cfg.lr, cfg,
                                       step_scale=cfg.batch_multiply)
    img_sched = warmup_linear_nonzero(cfg.image_lr, cfg,
                                      step_scale=cfg.batch_multiply)
    b1, b2 = 0.9, 0.999

    def init(params_):
        return FusedAdamState(
            count=jnp.zeros([], jnp.int32),
            mu={g: jnp.zeros(layout["n"][g], jnp.float32) for g in GROUPS
                if layout["n"][g]},
            nu={g: jnp.zeros(layout["n"][g], jnp.float32) for g in GROUPS
                if layout["n"][g]})

    def update(updates, state, params_=None):
        if params_ is None:
            raise ValueError("fused adamw requires params")
        from unimm_tpu.ops import pallas_optim

        interpret = jax.default_backend() == "cpu"
        lr = {"lang": lang_sched(state.count), "img": img_sched(state.count)}
        t = (state.count + 1).astype(jnp.float32)
        bc1 = 1.0 - b1 ** t          # divide in-kernel (optax rounding)
        bc2 = 1.0 - b2 ** t
        u_flat, mu_new, nu_new = {}, {}, {}
        for lab in GROUPS:
            if not layout["n"][lab]:
                continue
            group, decay = lab.split("_")
            wd = cfg.weight_decay if decay == "decay" else 0.0
            u, mu, nu = pallas_optim.adamw_update_flat(
                flatten_group(updates, layout, lab),
                flatten_group(params_, layout, lab),
                state.mu[lab], state.nu[lab],
                lr[group], wd, bc1, bc2,
                b1=b1, b2=b2, eps=cfg.adam_eps, interpret=interpret)
            u_flat[lab], mu_new[lab], nu_new[lab] = u, mu, nu
        new_updates = jax.tree_util.tree_map(
            lambda p, u: u.astype(p.dtype),
            params_, unflatten_groups(u_flat, layout, params_))
        return new_updates, FusedAdamState(count=state.count + 1,
                                           mu=mu_new, nu=nu_new)

    tx = optax.GradientTransformation(init, update)
    if cfg.batch_multiply > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.batch_multiply)
    return tx
