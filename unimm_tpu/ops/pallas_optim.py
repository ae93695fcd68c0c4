"""Fused AdamW update kernel (TPU Pallas).

One VMEM-resident pass PER PARAMETER LEAF: read (g, p, mu, nu) tiles,
write (update, mu', nu') tiles — the moments never round-trip HBM between
the moment update, bias correction, and the step computation the way the
optax chain's separate fused passes do. The math is bit-identical to
``optax.scale_by_adam`` followed by the grouped ``(-lr * (dir + wd * p))``
scaling in train/optim.py (same op order: moments via b*m + (1-b)*g,
bias correction by DIVISION by (1 - b**t); proven in tests/test_optim.py).

Reference semantics being reproduced: AdamW with eps inside the sqrt-add,
decoupled weight decay, two LR groups (/root/reference/train.py:322-348,
/root/reference/utils/optim_utils.py:8-26).

Leaves keep their NATURAL shapes (a [in, out] kernel stays 2-D, a bias
becomes [1, n]). An earlier flat-vector design (all leaves concatenated
per LR group) is a measured dead end through the axon AOT compiler: any
materialised ~250M-element f32 value — 1-D or as a reshape endpoint — is
assigned a canonical f32[N/2, 2]{T(8,128)} layout whose 2-wide lane dim
pads to 128 (64x the memory, instant HBM OOM; scripts/probe_fused_optim.py
reproduces it in three graph variants). Per-leaf calls sidestep the
pathology entirely, keep the optimizer state tree byte-compatible with the
grouped optimizer's (checkpoint graft/extract work unchanged), and cost
only ~one kernel launch per leaf. Scalars (lr, wd, bias corrections)
arrive via SMEM so one compiled kernel serves every step and every
same-shaped leaf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target elements per grid block: [BLOCK_ELEMS] fp32 = 256 KB per buffer
# per step (7 buffers x double buffering ~= 3.5 MB VMEM)
BLOCK_ELEMS = 65536


def _adamw_kernel(s_ref, g_ref, p_ref, mu_ref, nu_ref,
                  u_ref, mu_out, nu_out, *, b1, b2, eps):
    lr = s_ref[0]
    wd = s_ref[1]
    bc1 = s_ref[2]           # 1 - b1**t  (divide, matching optax rounding)
    bc2 = s_ref[3]           # 1 - b2**t
    g = g_ref[:]
    mu = b1 * mu_ref[:] + (1.0 - b1) * g
    nu = b2 * nu_ref[:] + (1.0 - b2) * (g * g)
    mu_out[:] = mu
    nu_out[:] = nu
    direction = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    u_ref[:] = -lr * (direction + wd * p_ref[:])


def adamw_update_leaf(g, p, mu, nu, lr, wd, bc1, bc2, *,
                      b1=0.9, b2=0.999, eps=1e-6, interpret=False):
    """One fused AdamW pass over one parameter leaf (natural shape).

    Args:
      g, p, mu, nu: float32, the leaf's own shape (1-D or 2-D — every
        param in this model). 1-D leaves run as [1, n]; 2-D leaves are
        row-blocked so a block stays ~BLOCK_ELEMS elements.
      lr, wd, bc1, bc2: scalars (traced OK) — group learning rate, weight
        decay, and the two bias-correction denominators (1 - b**t).

    Returns (update, new_mu, new_nu) in the leaf's shape; ``g``, ``mu``
    and ``nu`` are donated into the outputs (input_output_aliases), so
    under jit the pass adds no buffers beyond the update itself.
    """
    shape = g.shape
    if g.ndim == 1:
        view = (1, shape[0])
    else:
        assert g.ndim == 2, shape
        view = shape
    R, C = view
    br = max(1, min(R, BLOCK_ELEMS // max(1, C)))
    if br >= 8:
        br -= br % 8          # sublane-aligned blocks when there's room
    grid = -(-R // br)
    scal = jnp.stack([jnp.asarray(lr, jnp.float32),
                      jnp.asarray(wd, jnp.float32),
                      jnp.asarray(bc1, jnp.float32),
                      jnp.asarray(bc2, jnp.float32)])
    vspec = pl.BlockSpec((br, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=float(b1), b2=float(b2),
                          eps=float(eps)),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 4,
        out_specs=[vspec] * 3,
        out_shape=[jax.ShapeDtypeStruct(view, jnp.float32)] * 3,
        input_output_aliases={1: 0, 3: 1, 4: 2},   # g->u, mu->mu', nu->nu'
        interpret=interpret,
    )(scal, g.reshape(view), p.reshape(view),
      mu.reshape(view), nu.reshape(view))
    return tuple(o.reshape(shape) for o in out)
