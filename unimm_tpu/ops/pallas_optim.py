"""Fused AdamW update kernel (TPU Pallas).

One VMEM-resident pass per parameter group: read (g, p, mu, nu) tiles,
write (update, mu', nu') tiles — the moments never round-trip HBM between
the moment update, bias correction, and the step computation the way the
optax chain's separate fused passes do. The math is bit-identical to
``optax.scale_by_adam`` followed by the grouped ``(-lr * (dir + wd * p))``
scaling in train/optim.py (same op order: moments via b*m + (1-b)*g,
bias correction by DIVISION by (1 - b**t); proven in tests/test_optim.py).

Reference semantics being reproduced: AdamW with eps inside the sqrt-add,
decoupled weight decay, two LR groups (/root/reference/train.py:322-348,
/root/reference/utils/optim_utils.py:8-26).

The kernel operates on FLAT fp32 vectors (one per (lr, wd) group — see
train/optim.py::make_fused_optimizer for the leaf->segment layout). Scalars
(lr, wd, bias corrections) arrive via SMEM so one compiled kernel serves
every step and every group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 tile: (8, 128) minimum; the flat vector is reshaped to [rows, LANES]
LANES = 1024
BLOCK_ROWS = 256            # [256, 1024] fp32 = 1 MB per buffer per step


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


def adamw_update_flat(g, p, mu, nu, lr, wd, bc1, bc2, *,
                      b1=0.9, b2=0.999, eps=1e-6, interpret=False):
    """One fused AdamW pass over flat fp32 vectors.

    Args:
      g, p, mu, nu: [N] float32, N a multiple of LANES * 8.
      lr, wd, bc1, bc2: scalars (traced OK) — group learning rate, weight
        decay, and the two bias-correction denominators (1 - b**t).

    Returns (updates [N], new_mu [N], new_nu [N]); ``g``, ``mu`` and ``nu``
    are donated into the outputs (input_output_aliases), so under jit the
    pass adds no buffers beyond the update vector itself.
    """
    (n,) = g.shape
    assert n % (LANES * 8) == 0, n
    rows = n // LANES
    br = min(BLOCK_ROWS, rows)
    assert rows % br == 0, (rows, br)
    scal = jnp.stack([jnp.asarray(lr, jnp.float32),
                      jnp.asarray(wd, jnp.float32),
                      jnp.asarray(bc1, jnp.float32),
                      jnp.asarray(bc2, jnp.float32)])
    shape2 = (rows, LANES)
    vspec = pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=float(b1), b2=float(b2),
                          eps=float(eps)),
        grid=(rows // br,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 4,
        out_specs=[vspec] * 3,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 3,
        input_output_aliases={1: 0, 3: 1, 4: 2},   # g->u, mu->mu', nu->nu'
        interpret=interpret,
    )(scal, g.reshape(shape2), p.reshape(shape2),
      mu.reshape(shape2), nu.reshape(shape2))
    return tuple(o.reshape(n) for o in out)
