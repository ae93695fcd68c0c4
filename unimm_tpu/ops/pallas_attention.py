"""Fused text self-attention Pallas kernel with in-kernel mask generation.

The framework's designed perf seam (SURVEY §5 long-context note): instead of
materialising a [B, L, L] additive bias in HBM per batch (the XLA path — and
the reference ships those masks from the host, data_utils.py:149-151,300),
this kernel regenerates the dis/gen mask from the 3-int descriptor
(mode, ctx_end, ans_len) INSIDE the attention kernel using iota comparisons,
fusing QK^T -> +bias -> softmax -> PV into one VMEM-resident pass per
(batch, head-block). The mask formulas mirror unimm_tpu/ops/masks.py exactly
(golden-tested for equality against the XLA path).

Layout: q,k,v [B, H, L, D] (bf16 in, fp32 softmax accumulation). L=256 and
D=64 for the flagship config, so a whole [L, L] score tile per head fits in
VMEM — no streaming needed; heads are blocked per grid step for MXU-friendly
batching.

Training uses a custom VJP whose backward pass recomputes the probabilities
in-kernel (no [B,H,L,L] residuals in HBM). Attention-prob dropout is applied
OUTSIDE the kernel path (the XLA path is used when dropout is active, i.e.
training with attention_probs_dropout_prob > 0 — see models/vilbert.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIAS = -10000.0   # matches vilbert_dialog.py:1418 additive mask


def _mask_bias(mode, L1, A, L: int):
    """[L, L] additive fp32 bias from scalar descriptors (in-kernel).

    Same zone formulas as ops/masks.text_attention_mask.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    dis = (i < L1) & (j < L1)

    T = jnp.minimum(L1 + A, L)
    Lc = L1 - A
    diag = i == j
    row0 = (i == 0) & (j < T)
    ctx_rows = (i >= 1) & (i < Lc) & (((j >= 1) & (j < Lc)) | diag)
    first_copy = (i >= Lc) & (i < L1) & (j >= 1) & (j <= i)
    second_copy = (i >= L1) & (i < T) & (((j >= 1) & (j < i - A)) | diag)
    gen = row0 | ctx_rows | first_copy | second_copy

    # arithmetic select (Mosaic cannot legalize a scalar-predicate
    # arith.select over boolean vectors)
    m = jnp.asarray(mode, jnp.int32)
    sel = dis.astype(jnp.int32) * (1 - m) + gen.astype(jnp.int32) * m
    return (1 - sel).astype(jnp.float32) * NEG_BIAS


def _fwd_kernel(desc_ref, q_ref, k_ref, v_ref, o_ref, *, scale, heads_per_block):
    b = pl.program_id(0)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2],
                      q_ref.shape[-2])
    for h in range(heads_per_block):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s + bias, axis=-1)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(desc_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, heads_per_block):
    b = pl.program_id(0)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2],
                      q_ref.shape[-2])
    for h in range(heads_per_block):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s + bias, axis=-1)                       # [L, L]
        dv_ref[0, h] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))     # [L, L]
        dq_ref[0, h] = (jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dk_ref[0, h] = (jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _specs(B, H, L, D):
    # index_map receives (grid_idx..., *scalar_prefetch_refs)
    qkv_spec = pl.BlockSpec((1, H, L, D), lambda b, desc: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return qkv_spec


def _call_fwd(desc, q, k, v, *, interpret=False):
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    spec = _specs(B, H, L, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[spec, spec, spec], out_specs=spec)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads_per_block=H),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(desc, q, k, v)


def _call_bwd(desc, q, k, v, do, *, interpret=False):
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    spec = _specs(B, H, L, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads_per_block=H),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype)),
        interpret=interpret,
    )(desc, q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_text_attention(q, k, v, desc, interpret=False):
    """Masked multi-head attention with in-kernel dis/gen mask generation.

    Args:
      q, k, v: [B, H, L, D] (bf16 or fp32).
      desc: [B, 3] int32 — columns (mode, ctx_end, ans_len).
      interpret: Pallas interpreter mode (CPU tests).
    Returns: [B, H, L, D] attention output in q.dtype.
    """
    return _call_fwd(desc, q, k, v, interpret=interpret)


def _fta_fwd(q, k, v, desc, interpret):
    return _call_fwd(desc, q, k, v, interpret=interpret), (q, k, v, desc)


def _fta_bwd(interpret, res, g):
    q, k, v, desc = res
    dq, dk, dv = _call_bwd(desc, q, k, v, g, interpret=interpret)
    return dq, dk, dv, None


fused_text_attention.defvjp(_fta_fwd, _fta_bwd)
