"""Fused online-softmax label-head kernel (eval NLL over the tied decoder).

The eval label head scores each gathered label position against the full
30K-vocab tied decoder (ops/losses.online_softmax_xent — the TPU
re-design of the reference's dense [N, L, V] logits, vilbert_dialog.py:1069,
val_lm.py:131-134). The XLA implementation streams vocab chunks through a
``lax.scan``; XLA materialises each [M, chunk] fp32 logits tile in HBM
between the matmul and the reductions (~4.1 ms/group measured at prefix
bench shapes, scripts/bench_prefix_attr.py, ROADMAP "TPU backlog" #3).

This kernel keeps every logits tile in VMEM: grid (row-blocks, vocab-tiles)
with the vocab axis innermost, running (max, exp-sum, true-logit) carried in
VMEM scratch across the vocab tiles of a row block, and only the final [M]
NLL written to HBM. The hidden row block stays resident across the whole
vocab sweep.

Eval-only (no VJP) — training keeps ops/losses.online_softmax_xent_vjp.
Numerics: fp32 accumulation, same running-max update order as the XLA scan;
agreement asserted in tests/test_pallas_head.py (fp32 exact-tolerance vs
online_softmax_xent, plus bf16-input consistency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xent_kernel(h_ref, lab_ref, w_ref, b_ref, o_ref,
                 m_ref, s_ref, t_ref, *, VT, n_vt):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        s_ref[...] = jnp.zeros_like(s_ref)
        t_ref[...] = jnp.zeros_like(t_ref)

    h = h_ref[...]                                   # [BM, H]
    w = w_ref[...]                                   # [VT, H]
    logits = jax.lax.dot_general(
        h, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [BM, VT]
    logits = logits + b_ref[...].astype(jnp.float32)  # b is [1, VT]

    m_run, s_run = m_ref[...], s_ref[...]            # [BM, 1]
    c_max = jnp.max(logits, axis=-1, keepdims=True)
    new_max = jnp.maximum(m_run, c_max)
    s_ref[...] = (s_run * jnp.exp(m_run - new_max)
                  + jnp.sum(jnp.exp(logits - new_max), axis=-1,
                            keepdims=True))
    m_ref[...] = new_max

    # the true-label logit, when the label falls inside this vocab tile:
    # one-hot compare against an int iota (take_along_axis does not
    # legalize in Mosaic; integer arithmetic does, CLAUDE.md)
    lab = lab_ref[...]                               # [BM, 1] int32
    local = lab - v * VT
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    picked = jnp.sum(jnp.where(cols == local, logits, 0.0), axis=-1,
                     keepdims=True)
    in_tile = (local >= 0) & (local < VT)
    t_ref[...] = jnp.where(in_tile, picked, t_ref[...])

    @pl.when(v == n_vt - 1)
    def _fin():
        lse = m_ref[...] + jnp.log(s_ref[...])
        o_ref[...] = jnp.where(lab == -1, 0.0, lse - t_ref[...])


def online_softmax_xent_tpu(hidden, decoder_weight, decoder_bias, labels,
                            *, block_m: int = 256, block_v: int = 2560,
                            interpret: bool = False):
    """NLL of ``labels`` under softmax(hidden @ decoder_weight.T + bias).

    Drop-in for ops.losses.online_softmax_xent's eval use (same signature
    semantics: -1 labels return 0). Leading dims of hidden/labels are
    flattened; rows are padded to ``block_m`` and the vocab to ``block_v``
    (bias pads at -1e30, contributing exp(-inf)=0 like the XLA path).
    """
    V, H = decoder_weight.shape
    shape = labels.shape
    h = hidden.reshape(-1, H)
    lab = labels.reshape(-1).astype(jnp.int32)
    M = h.shape[0]
    # BM must stay 8-aligned (second-to-minor Mosaic tiling) even for odd
    # small M; the pad_m rows it forces carry label -1 and contribute 0
    BM = min(block_m, max(8, -(-M // 8) * 8))
    pad_m = -M % BM
    if pad_m:
        h = jnp.pad(h, ((0, pad_m), (0, 0)))
        lab = jnp.pad(lab, (0, pad_m), constant_values=-1)
    VT = min(block_v, V)
    pad_v = -V % VT
    w, b = decoder_weight, decoder_bias
    if pad_v:
        w = jnp.pad(w, ((0, pad_v), (0, 0)))
        b = jnp.pad(b, (0, pad_v), constant_values=-1e30)
    n_vt = (V + pad_v) // VT

    grid = ((M + pad_m) // BM, n_vt)
    nll = pl.pallas_call(
        functools.partial(_xent_kernel, VT=VT, n_vt=n_vt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, H), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VT, H), lambda m, v: (v, 0),
                         memory_space=pltpu.VMEM),
            # 2-D [1, VT] blocks: Mosaic tiles 1-D operands at 1024 lanes,
            # which non-multiple block sizes cannot window
            pl.BlockSpec((1, VT), lambda m, v: (0, v),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, 1), lambda m, v: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + pad_m, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BM, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(h, lab[:, None], w, b[None, :])
    return nll[:M, 0].reshape(shape)
