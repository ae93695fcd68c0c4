"""Fused answer-rows attention kernel for the prefix-cache scorer.

The prefix scorer's answer pass (eval/prefix.py:_answer_impl) runs W~16
answer rows per option against a cached context of Lcb~192 K/V rows. On
XLA the per-layer chain materialises [G, O, H, W, Lcb+W] score AND
probability tensors in HBM (~1.5 GB/layer at bench shapes, measured at
~3.7 ms/layer of pure HBM traffic — scripts/bench_prefix_attr.py,
ROADMAP "TPU backlog results" #3). This kernel is the directed fix: the
whole per-layer attention sub-block

    QKV projection of the answer rows
    -> scores vs (cached context K/V ++ the block's own row K/V)
    -> additive masks -> fp32 softmax -> PV
    -> head merge -> output projection -> residual -> LayerNorm

in ONE VMEM-resident pass per (group row-block) grid step, so no
[*, Lcb+Rw]-sized tensor ever reaches HBM. Same design as
ops/pallas_attention_v2.fused_attention_block (the flat evaluator's
measured win), extended with a second, grid-persistent K/V source: the
context caches are indexed by g only, so Mosaic keeps them resident
across a group's row-blocks.

The attention masks arrive as two precomputed additive biases (they are
layer-independent, built once per dispatch in eval/prefix.py):

* ``b_ctx`` [G, 1, Lcb] — context columns open on [1, lc) (row-independent:
  every answer row attends the full shared context).
* ``b_rr`` [G, OB, Rw, Rw] — the block-diagonal row->row bias: option o's
  rows attend only option o's rows, first-copy rows causally (ks <= i),
  second-copy rows the first copy strictly before i - A plus themselves
  (reference gen mask, data_utils.py:139-288 / ops/masks.py).

Semantics match eval/prefix.py's XLA ``rows_attention`` path up to float
rounding (tests/test_prefix_kernel.py asserts fp32 agreement with the
flat full-forward oracle).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unimm_tpu.ops.masks import NEG_INF


def pick_o_blk(O: int, W: int, target: int = 256) -> int:
    """Options per grid step: the largest divisor of O with O_blk*W rows
    <= ``target`` (row count sized for MXU-friendly projection matmuls
    while the per-head [Rw, Lcb+Rw] fp32 probs stay a few hundred KB)."""
    best = 1
    for d in range(1, O + 1):
        if O % d == 0 and d * W <= target:
            best = d
    return best


def block_rr_bias(rr_open, o_blk: int):
    """[G, O, W, W] per-option row->row openness -> the blocked additive
    bias [G, O//o_blk, Rw, Rw] (Rw = o_blk*W) with NEG_INF between
    different options' rows (block-diagonal structure)."""
    G, O, W, _ = rr_open.shape
    OB = O // o_blk
    rr = rr_open.reshape(G, OB, o_blk, W, 1, W)
    same = jnp.eye(o_blk, dtype=bool)[None, None, :, None, :, None]
    open_blk = jnp.logical_and(same, rr)
    open_blk = jnp.broadcast_to(open_blk, (G, OB, o_blk, W, o_blk, W))
    return jnp.where(open_blk, 0.0, NEG_INF).astype(
        jnp.float32).reshape(G, OB, o_blk * W, o_blk * W)


def _answer_kernel(x_ref, kc_ref, vc_ref, bc_ref, brr_ref, wq_ref, bq_ref,
                   wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                   g_ref, beta_ref, o_ref, *, H, D, scale, eps):
    x = x_ref[0]                                    # [Rw, HID]
    dt = x.dtype
    Rw = x.shape[0]
    kc = kc_ref[0]                                  # [K, HID] cached ctx K
    vc = vc_ref[0]
    K = kc.shape[0]

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(dt)

    q = proj(wq_ref, bq_ref)
    q = (q.astype(jnp.float32) * scale).astype(dt)
    k_all = jnp.concatenate([kc, proj(wk_ref, bk_ref)], axis=0)
    v_all = jnp.concatenate([vc, proj(wv_ref, bv_ref)], axis=0)
    bias = jnp.concatenate(
        [jnp.broadcast_to(bc_ref[0], (Rw, K)), brr_ref[0, 0]], axis=-1)

    ctx = []
    for h in range(H):
        qh = jax.lax.slice(q, (0, h * D), (Rw, (h + 1) * D))
        kh = jax.lax.slice(k_all, (0, h * D), (K + Rw, (h + 1) * D))
        vh = jax.lax.slice(v_all, (0, h * D), (K + Rw, (h + 1) * D))
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + bias, axis=-1)
        ctx.append(jax.lax.dot_general(
            p.astype(dt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx, axis=-1)             # [Rw, HID]

    out = jax.lax.dot_general(ctx, wo_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    h32 = out + x.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def fused_answer_block(x, kc, vc, b_ctx, b_rr, p_attn, *, num_heads,
                       eps=1e-12, interpret=False):
    """One-kernel BertAttention over cached-context + row K/V.

    Args:
      x: [G, O*W, HID] answer-row activations (options flattened, row-major).
      kc, vc: [G, Lcb, HID] per-layer K/V of the cached context (already
        projected, bias included — vilbert.linear(p_attn.self.key, cache)).
      b_ctx: [G, 1, Lcb] fp32 additive context-column bias.
      b_rr: [G, OB, Rw, Rw] fp32 blocked row->row bias (block_rr_bias);
        OB*Rw == O*W.
      p_attn: the ``attention`` param subtree, cast to the compute dtype.
    Returns LayerNorm(x + Wo·attn) with the same shape/dtype as x.
    """
    G, RW, HID = x.shape
    _, OB, Rw, _ = b_rr.shape
    assert OB * Rw == RW, (OB, Rw, RW)
    K = kc.shape[1]
    D = HID // num_heads
    ps, po = p_attn["self"], p_attn["output"]
    w = pl.BlockSpec(memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Rw, HID), lambda g, ob: (g, ob, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, K, HID), lambda g, ob: (g, 0, 0),
                         memory_space=pltpu.VMEM)
    bcspec = pl.BlockSpec((1, 1, K), lambda g, ob: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    brspec = pl.BlockSpec((1, 1, Rw, Rw), lambda g, ob: (g, ob, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_answer_kernel, H=num_heads, D=D,
                          scale=1.0 / math.sqrt(D), eps=eps),
        grid=(G, OB),
        in_specs=[xspec, cspec, cspec, bcspec, brspec,
                  w, w, w, w, w, w, w, w, w, w],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, kc, vc, b_ctx, b_rr,
      ps["query"]["kernel"], ps["query"]["bias"],
      ps["key"]["kernel"], ps["key"]["bias"],
      ps["value"]["kernel"], ps["value"]["bias"],
      po["dense"]["kernel"], po["dense"]["bias"],
      po["LayerNorm"]["weight"], po["LayerNorm"]["bias"])
