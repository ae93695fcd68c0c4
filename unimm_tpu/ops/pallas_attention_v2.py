"""Second-generation fused text-attention Pallas kernels.

Two designs beyond ops/pallas_attention.py (v1, one sequence per grid step):

* ``attention_v2`` — multi-sequence blocking: BB sequences x H heads per grid
  step so the (L, L) score work pipelines across bigger DMA windows, with the
  1/sqrt(D) scale folded into q once per block ([L, D] multiply instead of
  [L, L]).

* ``fused_attention_block`` — the whole BertAttention sub-block in ONE kernel:
  QKV projections -> in-kernel dis/gen mask from the 3-int descriptor ->
  softmax -> PV -> head merge -> output projection -> residual add ->
  LayerNorm (fp32 stats). Per grid step it reads one [L, hidden] sequence and
  the (VMEM-resident) weight set, and writes one [L, hidden] result: the
  [B,H,L,L] probability tensor, q/k/v/ctx activations, and the pre-LN sum
  never touch HBM. This is the designed replacement for the XLA chain in
  models/vilbert.py:self_attention_block (reference semantics:
  vilbert_dialog.py BertSelfAttention/BertSelfOutput :372-470).

* ``fused_attention_block_train`` — the differentiable variant of the block
  kernel (custom VJP) with both training dropout sites: attention-prob masks
  regenerated in-kernel from the TPU hardware PRNG, hidden-dropout applied
  as an externally supplied scale mask. The backward pass recomputes q/k/v
  and the per-head softmax in a second kernel, so no [B,H,L,L] tensor ever
  touches HBM in either direction.

All kernels regenerate the text mask from (mode, ctx_end, ans_len) exactly
as ops/masks.text_attention_mask (golden-tested). Dispatch rules live in
models/unimm.py:encode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unimm_tpu.ops.pallas_attention import _mask_bias

LN_EPS = 1e-12   # BertLayerNorm eps (vilbert_dialog.py:167)


# ---------------------------------------------------------------------------
# attention_v2: multi-sequence blocked attention
# ---------------------------------------------------------------------------

def _v2_kernel(desc_ref, q_ref, k_ref, v_ref, o_ref, *, scale, BB, H):
    b0 = pl.program_id(0) * BB
    L = q_ref.shape[-2]
    for i in range(BB):
        bias = _mask_bias(desc_ref[b0 + i, 0], desc_ref[b0 + i, 1],
                          desc_ref[b0 + i, 2], L)
        q = q_ref[i].astype(jnp.float32) * scale   # [H, L, D] scale folded
        q = q.astype(q_ref.dtype)
        for h in range(H):
            s = jax.lax.dot_general(
                q[h], k_ref[i, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s + bias, axis=-1)
            o_ref[i, h] = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[i, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def attention_v2(q, k, v, desc, *, block_b=4, interpret=False):
    """[B,H,L,D] attention with BB sequences per grid step (eval only)."""
    B, H, L, D = q.shape
    while B % block_b:
        block_b -= 1
    spec = pl.BlockSpec((block_b, H, L, D), lambda b, d: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // block_b,),
        in_specs=[spec, spec, spec], out_specs=spec)
    return pl.pallas_call(
        functools.partial(_v2_kernel, scale=1.0 / math.sqrt(D),
                          BB=block_b, H=H),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(desc, q, k, v)


# ---------------------------------------------------------------------------
# fused_attention_block: QKV proj + attention + out proj + residual + LN
# ---------------------------------------------------------------------------

def _block_kernel(desc_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                  wv_ref, bv_ref, wo_ref, bo_ref, g_ref, beta_ref, o_ref,
                  *, H, D, scale, eps, BB):
    b0 = pl.program_id(0) * BB
    L = x_ref.shape[-2]
    for i in range(BB):
        x = x_ref[i]                                       # [L, HD] bf16
        dt = x.dtype

        def proj(w_ref, b_ref, x=x, dt=dt):
            y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (y + b_ref[:].astype(jnp.float32)).astype(dt)

        q = proj(wq_ref, bq_ref)
        k = proj(wk_ref, bk_ref)
        v = proj(wv_ref, bv_ref)
        q = (q.astype(jnp.float32) * scale).astype(dt)

        bias = _mask_bias(desc_ref[b0 + i, 0], desc_ref[b0 + i, 1],
                          desc_ref[b0 + i, 2], L)

        ctx = []
        for h in range(H):
            qh = jax.lax.slice(q, (0, h * D), (L, (h + 1) * D))
            kh = jax.lax.slice(k, (0, h * D), (L, (h + 1) * D))
            vh = jax.lax.slice(v, (0, h * D), (L, (h + 1) * D))
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s + bias, axis=-1)
            ctx.append(jax.lax.dot_general(
                p.astype(dt), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt))
        ctx = jnp.concatenate(ctx, axis=-1)                # [L, H*D]

        out = jax.lax.dot_general(ctx, wo_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = out + bo_ref[:].astype(jnp.float32)

        # residual + LayerNorm, fp32 stats (models/vilbert.py:layer_norm)
        h32 = out + x.astype(jnp.float32)
        mean = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
        y = (h32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
        o_ref[i] = y.astype(o_ref.dtype)


def fused_attention_block(x, desc, p_attn, *, num_heads, eps=1e-12,
                          block_b=1, interpret=False):
    """One-kernel BertAttention: returns LayerNorm(x + Wo·attn(x)).

    Args:
      x: [B, L, HIDDEN] activations (bf16 or fp32).
      desc: [B, 3] int32 (mode, ctx_end, ans_len).
      p_attn: the ``attention`` param subtree ({self: {query,key,value},
        output: {dense, LayerNorm}}), already cast to the compute dtype.
      block_b: sequences per grid step — >1 gives Mosaic independent
        MXU/VPU chains to overlap (softmax of one sequence against the
        matmuls of the next).
    """
    B, L, HID = x.shape
    D = HID // num_heads
    while B % block_b:
        block_b -= 1
    ps, po = p_attn["self"], p_attn["output"]
    w = pl.BlockSpec(memory_space=pltpu.VMEM)   # whole (weight) array, resident
    xspec = pl.BlockSpec((block_b, L, HID), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // block_b,),
        in_specs=[xspec, w, w, w, w, w, w, w, w, w, w],
        out_specs=xspec)
    kernel = functools.partial(
        _block_kernel, H=num_heads, D=D, scale=1.0 / math.sqrt(D), eps=eps,
        BB=block_b)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(desc, x,
      ps["query"]["kernel"], ps["query"]["bias"],
      ps["key"]["kernel"], ps["key"]["bias"],
      ps["value"]["kernel"], ps["value"]["bias"],
      po["dense"]["kernel"], po["dense"]["bias"],
      po["LayerNorm"]["weight"], po["LayerNorm"]["bias"])


# ---------------------------------------------------------------------------
# fused_attention_block_train: the same sub-block, differentiable, with
# in-kernel attention-probability dropout (TPU hardware PRNG)
# ---------------------------------------------------------------------------
#
# Decomposition (keeps every [L, L] tensor in VMEM in BOTH passes):
#   fwd kernel : x -> (y, ctx)       ctx = merged attention context, saved as
#                                    a residual so the backward LN/Wo side
#                                    needs no attention recompute
#   bwd LN/Wo  : plain XLA — h_out = ctx@Wo+bo, od = h_out*m_o, LN backward,
#                dWo/dbo/dgamma/dbeta einsums (all big dense matmuls)
#   bwd kernel : (x, dctx) -> (dx_qkv, dq, dk, dv) — recomputes q/k/v and the
#                per-head softmax (+ the identical dropout bits, reseeded per
#                (sequence, head)) and backpropagates through it
#   bwd tail   : XLA einsums for dWq/dWk/dWv and bias sums
#
# The hidden-dropout mask m_o ([B, L, HID] scale-mask: 0 or 1/keep) is
# generated OUTSIDE with lax.rng_bit_generator — it is hidden-sized, so HBM
# traffic is cheap; only the [L, L]-sized probability masks must be
# regenerated in-kernel (pltpu.prng_seed(seed, b, h) makes the stream
# order-independent between fwd and bwd). pltpu's PRNG has no CPU interpret
# lowering, so attn_drop > 0 requires a real TPU; the attn_drop == 0 path is
# interpret-safe and grad-parity-tested on CPU.


def _prob_mask(seed, tag, L, attn_drop):
    # Mosaic accepts at most two seed values: fold (sequence, head) into one
    pltpu.prng_seed(seed, tag)
    bits = pltpu.prng_random_bits((L, L))
    keep = 1.0 - attn_drop
    thresh = jnp.uint32(min(int(keep * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits < thresh, jnp.float32(1.0 / keep), jnp.float32(0.0))


def _train_fwd_kernel(desc_ref, seed_ref, x_ref, wq_ref, bq_ref, wk_ref,
                      bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, g_ref, beta_ref,
                      mo_ref, y_ref, ctx_ref, *, H, D, scale, eps, attn_drop):
    b = pl.program_id(0)
    L = x_ref.shape[-2]
    x = x_ref[0]
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(dt)

    q = (proj(wq_ref, bq_ref).astype(jnp.float32) * scale).astype(dt)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2], L)

    ctx = []
    for h in range(H):
        qh = jax.lax.slice(q, (0, h * D), (L, (h + 1) * D))
        kh = jax.lax.slice(k, (0, h * D), (L, (h + 1) * D))
        vh = jax.lax.slice(v, (0, h * D), (L, (h + 1) * D))
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + bias, axis=-1)
        if attn_drop > 0.0:
            p = p * _prob_mask(seed_ref[0], b * H + h, L, attn_drop)
        ctx.append(jax.lax.dot_general(
            p.astype(dt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx, axis=-1)
    ctx_ref[0] = ctx

    out = jax.lax.dot_general(ctx, wo_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + bo_ref[:].astype(jnp.float32)) * mo_ref[0].astype(jnp.float32)
    h32 = out + x.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _train_bwd_kernel(desc_ref, seed_ref, x_ref, dctx_ref, wq_ref, bq_ref,
                      wk_ref, bk_ref, wv_ref, bv_ref, dx_ref, dq_ref, dk_ref,
                      dv_ref, *, H, D, scale, attn_drop):
    """Backward through (QKV proj -> masked softmax(+dropout) -> PV).

    Emits dq/dk/dv w.r.t. the PRE-projection outputs (for the XLA dW einsums)
    and dx_qkv = dq@Wq^T + dk@Wk^T + dv@Wv^T.
    """
    b = pl.program_id(0)
    L = x_ref.shape[-2]
    x = x_ref[0]
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(dt)

    q_s = (proj(wq_ref, bq_ref).astype(jnp.float32) * scale).astype(dt)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2], L)
    dctx = dctx_ref[0]

    dqs, dks, dvs = [], [], []
    for h in range(H):
        qh = jax.lax.slice(q_s, (0, h * D), (L, (h + 1) * D))
        kh = jax.lax.slice(k, (0, h * D), (L, (h + 1) * D))
        vh = jax.lax.slice(v, (0, h * D), (L, (h + 1) * D))
        dctx_h = jax.lax.slice(dctx, (0, h * D),
                               (L, (h + 1) * D)).astype(jnp.float32)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + bias, axis=-1)
        if attn_drop > 0.0:
            m = _prob_mask(seed_ref[0], b * H + h, L, attn_drop)
            pd = p * m
        else:
            m = None
            pd = p
        # dpd = dctx_h @ vh^T ; dv_h = pd^T @ dctx_h
        dpd = jax.lax.dot_general(dctx_h, vh.astype(jnp.float32),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvs.append(jax.lax.dot_general(
            pd, dctx_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
        dp = dpd * m if m is not None else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # s = q_s @ kh^T : dq_s = ds @ kh ; dk = ds^T @ q_s
        dq_s = jax.lax.dot_general(ds, kh.astype(jnp.float32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dqs.append((dq_s * scale).astype(dt))   # chain through the q scale
        dks.append(jax.lax.dot_general(
            ds, q_s.astype(jnp.float32)[:, h * D:(h + 1) * D],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
    dq = jnp.concatenate(dqs, axis=-1)
    dk = jnp.concatenate(dks, axis=-1)
    dv = jnp.concatenate(dvs, axis=-1)
    dq_ref[0] = dq
    dk_ref[0] = dk
    dv_ref[0] = dv
    # dx through the three projections (W^T contractions, weights resident)
    dx = jax.lax.dot_general(dq, wq_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx = dx + jax.lax.dot_general(dk, wk_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dx = dx + jax.lax.dot_general(dv, wv_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _train_call_fwd(x, desc, seed, m_o, wq, bq, wk, bk, wv, bv, wo, bo, g,
                    beta, *, H, eps, attn_drop, interpret):
    B, L, HID = x.shape
    D = HID // H
    w = pl.BlockSpec(memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, L, HID), lambda b, d, s: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,),
        in_specs=[xspec, w, w, w, w, w, w, w, w, w, w, xspec],
        out_specs=(xspec, xspec))
    kernel = functools.partial(
        _train_fwd_kernel, H=H, D=D, scale=1.0 / math.sqrt(D), eps=eps,
        attn_drop=attn_drop)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        interpret=interpret,
    )(desc, seed, x, wq, bq, wk, bk, wv, bv, wo, bo, g, beta, m_o)


def _train_call_bwd(x, dctx, desc, seed, wq, bq, wk, bk, wv, bv, *, H,
                    attn_drop, interpret):
    B, L, HID = x.shape
    D = HID // H
    w = pl.BlockSpec(memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, L, HID), lambda b, d, s: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,),
        in_specs=[xspec, xspec, w, w, w, w, w, w],
        out_specs=(xspec, xspec, xspec, xspec))
    kernel = functools.partial(
        _train_bwd_kernel, H=H, D=D, scale=1.0 / math.sqrt(D),
        attn_drop=attn_drop)
    sh = jax.ShapeDtypeStruct(x.shape, x.dtype)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(sh, sh, sh, sh),
        interpret=interpret,
    )(desc, seed, x, dctx, wq, bq, wk, bk, wv, bv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_attention_block_train(num_heads, attn_drop, interpret, x, desc,
                                seed, m_o, wq, bq, wk, bk, wv, bv, wo, bo,
                                g, beta):
    """Differentiable one-kernel BertAttention with in-kernel prob dropout.

    Same math as fused_attention_block plus the two training dropout sites
    (vilbert_dialog.py BertSelfAttention :409 / BertSelfOutput :463):
    attention probabilities (mask regenerated in-kernel from ``seed`` per
    (sequence, head)) and the output dense (externally supplied scale-mask
    ``m_o``, 0 or 1/keep).
    """
    y, _ = _train_call_fwd(x, desc, seed, m_o, wq, bq, wk, bk, wv, bv, wo,
                           bo, g, beta, H=num_heads, eps=LN_EPS,
                           attn_drop=attn_drop, interpret=interpret)
    return y


def _fabt_fwd(num_heads, attn_drop, interpret, x, desc, seed, m_o, wq, bq,
              wk, bk, wv, bv, wo, bo, g, beta):
    y, ctx = _train_call_fwd(x, desc, seed, m_o, wq, bq, wk, bk, wv, bv, wo,
                             bo, g, beta, H=num_heads, eps=LN_EPS,
                             attn_drop=attn_drop, interpret=interpret)
    return y, (x, desc, seed, m_o, ctx, wq, bq, wk, bk, wv, bv, wo, bo, g,
               beta)


def _fabt_bwd(num_heads, attn_drop, interpret, res, dy):
    (x, desc, seed, m_o, ctx, wq, bq, wk, bk, wv, bv, wo, bo, g,
     beta) = res
    f32 = jnp.float32
    # ---- LN / Wo side (plain XLA; recompute h32 stats from ctx) ----
    h_out = jnp.matmul(ctx, wo) + bo                       # [B,L,HID] dt
    od = h_out.astype(f32) * m_o.astype(f32)
    h32 = od + x.astype(f32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (h32 - mean) * inv
    dy32 = dy.astype(f32)
    dgamma = jnp.sum(dy32 * xhat, axis=(0, 1)).astype(g.dtype)
    dbeta = jnp.sum(dy32, axis=(0, 1)).astype(beta.dtype)
    dxhat = dy32 * g.astype(f32)
    dh32 = (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)) * inv
    dh_out = (dh32 * m_o.astype(f32)).astype(x.dtype)
    dctx = jnp.matmul(dh_out, wo.T.astype(x.dtype))
    dwo = jnp.einsum("ble,blf->ef", ctx.astype(f32), dh_out.astype(f32),
                     preferred_element_type=f32).astype(wo.dtype)
    dbo = jnp.sum(dh_out.astype(f32), axis=(0, 1)).astype(bo.dtype)
    # ---- QKV / attention side (Pallas recompute kernel) ----
    dx_qkv, dq, dk, dv = _train_call_bwd(
        x, dctx, desc, seed, wq, bq, wk, bk, wv, bv, H=num_heads,
        attn_drop=attn_drop, interpret=interpret)
    dx = dx_qkv.astype(f32) + dh32
    dwq = jnp.einsum("ble,blf->ef", x.astype(f32), dq.astype(f32),
                     preferred_element_type=f32).astype(wq.dtype)
    dwk = jnp.einsum("ble,blf->ef", x.astype(f32), dk.astype(f32),
                     preferred_element_type=f32).astype(wk.dtype)
    dwv = jnp.einsum("ble,blf->ef", x.astype(f32), dv.astype(f32),
                     preferred_element_type=f32).astype(wv.dtype)
    dbq = jnp.sum(dq.astype(f32), axis=(0, 1)).astype(bq.dtype)
    dbk = jnp.sum(dk.astype(f32), axis=(0, 1)).astype(bk.dtype)
    dbv = jnp.sum(dv.astype(f32), axis=(0, 1)).astype(bv.dtype)
    return (dx.astype(x.dtype), None, None, jnp.zeros_like(m_o),
            dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dgamma, dbeta)


fused_attention_block_train.defvjp(_fabt_fwd, _fabt_bwd)


# ---------------------------------------------------------------------------
# fused_ffn_block: intermediate -> gelu -> output -> residual -> LN
# ---------------------------------------------------------------------------

def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, beta_ref,
                o_ref, *, act, eps, BB):
    for i in range(BB):
        x = x_ref[i]                                       # [L, HID]
        dt = x.dtype
        h = jax.lax.dot_general(x, w1_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = (h + b1_ref[:].astype(jnp.float32)).astype(dt)
        # parity with models/vilbert.py: gelu evaluated in the compute dtype
        # (tanh approximation in bf16, exact erf in fp32)
        if act == "gelu":
            h = jax.nn.gelu(h, approximate=dt == jnp.bfloat16)
        elif act == "relu":
            h = jnp.maximum(h, 0)
        else:
            h = h * jax.nn.sigmoid(h)                      # swish
        out = jax.lax.dot_general(h.astype(dt), w2_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = out + b2_ref[:].astype(jnp.float32)
        h32 = out + x.astype(jnp.float32)
        mean = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
        y = (h32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
        o_ref[i] = y.astype(o_ref.dtype)


def fused_ffn_block(x, p_inter, p_out, *, act="gelu", eps=1e-12,
                    block_b=1, interpret=False):
    """One-kernel BertIntermediate+BertOutput: LayerNorm(x + W2·act(W1·x)).

    Weights stay VMEM-resident across the sequence grid; the [L, intermediate]
    activation never touches HBM (models/vilbert.py:ffn_block semantics,
    reference vilbert_dialog.py BertIntermediate/BertOutput :436-470).
    """
    B, L, HID = x.shape
    while B % block_b:
        block_b -= 1
    w = pl.BlockSpec(memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((block_b, L, HID), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_kernel, act=act, eps=eps, BB=block_b),
        grid=(B // block_b,),
        in_specs=[xspec, w, w, w, w, w, w],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, p_inter["dense"]["kernel"], p_inter["dense"]["bias"],
      p_out["dense"]["kernel"], p_out["dense"]["bias"],
      p_out["LayerNorm"]["weight"], p_out["LayerNorm"]["bias"])


# ---------------------------------------------------------------------------
# fused_co_text_block: the TEXT side of BertConnectionLayer in one kernel —
# q2(t_x) attends k1/v1(v_x) under the image-padding bias, then dense2 +
# residual + LayerNorm2 (reference vilbert_dialog.py BertBiAttention
# :681-698 scores1 path and BertBiOutput :771-775 dense2/LayerNorm2).
# The image side (q1 attends text under the co-mask, dense1/LayerNorm1) is
# region-length (37 rows) and stays on XLA, which batches it better.
# ---------------------------------------------------------------------------

def _co_text_kernel(tx_ref, vx_ref, imask_ref, wq2_ref, bq2_ref, wk1_ref,
                    bk1_ref, wv1_ref, bv1_ref, wd2_ref, bd2_ref, g_ref,
                    beta_ref, o_ref, *, H, D, scale, eps):
    t = tx_ref[0]                                          # [L, HID_T]
    vx = vx_ref[0]                                         # [R, HID_V]
    dt = t.dtype
    L = t.shape[0]
    R = vx.shape[0]

    def proj(x, w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(dt)

    q2 = proj(t, wq2_ref, bq2_ref)                         # [L, BI]
    q2 = (q2.astype(jnp.float32) * scale).astype(dt)
    k1 = proj(vx, wk1_ref, bk1_ref)                        # [R, BI]
    v1 = proj(vx, wv1_ref, bv1_ref)
    # image padding bias (ops/masks.image_self_bias / to_additive semantics):
    # -10000 on masked-out regions, broadcast over text rows. The mask
    # arrives [1, 1, R] (block over [B, 1, R] — a [B, R] block of (1, R)
    # violates the sublane tiling rule); [0] reads a [1, R] row that
    # broadcasts over the [L, R] scores.
    bias = jnp.where(imask_ref[0] > 0, jnp.float32(0.0),
                     jnp.float32(-10000.0))

    ctx = []
    for h in range(H):
        qh = jax.lax.slice(q2, (0, h * D), (L, (h + 1) * D))
        kh = jax.lax.slice(k1, (0, h * D), (R, (h + 1) * D))
        vh = jax.lax.slice(v1, (0, h * D), (R, (h + 1) * D))
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + bias, axis=-1)              # [L, R]
        ctx.append(jax.lax.dot_general(
            p.astype(dt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx, axis=-1)                    # [L, BI]

    out = jax.lax.dot_general(ctx, wd2_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    h32 = out + bd2_ref[:].astype(jnp.float32) + t.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def fused_co_text_block(t_x, v_x, image_mask, p_conn, *, num_heads,
                        eps=1e-12, interpret=False):
    """Text-side co-attention sub-block: LayerNorm2(t_x + Wd2·attn(q2,k1,v1)).

    Args:
      t_x: [B, L, HID_T] text stream.
      v_x: [B, R, HID_V] vision stream.
      image_mask: [B, R] (1 = real region).
      p_conn: the c_layer param subtree ({biattention: {query2,key1,value1},
        biOutput: {dense2, LayerNorm2}}), cast to the compute dtype.
    """
    B, L, HT = t_x.shape
    _, R, HV = v_x.shape
    pb, po = p_conn["biattention"], p_conn["biOutput"]
    BI = pb["query2"]["kernel"].shape[1]
    D = BI // num_heads
    w = pl.BlockSpec(memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, L, HT), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, R, HV), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_co_text_kernel, H=num_heads, D=D,
                               scale=1.0 / math.sqrt(D), eps=eps)
    return pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[tspec, vspec, mspec, w, w, w, w, w, w, w, w, w, w],
        out_specs=tspec,
        out_shape=jax.ShapeDtypeStruct(t_x.shape, t_x.dtype),
        interpret=interpret,
    )(t_x, v_x, jnp.asarray(image_mask)[:, None, :],
      pb["query2"]["kernel"], pb["query2"]["bias"],
      pb["key1"]["kernel"], pb["key1"]["bias"],
      pb["value1"]["kernel"], pb["value1"]["bias"],
      po["dense2"]["kernel"], po["dense2"]["bias"],
      po["LayerNorm2"]["weight"], po["LayerNorm2"]["bias"])


# ---------------------------------------------------------------------------
# bench variants (scripts/bench_attn.py)
# ---------------------------------------------------------------------------

def _mk_v2(bb):
    def f(q, k, v, mode, ctx_end, ans_len):
        desc = jnp.stack([mode, ctx_end, ans_len], axis=-1)
        return attention_v2(q, k, v, desc, block_b=bb)
    return f


BENCH_VARIANTS = {
    "pallas_v2_bb1": _mk_v2(1),
    "pallas_v2_bb4": _mk_v2(4),
    "pallas_v2_bb8": _mk_v2(8),
}
