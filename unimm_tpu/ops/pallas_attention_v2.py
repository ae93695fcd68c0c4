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

Both kernels regenerate the text mask from (mode, ctx_end, ans_len) exactly
as ops/masks.text_attention_mask (golden-tested). Eval path only — training
with attention dropout uses the XLA path (models/unimm.py gating).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unimm_tpu.ops.pallas_attention import _mask_bias

NEG = -10000.0


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
