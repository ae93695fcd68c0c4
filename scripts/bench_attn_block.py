"""A/B the whole BertAttention sub-block: XLA chain vs fused Pallas kernel.

Times LayerNorm(x + Wo·attn(x)) at the flagship eval shape [B=512, L=256,
HID=768] bf16. Same timing protocol as scripts/bench_attn.py (feedback scan,
distinct input sets, host-fetch close).

Usage: python scripts/bench_attn_block.py [xla_block fused_block ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from unimm_tpu.models import vilbert
from unimm_tpu.ops import masks
from unimm_tpu.ops import pallas_attention_v2 as v2

B, H, L, D = 512, 12, 256, 64
HID = H * D
ITERS = 20
DTYPE = jnp.bfloat16


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, HID)), DTYPE)
    mode = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
    ctx_end = jnp.asarray(rng.integers(60, 200, (B,)), jnp.int32)
    ans_len = jnp.asarray(rng.integers(2, 9, (B,)), jnp.int32)
    return x, mode, ctx_end, ans_len


def xla_block(p, x, mode, ctx_end, ans_len):
    bias = masks.text_self_bias(mode, ctx_end, ans_len, L, jnp.float32)
    return vilbert.self_attention_block(
        p, x, bias, num_heads=H, attn_drop=0.0, hidden_drop=0.0,
        train=False, rng=None)


def fused_block(p, x, mode, ctx_end, ans_len):
    desc = jnp.stack([mode, ctx_end, ans_len], axis=-1)
    return v2.fused_attention_block(x, desc, p, num_heads=H)


def xla_ffn(p, x, mode, ctx_end, ans_len):
    return vilbert.ffn_block(p["inter"], p["out"], x, act="gelu",
                             hidden_drop=0.0, train=False, rng=None)


def fused_ffn(p, x, mode, ctx_end, ans_len):
    return v2.fused_ffn_block(x, p["inter"], p["out"], act="gelu")


def fused_block_bb2(p, x, mode, ctx_end, ans_len):
    desc = jnp.stack([mode, ctx_end, ans_len], axis=-1)
    return v2.fused_attention_block(x, desc, p, num_heads=H, block_b=2)


def fused_ffn_bb2(p, x, mode, ctx_end, ans_len):
    return v2.fused_ffn_block(x, p["inter"], p["out"], act="gelu", block_b=2)


# --- probe kernels (attribution only; NOT semantically correct) -----------
import functools
import math

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from unimm_tpu.ops.pallas_attention import _mask_bias


def _probe_kernel(desc_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                  wv_ref, bv_ref, wo_ref, bo_ref, g_ref, beta_ref, o_ref,
                  *, Hn, Dn, scale, softmax_mode):
    b = pl.program_id(0)
    Ln = x_ref.shape[-2]
    x = x_ref[0]
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(dt)

    q = (proj(wq_ref, bq_ref).astype(jnp.float32) * scale).astype(dt)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2], Ln)
    ctx = []
    for h in range(Hn):
        qh = jax.lax.slice(q, (0, h * Dn), (Ln, (h + 1) * Dn))
        kh = jax.lax.slice(k, (0, h * Dn), (Ln, (h + 1) * Dn))
        vh = jax.lax.slice(v, (0, h * Dn), (Ln, (h + 1) * Dn))
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if softmax_mode == "none":            # matmuls-only floor
            p = (s + bias) * 1e-4
        elif softmax_mode == "skip":
            p = None
        elif softmax_mode == "noshift":       # exp without row-max pass
            e = jnp.exp(s + bias - 20.0)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        else:
            p = jax.nn.softmax(s + bias, axis=-1)
        ctx.append(vh if p is None else jax.lax.dot_general(
            p.astype(dt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx, axis=-1)
    out = jax.lax.dot_general(ctx, wo_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    h32 = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + 1e-12)
    y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _mk_probe(softmax_mode):
    def f(p, x, mode, ctx_end, ans_len):
        desc = jnp.stack([mode, ctx_end, ans_len], axis=-1)
        ps, po = p["self"], p["output"]
        w = pl.BlockSpec(memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, L, HID), lambda b, d: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B,),
            in_specs=[xspec, w, w, w, w, w, w, w, w, w, w],
            out_specs=xspec)
        kern = functools.partial(_probe_kernel, Hn=H, Dn=D,
                                 scale=1.0 / math.sqrt(D),
                                 softmax_mode=softmax_mode)
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(desc, x,
          ps["query"]["kernel"], ps["query"]["bias"],
          ps["key"]["kernel"], ps["key"]["bias"],
          ps["value"]["kernel"], ps["value"]["bias"],
          po["dense"]["kernel"], po["dense"]["bias"],
          po["LayerNorm"]["weight"], po["LayerNorm"]["bias"])
    return f


# --- layout-experiment probes (round 3: attack the ~1.4 ms lane-relayout
# overhead of odd-64 per-head slices; ROADMAP "in-kernel attribution") -----

def _probe_transposed_kernel(desc_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                             wv_ref, bv_ref, wo_ref, bo_ref, g_ref, beta_ref,
                             o_ref, *, Hn, Dn, scale):
    """Projections computed TRANSPOSED (qT/kT/vT [HID, L]) so per-head
    slices are sublane (row) slices at 64-row boundaries — aligned — and
    the ctx concat disappears into per-head Wo row-slice accumulation."""
    b = pl.program_id(0)
    Ln = x_ref.shape[-2]
    x = x_ref[0]
    dt = x.dtype
    xT = x.T                                        # one relayout per seq

    def projT(w_ref, b_ref):
        y = jax.lax.dot_general(w_ref[:], xT, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # minor-dim insertion must happen on a 32-bit type (Mosaic limit)
        return (y + b_ref[:].astype(jnp.float32)[:, None]).astype(dt)

    qT = projT(wq_ref, bq_ref)
    qT = (qT.astype(jnp.float32) * scale).astype(dt)
    kT = projT(wk_ref, bk_ref)
    vT = projT(wv_ref, bv_ref)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2], Ln)

    out = None
    for h in range(Hn):
        qh_T = jax.lax.slice(qT, (h * Dn, 0), ((h + 1) * Dn, Ln))
        kh_T = jax.lax.slice(kT, (h * Dn, 0), ((h + 1) * Dn, Ln))
        vh_T = jax.lax.slice(vT, (h * Dn, 0), ((h + 1) * Dn, Ln))
        s = jax.lax.dot_general(qh_T, kh_T, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + bias, axis=-1)
        ctx_h = jax.lax.dot_general(                 # [L, D]
            p.astype(dt), vh_T, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        wo_h = jax.lax.slice(wo_ref[:], (h * Dn, 0),
                             ((h + 1) * Dn, wo_ref.shape[1]))
        acc = jax.lax.dot_general(ctx_h, wo_h, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = acc if out is None else out + acc

    h32 = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + 1e-12)
    y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _probe_wo_acc_kernel(desc_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                         wv_ref, bv_ref, wo_ref, bo_ref, g_ref, beta_ref,
                         o_ref, *, Hn, Dn, scale):
    """Current column-slice layout, but the ctx concat is replaced by
    per-head Wo row-slice accumulation (isolates the concat's cost)."""
    b = pl.program_id(0)
    Ln = x_ref.shape[-2]
    x = x_ref[0]
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(dt)

    q = (proj(wq_ref, bq_ref).astype(jnp.float32) * scale).astype(dt)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2], Ln)
    out = None
    for h in range(Hn):
        qh = jax.lax.slice(q, (0, h * Dn), (Ln, (h + 1) * Dn))
        kh = jax.lax.slice(k, (0, h * Dn), (Ln, (h + 1) * Dn))
        vh = jax.lax.slice(v, (0, h * Dn), (Ln, (h + 1) * Dn))
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + bias, axis=-1)
        ctx_h = jax.lax.dot_general(
            p.astype(dt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        wo_h = jax.lax.slice(wo_ref[:], (h * Dn, 0),
                             ((h + 1) * Dn, wo_ref.shape[1]))
        acc = jax.lax.dot_general(ctx_h, wo_h, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = acc if out is None else out + acc
    h32 = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + 1e-12)
    y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _probe_pad128_kernel(desc_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                         wv_ref, bv_ref, wo_ref, bo_ref, g_ref, beta_ref,
                         o_ref, *, Hn, scale):
    """Heads zero-padded to D'=128 (weights pre-padded outside): every
    per-head slice lands on a 128-lane boundary; projections/Wo do 2x the
    matmul work, QK/PV run at 100% MXU util instead of 50%."""
    b = pl.program_id(0)
    Ln = x_ref.shape[-2]
    Dp = 128
    x = x_ref[0]
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(dt)

    q = (proj(wq_ref, bq_ref).astype(jnp.float32) * scale).astype(dt)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    bias = _mask_bias(desc_ref[b, 0], desc_ref[b, 1], desc_ref[b, 2], Ln)
    ctx = []
    for h in range(Hn):
        qh = jax.lax.slice(q, (0, h * Dp), (Ln, (h + 1) * Dp))
        kh = jax.lax.slice(k, (0, h * Dp), (Ln, (h + 1) * Dp))
        vh = jax.lax.slice(v, (0, h * Dp), (Ln, (h + 1) * Dp))
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + bias, axis=-1)
        ctx.append(jax.lax.dot_general(
            p.astype(dt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx, axis=-1)              # [L, H*128]
    out = jax.lax.dot_general(ctx, wo_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    h32 = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + 1e-12)
    y = y * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _mk_layout_probe(which):
    def f(p, x, mode, ctx_end, ans_len):
        desc = jnp.stack([mode, ctx_end, ans_len], axis=-1)
        ps, po = p["self"], p["output"]
        w = pl.BlockSpec(memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, L, HID), lambda b, d: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B,),
            in_specs=[xspec, w, w, w, w, w, w, w, w, w, w],
            out_specs=xspec)
        wq, bq = ps["query"]["kernel"], ps["query"]["bias"]
        wk, bk = ps["key"]["kernel"], ps["key"]["bias"]
        wv, bv = ps["value"]["kernel"], ps["value"]["bias"]
        wo, bo = po["dense"]["kernel"], po["dense"]["bias"]
        if which == "transposed":
            kern = functools.partial(_probe_transposed_kernel, Hn=H, Dn=D,
                                     scale=1.0 / math.sqrt(D))
        elif which == "wo_acc":
            kern = functools.partial(_probe_wo_acc_kernel, Hn=H, Dn=D,
                                     scale=1.0 / math.sqrt(D))
        else:                                        # pad128
            def pad_cols(wm, bm):
                w3 = wm.reshape(HID, H, D)
                w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, 128 - D)))
                return w3.reshape(HID, H * 128), jnp.pad(
                    bm.reshape(H, D), ((0, 0), (0, 128 - D))).reshape(-1)
            wq, bq = pad_cols(wq, bq)
            wk, bk = pad_cols(wk, bk)
            wv, bv = pad_cols(wv, bv)
            wo = jnp.pad(wo.reshape(H, D, HID),
                         ((0, 0), (0, 128 - D), (0, 0))).reshape(H * 128, HID)
            kern = functools.partial(_probe_pad128_kernel, Hn=H,
                                     scale=1.0 / math.sqrt(D))
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(desc, x, wq, bq, wk, bk, wv, bv, wo, bo,
          po["LayerNorm"]["weight"], po["LayerNorm"]["bias"])
    return f


VARIANTS = {"xla_block": xla_block, "fused_block": fused_block,
            "xla_ffn": xla_ffn, "fused_ffn": fused_ffn,
            "fused_block_bb2": fused_block_bb2, "fused_ffn_bb2": fused_ffn_bb2,
            "probe_nosoftmax": _mk_probe("none"),
            "probe_projonly": _mk_probe("skip"),
            "probe_noshift": _mk_probe("noshift"),
            "probe_softmax": _mk_probe("full"),
            "probe_transposed": _mk_layout_probe("transposed"),
            "probe_wo_acc": _mk_layout_probe("wo_acc"),
            "probe_pad128": _mk_layout_probe("pad128")}


def bench(name, fn, p):
    @jax.jit
    def run(x, mode, ctx_end, ans_len):
        def body(carry, _):
            return fn(p, carry, mode, ctx_end, ans_len).astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    sets = [make_inputs(s) for s in range(3)]
    for s in sets:
        float(np.asarray(run(*s)))
    times = []
    for rep in range(6):
        s = sets[rep % 3]
        t0 = time.perf_counter()
        float(np.asarray(run(*s)))
        times.append((time.perf_counter() - t0) / ITERS)
    med = sorted(times)[len(times) // 2]
    print(f"{name:24s} {med*1e3:8.3f} ms/call   "
          f"({min(times)*1e3:.3f} min, {max(times)*1e3:.3f} max)")
    return med


def main():
    key = jax.random.PRNGKey(0)
    p = vilbert._init_attention(key, HID, 0.02)
    p["inter"] = {"dense": vilbert._init_linear(key, HID, 4 * HID, 0.02)}
    p["out"] = {"dense": vilbert._init_linear(
        jax.random.fold_in(key, 1), 4 * HID, HID, 0.02),
        "LayerNorm": vilbert._init_ln(HID)}
    p = vilbert.cast_floating(p, DTYPE)
    names = sys.argv[1:] or list(VARIANTS)
    print(f"backend={jax.devices()[0].platform} shape=[{B},{L},{HID}] "
          f"iters={ITERS}")
    for n in names:
        bench(n, VARIANTS[n], p)


if __name__ == "__main__":
    main()
