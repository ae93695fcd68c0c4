"""Isolated A/B benchmark of text self-attention variants on the real TPU.

Measures the attention core (and optionally the whole attention block) at the
flagship eval shape [B=512, H=12, L=256, D=64] bf16, which is where the XLA
path materialises [B,H,L,L] softmax traffic in HBM (~24 ms per 512-seq batch
across the 12 text layers, ROADMAP).

Timing protocol (CLAUDE.md): per-dispatch tunnel overhead is ~30 ms and
byte-identical dispatches can return memoised, so each measurement runs ITERS
iterations inside ONE jitted lax.scan whose carry feeds the previous output
back in as the next query (defeats loop-invariant hoisting/CSE), over 3
distinct input sets, closed with a host fetch.

Usage: python scripts/bench_attn.py [variant ...]
Variants: xla pallas_v1 <any registered v2 name>
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from unimm_tpu.ops import masks
from unimm_tpu.ops import pallas_attention as pattn

B, H, L, D = 512, 12, 256, 64
ITERS = 20


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, L, D)).astype(np.float32)
    k = rng.normal(size=(B, H, L, D)).astype(np.float32)
    v = rng.normal(size=(B, H, L, D)).astype(np.float32)
    mode = rng.integers(0, 2, (B,)).astype(np.int32)
    ctx_end = rng.integers(60, 200, (B,)).astype(np.int32)
    ans_len = rng.integers(2, 9, (B,)).astype(np.int32)
    return (jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), jnp.asarray(mode),
            jnp.asarray(ctx_end), jnp.asarray(ans_len))


def xla_attn(q, k, v, mode, ctx_end, ans_len):
    bias = masks.text_self_bias(mode, ctx_end, ans_len, L, jnp.float32)
    scale = 1.0 / math.sqrt(D)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def pallas_v1(q, k, v, mode, ctx_end, ans_len):
    desc = jnp.stack([mode, ctx_end, ans_len], axis=-1)
    return pattn.fused_text_attention(q, k, v, desc, False)


VARIANTS = {"xla": xla_attn, "pallas_v1": pallas_v1}

# optional v2 kernels — registered if present
try:
    from unimm_tpu.ops import pallas_attention_v2 as pattn2
    for name, fn in pattn2.BENCH_VARIANTS.items():
        VARIANTS[name] = fn
except ImportError:
    pass


def bench(name, fn):
    @jax.jit
    def run(q, k, v, mode, ctx_end, ans_len):
        def body(carry, _):
            o = fn(carry, k, v, mode, ctx_end, ans_len)
            return o.astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    sets = [make_inputs(s) for s in range(3)]
    for s in sets:
        float(np.asarray(run(*s)))  # compile + warm
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
    names = sys.argv[1:] or list(VARIANTS)
    print(f"backend={jax.devices()[0].platform} shape=[{B},{H},{L},{D}] "
          f"iters={ITERS}")
    for n in names:
        bench(n, VARIANTS[n])


if __name__ == "__main__":
    main()
