"""Fused-AdamW design probes (and the flat-vector dead-end reproducer).

Stages, each jitted separately at the full flagship param count (~250M):

  flat1d   — DEAD END reproducer: concatenate all params into one fp32
             vector and run AdamW math on it. The axon AOT compiler
             assigns any materialised ~250M-element f32 value a canonical
             f32[N/2, 2]{T(8,128)} layout whose 2-wide lane dim pads to
             128 — 64x the memory, instant HBM OOM ("Allocation
             (size=63954747392) would exceed memory"). Reshaping the
             vector to [N/1024, 1024] (2-D state, 2-D kernel operands)
             fails identically on the reshape itself; so did 1-D Mosaic
             kernel operands. Measured 2026-08-20 in all three variants.
  kernel   — the SHIPPED design: per-leaf fused kernel update
             (optim.make_fused_optimizer); compile + one step.

Usage: python scripts/probe_fused_optim.py [flat1d|kernel ...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from unimm_tpu.config import VilbertConfig  # noqa: E402
from unimm_tpu.models import vilbert  # noqa: E402
from unimm_tpu.train import optim as O  # noqa: E402


def main():
    stages = sys.argv[1:] or ["kernel"]
    cfg = VilbertConfig()
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    n_param = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print("params:", n_param, flush=True)
    grads = params  # same shapes; values don't matter for a probe

    if "flat1d" in stages:
        def flat_update(g, mu, nu):
            leaves = [x.reshape(-1).astype(jnp.float32)
                      for x in jax.tree_util.tree_leaves(g)]
            gf = jnp.concatenate(leaves)
            mu2 = 0.9 * mu + 0.1 * gf
            nu2 = 0.999 * nu + 0.001 * gf * gf
            u = mu2 / (jnp.sqrt(nu2) + 1e-6)
            return u, mu2, nu2
        z = jnp.zeros(n_param, jnp.float32)
        fn = jax.jit(flat_update, donate_argnums=(1, 2))
        t0 = time.perf_counter()
        try:
            out = fn(grads, z, jnp.zeros(n_param, jnp.float32))
            # host fetch, not block_until_ready (no-op through the relay)
            float(np.asarray(out[0][:8]).sum())
            print("flat1d compile+run:",
                  round(time.perf_counter() - t0, 2), "s (pathology gone?)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — the probe documents it
            print("flat1d failed as documented:",
                  str(e).split("\n")[0][:200], flush=True)

    if "kernel" in stages:
        ocfg = O.OptimConfig(warmup_steps=10, t_total=1000)
        tx = O.make_fused_optimizer(params, ocfg)
        state = tx.init(params)
        fn = jax.jit(tx.update, donate_argnums=(1,))
        t0 = time.perf_counter()
        upd, state2 = fn(grads, state, params)
        s = float(np.asarray(
            jax.tree_util.tree_leaves(upd)[0]).sum())  # host fetch
        print("kernel compile+run:", round(time.perf_counter() - t0, 2),
              "s (first-update sum[0]:", s, ")", flush=True)


if __name__ == "__main__":
    main()
