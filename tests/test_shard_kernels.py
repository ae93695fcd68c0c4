"""shard_map-wrapped Pallas kernels over the dp axis.

GSPMD has no SPMD partitioning rule for custom calls, so unimm.encode wraps
every Pallas kernel call in jax.shard_map over the mesh's dp axis when a mesh
is passed (unimm._shard_map_dp). These tests prove, on the virtual 8-device
CPU mesh (interpret lowering), that the wrap is semantics-preserving:

* eval forward (pallas_block, fused FFN + fused co) sharded == unsharded;
* train loss AND gradients (the differentiable fused attention block with
  its custom VJP inside shard_map) sharded == unsharded — in particular the
  weight cotangents must be psum-reduced across dp by shard_map's transpose;
* the full train step sharded over the mesh == the XLA-impl step (losses).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimm_tpu.models import unimm, vilbert
from unimm_tpu.parallel import mesh as pmesh

from tests.test_pallas_v2 import TINY, _tiny_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the virtual 8-device mesh")


def _mesh(dp=4, mp=1):
    return pmesh.make_mesh(dp * mp, mp=mp)


def test_eval_forward_sharded_matches_unsharded():
    cfg = dataclasses.replace(TINY, attention_impl="pallas_block",
                              fused_ffn=True, fused_co=True)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(np.random.default_rng(0), cfg, B=8)
    mesh = _mesh(dp=4)
    sharded = jax.jit(lambda p, b: unimm.forward_eval(
        p, cfg, b, dtype=jnp.float32, mesh=mesh))(
            *pmesh.shard_params(params, mesh)[:1], pmesh.shard_batch(
                batch, mesh))
    plain = jax.jit(lambda p, b: unimm.forward_eval(
        p, cfg, b, dtype=jnp.float32))(params, batch)
    for k in ("nsp_logits", "lm_nll_sum"):
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(plain[k]), rtol=1e-5, atol=1e-5)


def test_train_grads_sharded_match_unsharded():
    """custom-VJP fused attention inside shard_map: weight grads must be
    psum-reduced over dp — equality with the unsharded grads proves it."""
    cfg = dataclasses.replace(TINY, attention_impl="pallas_block",
                              hidden_dropout_prob=0.0,
                              attention_probs_dropout_prob=0.0,
                              v_hidden_dropout_prob=0.0,
                              v_attention_probs_dropout_prob=0.0)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(np.random.default_rng(1), cfg, B=8, train=True)
    rng = jax.random.PRNGKey(7)
    mesh = _mesh(dp=4)

    def loss(p, b, m):
        parts = unimm.forward_train(p, cfg, b, rng=rng, dtype=jnp.float32,
                                    mesh=m)
        return parts["lm"] + parts["img"] + parts["nsp"]

    sp, _ = pmesh.shard_params(params, mesh)
    sb = pmesh.shard_batch(batch, mesh)
    ls, gs = jax.jit(jax.value_and_grad(
        lambda p, b: loss(p, b, mesh)))(sp, sb)
    lp, gp = jax.jit(jax.value_and_grad(
        lambda p, b: loss(p, b, None)))(params, batch)
    np.testing.assert_allclose(float(ls), float(lp), rtol=1e-6)
    flat_s, tree_s = jax.tree_util.tree_flatten(gs)
    flat_p, tree_p = jax.tree_util.tree_flatten(gp)
    assert tree_s == tree_p
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_train_step_sharded_pallas_matches_xla():
    """Full train step over the mesh: pallas_block (shard_mapped) and xla
    produce the same losses when every stochastic site is off."""
    from unimm_tpu.train import optim, step as tstep

    base = dataclasses.replace(TINY, hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0,
                               v_hidden_dropout_prob=0.0,
                               v_attention_probs_dropout_prob=0.0)
    mesh = _mesh(dp=4, mp=2)
    batch = _tiny_batch(np.random.default_rng(2), base, B=8, train=True)
    metrics = {}
    for impl in ("xla", "pallas_block"):
        cfg = dataclasses.replace(base, attention_impl=impl)
        params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
        params, _ = pmesh.shard_params(params, mesh)
        tx = optim.make_optimizer(params, optim.OptimConfig(
            warmup_steps=10, t_total=100))
        state = tstep.init_state(params, tx, seed=0)
        step = tstep.make_train_step(cfg, tx, dtype=jnp.float32, mesh=mesh)
        _, m = step(state, pmesh.shard_batch(batch, mesh))
        metrics[impl] = {k: float(v) for k, v in m.items()}
    for k in ("loss", "lm_loss", "nsp_loss", "img_loss"):
        np.testing.assert_allclose(metrics["pallas_block"][k],
                                   metrics["xla"][k], rtol=1e-5,
                                   err_msg=k)


def test_kernel_mesh_guard():
    """Non-divisible batches fall back to GSPMD (no shard_map crash)."""
    mesh = _mesh(dp=4)
    assert unimm._kernel_mesh(mesh, 6) is None
    assert unimm._kernel_mesh(mesh, 8) is mesh
    assert unimm._kernel_mesh(None, 8) is None
    assert unimm._kernel_mesh(pmesh.make_mesh(1), 8) is None
