"""Rematerialisation: same outputs and gradients, layer keys deterministic."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_model import TINY, make_batch
from unimm_tpu.models import unimm, vilbert


def test_remat_forward_and_grad_equivalence():
    cfg_r = TINY.replace(remat=True)
    params = vilbert.init_params(jax.random.PRNGKey(0), TINY)
    batch = make_batch(np.random.default_rng(0), TINY, B=2)

    out_a = unimm.encode(params, TINY, batch)
    out_b = unimm.encode(params, cfg_r, batch)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(p, cfg):
        t, v, pt, pv = unimm.encode(p, cfg, batch)
        return jnp.sum(pt ** 2) + jnp.sum(pv ** 2)

    g_a = jax.grad(loss)(params, TINY)
    g_b = jax.grad(loss)(params, cfg_r)
    la = jax.tree_util.tree_leaves(g_a)
    lb = jax.tree_util.tree_leaves(g_b)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_remat_train_mode_deterministic():
    """Same rng -> same output with and without remat recompute (dropout keys
    are per-layer fold_ins, replayed identically in the backward pass)."""
    cfg_r = TINY.replace(remat=True)
    params = vilbert.init_params(jax.random.PRNGKey(0), TINY)
    batch = make_batch(np.random.default_rng(1), TINY, B=2)
    k = jax.random.PRNGKey(3)
    o1 = unimm.encode(params, cfg_r, batch, train=True, rng=k)
    o2 = unimm.encode(params, cfg_r, batch, train=True, rng=k)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))

    def loss(p):
        t, v, pt, pv = unimm.encode(p, cfg_r, batch, train=True, rng=k)
        return jnp.sum(pt ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
