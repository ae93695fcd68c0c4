"""Tests for the encoder's optional modes (fixed-layer freezing,
in_batch_pairs, fast_mode) and the multi-task VL heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import TINY, make_batch
from unimm_tpu.models import unimm, vilbert, vl_tasks


def test_fixed_layer_freezing_blocks_gradients():
    cfg = TINY.replace(fixed_t_layer=1, fixed_v_layer=1)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(np.random.default_rng(0), TINY, B=2)

    def loss(p, c):
        t, v, pt, pv = unimm.encode(p, c, batch)
        return jnp.sum(pt ** 2) + jnp.sum(pv ** 2)

    g_frozen = jax.grad(loss)(params, cfg)
    g_free = jax.grad(loss)(params, TINY)

    # frozen prefix layers get zero grads
    t0 = g_frozen["bert"]["encoder"]["layer"]["0"]
    assert all(float(jnp.abs(x).sum()) == 0
               for x in jax.tree_util.tree_leaves(t0))
    v0 = g_frozen["bert"]["encoder"]["v_layer"]["0"]
    assert all(float(jnp.abs(x).sum()) == 0
               for x in jax.tree_util.tree_leaves(v0))
    # embeddings get no grad through the frozen path either
    emb = g_frozen["bert"]["embeddings"]["word_embeddings"]
    assert float(jnp.abs(emb).sum()) == 0
    # unfrozen layers still learn
    t1 = g_frozen["bert"]["encoder"]["layer"]["1"]
    assert any(float(jnp.abs(x).sum()) > 0
               for x in jax.tree_util.tree_leaves(t1))
    # and without freezing, layer 0 does get grads
    t0_free = g_free["bert"]["encoder"]["layer"]["0"]
    assert any(float(jnp.abs(x).sum()) > 0
               for x in jax.tree_util.tree_leaves(t0_free))


def test_in_batch_pairs_expansion():
    cfg = TINY.replace(in_batch_pairs=True)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    B = 3
    batch = make_batch(np.random.default_rng(1), TINY, B=B)
    t, v, pt, pv = unimm.encode(params, cfg, batch)
    assert t.shape[0] == B * B and v.shape[0] == B * B
    # diagonal pairs (text i with image i) must equal the unexpanded forward
    t0, v0, pt0, pv0 = unimm.encode(params, TINY, batch)
    diag = np.arange(B) * B + np.arange(B)
    np.testing.assert_allclose(np.asarray(t)[diag], np.asarray(t0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv)[diag], np.asarray(pv0),
                               atol=1e-5)


def test_fast_mode_broadcast():
    cfg = TINY.replace(fast_mode=True)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    B = 3
    batch = make_batch(np.random.default_rng(2), TINY, B=B)
    # one text sequence, B images
    single = {k: (v[:1] if k in ("tokens", "segments", "mode", "ctx_end",
                                 "ans_len") else v)
              for k, v in batch.items()}
    t, v, pt, pv = unimm.encode(params, cfg, single)
    assert t.shape[0] == B and v.shape[0] == B


def test_vl_tasks_heads():
    cfg = TINY
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    params = dict(params, task_heads=vl_tasks.init_task_heads(
        jax.random.PRNGKey(1), cfg, num_labels=7))
    batch = make_batch(np.random.default_rng(3), cfg, B=2)
    out = vl_tasks.vl_tasks_forward(params, cfg, batch)
    (vil_pred, vil_logit, nsp, img_pred, vision_logit, mlm, ling) = out
    assert vil_pred.shape == (2, 7)
    assert vil_logit.shape == (2, 1)
    assert nsp.shape == (2, 2)
    assert vision_logit.shape == (2, cfg.max_regions, 1)
    assert ling.shape == (2, cfg.max_seq_len, 1)
    # padded region (image_mask 0) gets the -10000 bias
    assert float(vision_logit[0, -1, 0]) < -5000
    assert np.isfinite(np.asarray(vil_pred)).all()
