"""Fused-attention kernel tests (Pallas interpret mode on CPU): equality with
the XLA bias path, gradients, and end-to-end model equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimm_tpu.ops import masks
from unimm_tpu.ops.pallas_attention import fused_text_attention


def xla_reference(q, k, v, desc, L):
    bias = masks.text_self_bias(desc[:, 0], desc[:, 1], desc[:, 2], L)
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def make_inputs(rng, B=4, H=2, L=32, D=16):
    q = rng.normal(size=(B, H, L, D)).astype(np.float32)
    k = rng.normal(size=(B, H, L, D)).astype(np.float32)
    v = rng.normal(size=(B, H, L, D)).astype(np.float32)
    desc = np.stack([
        np.array([0, 1, 1, 0]),            # modes
        np.array([20, 15, 30, 8]),         # ctx_end (seq 2 truncated: 30+6>32)
        np.array([0, 4, 6, 0]),            # ans_len
    ], axis=-1).astype(np.int32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(desc)


def test_forward_matches_xla():
    q, k, v, desc = make_inputs(np.random.default_rng(0))
    out = fused_text_attention(q, k, v, desc, True)
    ref = xla_reference(q, k, v, desc, q.shape[-2])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_backward_matches_xla():
    q, k, v, desc = make_inputs(np.random.default_rng(1))

    def loss_pallas(q, k, v):
        return jnp.sum(fused_text_attention(q, k, v, desc, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_reference(q, k, v, desc, q.shape[-2]) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5, err_msg=name)


def test_end_to_end_model_equivalence():
    """attention_impl='pallas' must produce the same encoder outputs as the
    XLA bias path (fp32, eval mode)."""
    from tests.test_model import TINY, make_batch
    from unimm_tpu.models import unimm, vilbert

    params = vilbert.init_params(jax.random.PRNGKey(0), TINY)
    batch = make_batch(np.random.default_rng(2), TINY)
    cfg_x = TINY.replace(attention_impl="xla")
    cfg_p = TINY.replace(attention_impl="pallas")
    out_x = unimm.encode(params, cfg_x, batch)
    out_p = unimm.encode(params, cfg_p, batch)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)


def test_train_with_dropout_falls_back():
    """With attention dropout active in train mode the pallas flag must not
    change training behaviour (falls back to XLA path with dropout)."""
    from tests.test_model import TINY, make_batch
    from unimm_tpu.models import unimm, vilbert

    params = vilbert.init_params(jax.random.PRNGKey(0), TINY)
    batch = make_batch(np.random.default_rng(3), TINY)
    cfg_p = TINY.replace(attention_impl="pallas")
    k = jax.random.PRNGKey(7)
    out_p = unimm.encode(params, cfg_p, batch, train=True, rng=k)
    out_x = unimm.encode(params, TINY, batch, train=True, rng=k)
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(out_x[0]),
                               atol=1e-6)
