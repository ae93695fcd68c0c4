"""Parity of the fused online-softmax label-head kernel vs the XLA scan
(ops/losses.online_softmax_xent) — fp32 agreement at ragged shapes (row and
vocab padding both exercised), -1-label masking, and bf16-input consistency.
Interpret mode on CPU; the Mosaic build runs on TPU via eval/prefix.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimm_tpu.ops import losses as L
from unimm_tpu.ops import pallas_head


def _case(rng, M, V, H, dtype):
    h = jnp.asarray(rng.normal(size=(M, H)), dtype)
    w = jnp.asarray(rng.normal(size=(V, H)) * 0.05, dtype)
    b = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    lab = rng.integers(-1, V, size=(M,)).astype(np.int32)
    lab[rng.random(M) < 0.3] = -1
    lab[0] = V - 1          # last-vocab-row label crosses the pad boundary
    lab[1] = 0
    return h, w, b, jnp.asarray(lab)


@pytest.mark.parametrize("M,V,block_m,block_v", [
    (40, 517, 16, 256),      # both axes ragged vs their blocks
    (64, 512, 32, 512),      # exact tiling, single vocab tile
    (7, 300, 256, 128),      # fewer rows than one block
])
def test_matches_xla_fp32(M, V, block_m, block_v):
    rng = np.random.default_rng(0)
    h, w, b, lab = _case(rng, M, V, 64, jnp.float32)
    ref = L.online_softmax_xent(h, w, b, lab, chunk=128)
    got = pallas_head.online_softmax_xent_tpu(
        h, w, b, lab, block_m=block_m, block_v=block_v, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    assert (np.asarray(got)[np.asarray(lab) == -1] == 0).all()


def test_leading_dims_and_bf16():
    rng = np.random.default_rng(1)
    h, w, b, lab = _case(rng, 24, 260, 64, jnp.bfloat16)
    h3 = h.reshape(2, 12, 64)
    lab3 = lab.reshape(2, 12)
    ref = L.online_softmax_xent(h3, w, b, lab3, chunk=128)
    got = pallas_head.online_softmax_xent_tpu(
        h3, w, b, lab3, block_m=16, block_v=128, interpret=True)
    assert got.shape == (2, 12)
    # bf16 inputs, fp32 accumulation both sides: tiles differ (128 vs the
    # kernel's padding) so allow small fp32 reassociation slack
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefix_scorer_uses_kernel_path():
    """The prefix scorer's label head routes through the kernel under
    attention_impl='pallas_block' and the scores match the XLA head."""
    from __graft_entry__ import dryrun_config
    from unimm_tpu.eval.prefix import PrefixScorer
    from unimm_tpu.models import vilbert
    from scripts.bench_workload import make_val_batch

    cfg = dryrun_config()
    rng = np.random.default_rng(2)
    batch = make_val_batch(rng, cfg, B=1, R=2, O=4, ctx_range=(8, 16),
                           ans_range=(2, 4), feat_dim=cfg.v_feature_size)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)

    sk = PrefixScorer(cfg.replace(attention_impl="pallas_block"),
                      dtype=jnp.float32, group=2)
    sx = PrefixScorer(cfg.replace(attention_impl="xla"),
                      dtype=jnp.float32, group=2)
    (scores_k, ok_k) = sk.score(params, batch)
    (scores_x, ok_x) = sx.score(params, batch)
    assert ok_k.all() and ok_x.all()
    for key in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(scores_k[key], scores_x[key],
                                   rtol=1e-5, atol=1e-5)
