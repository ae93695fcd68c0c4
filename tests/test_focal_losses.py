"""Focal/GHM loss parity against the reference utils/losses.py (torch oracle)."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip(
    "utils.losses",
    reason="reference checkout not available")  # noqa: E402

from unimm_tpu.ops import focal_losses as fl  # noqa: E402


def test_binary_focal():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 5)).astype(np.float32)
    t = rng.integers(0, 2, size=(8, 5)).astype(np.float32)
    expected = float(ref.binary_ce_focal_loss(torch.tensor(x),
                                              torch.tensor(t)))
    got = float(fl.binary_ce_focal_loss(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_multi_focal():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    t = rng.integers(0, 4, size=(16,))
    expected = float(ref.multi_ce_focal_loss(torch.tensor(x),
                                             torch.tensor(t), class_num=4))
    got = float(fl.multi_ce_focal_loss(jnp.asarray(x), jnp.asarray(t),
                                       class_num=4))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_ghmc():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(6, 10)).astype(np.float32)
    t = rng.integers(0, 2, size=(6, 10)).astype(np.float32)
    e_loss, e_bins = ref.ghmc_loss(torch.tensor(x), torch.tensor(t), bins=10,
                                   alpha=0.75)
    g_loss, g_bins = fl.ghmc_loss(jnp.asarray(x), jnp.asarray(t), bins=10,
                                  alpha=0.75)
    np.testing.assert_allclose(float(g_loss), float(e_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_bins), e_bins.numpy(), rtol=1e-5)
    # EMA continuation
    x2 = rng.normal(size=(6, 10)).astype(np.float32)
    e2, _ = ref.ghmc_loss(torch.tensor(x2), torch.tensor(t), bins=10,
                          alpha=0.75, last_bin_count=e_bins)
    g2, _ = fl.ghmc_loss(jnp.asarray(x2), jnp.asarray(t), bins=10,
                         alpha=0.75, last_bin_count=g_bins)
    np.testing.assert_allclose(float(g2), float(e2), rtol=1e-4)


def test_ghmr():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, 10)).astype(np.float32)
    t = rng.normal(size=(6, 10)).astype(np.float32)
    loss_mod = ref.GHMR_Loss(bins=10, alpha=0.75, mu=0.02)
    expected = float(loss_mod(torch.tensor(x), torch.tensor(t)))
    got, _ = fl.ghmr_loss(jnp.asarray(x), jnp.asarray(t), mu=0.02, bins=10,
                          alpha=0.75)
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_dense_logging_values():
    """qfocal / ce logging values match the dense script's torch formulas
    (dense_annotation_finetuning.py:275-280)."""
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    B, O = 2, 20
    nsp_scores = rng.normal(size=(B, O, 2)).astype(np.float32)
    rel = rng.random((B, O)).astype(np.float32)

    t_scores = torch.tensor(nsp_scores)
    t_rel = torch.tensor(rel)
    nsp_probs = F.softmax(t_scores, dim=-1)
    ce = torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(nsp_probs[:, :, 0], dim=1), F.softmax(t_rel, dim=1))
    nsp_log_probs = F.log_softmax(t_scores, dim=-1)
    qf = -((torch.abs(t_rel - nsp_probs[:, :, 0]) ** 2.0)
           * ((t_rel * nsp_log_probs[:, :, 0])
              + ((1 - t_rel) * nsp_log_probs[:, :, 1]))).mean()

    got_ce = float(fl.dense_ce_log(jnp.asarray(nsp_scores), jnp.asarray(rel)))
    got_qf = float(fl.dense_qfocal_log(jnp.asarray(nsp_scores),
                                       jnp.asarray(rel)))
    np.testing.assert_allclose(got_ce, float(ce), rtol=1e-4)
    np.testing.assert_allclose(got_qf, float(qf), rtol=1e-5)
