"""Loss-semantics tests: each JAX loss is checked against an independent
torch implementation of the reference formulas (torch runs CPU-only here and
is used purely as a numerical oracle in tests; the framework itself has no
torch dependency)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unimm_tpu.ops import losses


def test_masked_lm_ul_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    N, L, V = 4, 12, 50
    logits = rng.normal(size=(N, L, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(N, L))
    # weight classes: 0 (no loss), positive (likelihood), -1 (unlikelihood)
    w = rng.choice([0.0, 0.0, 1.0, 0.4, -1.0], size=(N, L)).astype(np.float32)
    labels = np.where(w == 0, -1, labels)   # ignored rows

    # --- torch oracle (vilbert_dialog.py:1577-1595 formulas) ---
    t_logits = torch.tensor(logits).view(-1, V)
    t_labels = torch.tensor(labels).view(-1)
    t_w = torch.tensor(w).view(-1)
    l_not = t_w > 0
    ul_not = t_w == -1
    log_l = F.log_softmax(t_logits[l_not], dim=-1)
    log_ul = torch.log(torch.clamp(1.0 - F.softmax(t_logits[ul_not], -1),
                                   min=1e-6))
    l_loss = F.nll_loss(log_l, t_labels[l_not], ignore_index=-1,
                        reduction="none") * t_w[l_not]
    ul_loss = F.nll_loss(log_ul, t_labels[ul_not], ignore_index=-1,
                         reduction="none")
    expected = (l_loss.sum() + ul_loss.sum()) / (t_w != 0).sum()

    got = losses.masked_lm_ul_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(w))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_nsp_loss_matches_weighted_ce():
    rng = np.random.default_rng(1)
    N = 16
    logits = rng.normal(size=(N, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=(N,))
    nsp_weight = np.array([5.0, 1.0], np.float32)   # num_negative_samples, 1

    w = torch.tensor(nsp_weight)
    w = w / w[0]
    expected = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                               weight=w, reduction="mean")
    got = losses.nsp_loss(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray(nsp_weight))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)

    # default weight = ones
    expected0 = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    got0 = losses.nsp_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got0), float(expected0), rtol=1e-5)


def test_masked_img_loss_matches_kldiv():
    rng = np.random.default_rng(2)
    N, R, C = 3, 8, 20
    logits = rng.normal(size=(N, R, C)).astype(np.float32)
    target = rng.dirichlet(np.ones(C), size=(N, R)).astype(np.float32)
    # zero out some target entries to exercise the 0*log0 convention
    target[0, 0, :5] = 0
    label = rng.choice([-1, 0, 1], size=(N, R))

    t_img = F.kl_div(F.log_softmax(torch.tensor(logits), dim=2),
                     torch.tensor(target), reduction="none")
    sel = (torch.tensor(label) == 1).unsqueeze(2).float()
    expected = torch.sum(t_img * sel) / max(
        torch.sum(torch.tensor(label) == 1), 1)

    got = losses.masked_img_loss(jnp.asarray(logits), jnp.asarray(target),
                                 jnp.asarray(label))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_online_softmax_xent_matches_dense():
    rng = np.random.default_rng(3)
    N, P, H, V = 2, 6, 32, 1000
    hidden = rng.normal(size=(N, P, H)).astype(np.float32)
    w = rng.normal(size=(V, H)).astype(np.float32) * 0.05
    b = rng.normal(size=(V,)).astype(np.float32) * 0.05
    labels = rng.integers(0, V, size=(N, P))
    labels[0, 0] = -1
    labels[1, -1] = -1

    dense_logits = hidden @ w.T + b
    t_nll = F.cross_entropy(torch.tensor(dense_logits).view(-1, V),
                            torch.tensor(labels).view(-1), ignore_index=-1,
                            reduction="none").view(N, P)

    got = losses.online_softmax_xent(jnp.asarray(hidden), jnp.asarray(w),
                                     jnp.asarray(b), jnp.asarray(labels),
                                     chunk=256)
    np.testing.assert_allclose(np.asarray(got), t_nll.numpy(), rtol=2e-4,
                               atol=1e-5)


def test_masked_img_loss_mse_matches_predict_feature_branch():
    """predict_feature=True branch (vilbert_dialog.py:1562-1567)."""
    rng = np.random.default_rng(5)
    N, R, C = 3, 8, 20
    logits = rng.normal(size=(N, R, C)).astype(np.float32)
    target = rng.normal(size=(N, R, C)).astype(np.float32)
    label = rng.choice([-1, 0, 1], size=(N, R))

    t_loss = torch.nn.MSELoss(reduction="none")(torch.tensor(logits),
                                                torch.tensor(target))
    sel = (torch.tensor(label) == 1).unsqueeze(2).float()
    expected = torch.sum(t_loss * sel) / max(
        torch.sum((torch.tensor(label) == 1).unsqueeze(2)
                  .expand_as(t_loss)), 1)
    got = losses.masked_img_loss_mse(jnp.asarray(logits), jnp.asarray(target),
                                     jnp.asarray(label))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)
