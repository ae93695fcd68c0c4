"""Rank-loss parity against the reference utils/rank_loss.py (imported from
/root/reference as a torch CPU oracle)."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip(
    "utils.rank_loss",
    reason="reference checkout not available")  # noqa: E402

from unimm_tpu.ops import rank_loss as jr  # noqa: E402


def make_case(rng, B=3, n=20, padded=0):
    y_pred = rng.normal(size=(B, n)).astype(np.float32)
    y_true = rng.choice([0.0, 0.2, 0.4, 0.6, 0.8, 1.0], size=(B, n)) \
        .astype(np.float32)
    y_true[0, :3] = [1.0, 0.8, 0.4]
    if padded:
        y_true[:, -padded:] = -1
    return y_pred, y_true


@pytest.mark.parametrize("padded", [0, 4])
def test_dcg(padded):
    y_pred, y_true = make_case(np.random.default_rng(0), padded=padded)
    expected = ref.dcg(torch.tensor(y_pred), torch.tensor(y_true),
                       ats=[5, 20]).numpy()
    got = np.asarray(jr.dcg(jnp.asarray(y_pred), jnp.asarray(y_true),
                            ats=[5, 20]))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("padded", [0, 4])
def test_deterministic_neural_sort_and_sinkhorn(padded):
    y_pred, y_true = make_case(np.random.default_rng(1), padded=padded)
    mask = y_true == -1
    expected = ref.deterministic_neural_sort(
        torch.tensor(y_pred).unsqueeze(-1), tau=1.0,
        mask=torch.tensor(mask)).numpy()
    got = np.asarray(jr.deterministic_neural_sort(
        jnp.asarray(y_pred)[..., None], 1.0, jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)

    e2 = ref.sinkhorn_scaling(torch.tensor(expected),
                              torch.tensor(mask)).numpy()
    g2 = np.asarray(jr.sinkhorn_scaling(jnp.asarray(got),
                                        jnp.asarray(mask)))
    np.testing.assert_allclose(g2, e2, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("padded", [0, 4])
@pytest.mark.parametrize("k", [None, 10])
def test_neural_ndcg_transposed(padded, k):
    y_pred, y_true = make_case(np.random.default_rng(2), padded=padded)
    expected = float(ref.neuralNDCG_transposed(
        torch.tensor(y_pred), torch.tensor(y_true), k=k))
    got = float(jr.neuralNDCG_transposed(jnp.asarray(y_pred),
                                         jnp.asarray(y_true), k=k))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("padded", [0, 4])
def test_neural_ndcg(padded):
    y_pred, y_true = make_case(np.random.default_rng(3), padded=padded)
    expected = float(ref.neuralNDCG(torch.tensor(y_pred),
                                    torch.tensor(y_true)))
    got = float(jr.neuralNDCG(jnp.asarray(y_pred), jnp.asarray(y_true)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_listnet():
    y_pred, y_true = make_case(np.random.default_rng(4))
    expected = float(ref.listNet(torch.tensor(y_pred), torch.tensor(y_true)))
    got = float(jr.listNet(jnp.asarray(y_pred), jnp.asarray(y_true)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_listmle_distinct_values():
    rng = np.random.default_rng(5)
    y_pred = rng.normal(size=(3, 12)).astype(np.float32)
    y_true = rng.permutation(np.arange(36, dtype=np.float32)).reshape(3, 12)
    expected = float(ref.listMLE(torch.tensor(y_pred), torch.tensor(y_true)))
    got = float(jr.listMLE(jnp.asarray(y_pred), jnp.asarray(y_true)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("wbd,wbdp", [(False, False), (True, False),
                                      (False, True)])
def test_ranknet(wbd, wbdp):
    y_pred, y_true = make_case(np.random.default_rng(6), padded=3)
    expected = float(ref.rankNet(torch.tensor(y_pred), torch.tensor(y_true),
                                 weight_by_diff=wbd,
                                 weight_by_diff_powed=wbdp))
    got = float(jr.rankNet(jnp.asarray(y_pred), jnp.asarray(y_true),
                           weight_by_diff=wbd, weight_by_diff_powed=wbdp))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_approx_ndcg():
    y_pred, y_true = make_case(np.random.default_rng(7), padded=2)
    expected = float(ref.approxNDCGLoss(torch.tensor(y_pred),
                                        torch.tensor(y_true)))
    got = float(jr.approxNDCGLoss(jnp.asarray(y_pred), jnp.asarray(y_true)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("scheme", [None, "ndcgLoss1_scheme",
                                    "ndcgLoss2_scheme", "lambdaRank_scheme",
                                    "ndcgLoss2PP_scheme", "rankNet_scheme"])
@pytest.mark.parametrize("k", [None, 8])
def test_lambda_loss_schemes(scheme, k):
    y_pred, y_true = make_case(np.random.default_rng(8))
    expected = float(ref.lambdaLoss(torch.tensor(y_pred),
                                    torch.tensor(y_true),
                                    weighing_scheme=scheme, k=k))
    got = float(jr.lambdaLoss(jnp.asarray(y_pred), jnp.asarray(y_true),
                              weighing_scheme=scheme, k=k))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_neural_ndcg_transposed_gradient_finite():
    """The dense-finetuning loss must be differentiable end-to-end (the
    NeuralSort/Sinkhorn chain is where NaNs would appear)."""
    y_pred, y_true = make_case(np.random.default_rng(9), padded=4)

    def loss_fn(p):
        return jr.neuralNDCG_transposed(p, jnp.asarray(y_true))

    g = jax.grad(loss_fn)(jnp.asarray(y_pred))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
