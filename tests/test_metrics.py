"""Metric tests against independent torch/numpy oracles implementing the
reference definitions (utils/visdial_metrics.py)."""

import numpy as np
import torch

import jax.numpy as jnp

from unimm_tpu.ops import metrics


def torch_scores_to_ranks(scores: torch.Tensor):
    """Literal oracle of utils/visdial_metrics.py:21-39."""
    batch_size, num_rounds, num_options = scores.size()
    scores = scores.view(-1, num_options)
    _, ranked_idx = scores.sort(1, descending=True)
    ranks = ranked_idx.clone().fill_(0)
    for i in range(ranked_idx.size(0)):
        for j in range(num_options):
            ranks[i][ranked_idx[i][j]] = j
    ranks += 1
    return ranks.view(batch_size, num_rounds, num_options)


def test_scores_to_ranks():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(3, 4, 10)).astype(np.float32)
    expected = torch_scores_to_ranks(torch.tensor(scores)).numpy()
    got = np.asarray(metrics.scores_to_ranks(jnp.asarray(scores)))
    np.testing.assert_array_equal(got, expected)


def test_sparse_metrics():
    rng = np.random.default_rng(1)
    B, R, O = 4, 10, 100
    scores = rng.normal(size=(B, R, O)).astype(np.float32)
    gt = rng.integers(0, O, size=(B, R))

    m = metrics.SparseGTMetrics()
    m.observe(scores, gt)
    got = m.retrieve()

    ranks = torch_scores_to_ranks(torch.tensor(scores)).numpy()
    gt_rank = np.take_along_axis(ranks, gt[..., None], axis=-1)[..., 0]
    flat = gt_rank.reshape(-1).astype(float)
    np.testing.assert_allclose(got["r@5"], np.mean(flat <= 5))
    np.testing.assert_allclose(got["mean"], np.mean(flat))
    np.testing.assert_allclose(got["mrr"], np.mean(1.0 / flat))
    np.testing.assert_allclose(got["mean_round_3"],
                               np.mean(gt_rank[:, 2].astype(float)))

    # zero-row observations (fully-masked loader tail padding) are no-ops
    # for both accumulators — the data-sharded eval feeds them
    m2 = metrics.SparseGTMetrics()
    m2.observe(scores, gt)
    m2.observe(scores[:0], gt[:0])
    assert m2.retrieve() == got
    nd = metrics.NDCG()
    nd.observe(scores[:, 0], rng.random((B, O)).astype(np.float32))
    before = nd.retrieve(reset=False)
    nd.observe(scores[:0, 0], np.zeros((0, O), np.float32))
    assert nd.retrieve() == before


def torch_ndcg(scores: torch.Tensor, relevance: torch.Tensor):
    """Literal oracle of utils/visdial_metrics.py:122-177."""
    predicted_ranks = torch_scores_to_ranks(scores.unsqueeze(1)).squeeze(1)
    batch_size, num_options = predicted_ranks.size()
    k = torch.sum(relevance != 0, dim=-1)
    _, rankings = torch.sort(predicted_ranks, dim=-1)
    _, best_rankings = torch.sort(relevance, dim=-1, descending=True)
    out = []
    for bi in range(batch_size):
        nr = k[bi]

        def dcg(rankings_row):
            sorted_rel = relevance[bi][rankings_row].float()
            discounts = torch.log2(torch.arange(len(rankings_row)).float() + 2)
            return torch.sum(sorted_rel / discounts)

        out.append(float(dcg(rankings[bi][:nr]) / dcg(best_rankings[bi][:nr])))
    return np.array(out)


def test_ndcg():
    rng = np.random.default_rng(2)
    B, O = 5, 100
    scores = rng.normal(size=(B, O)).astype(np.float32)
    rel = (rng.random((B, O)) < 0.1).astype(np.float32) * rng.random((B, O))
    rel[0, :3] = 1.0  # guarantee nonzero relevance everywhere
    rel[:, 0] = np.maximum(rel[:, 0], 0.5)

    expected = torch_ndcg(torch.tensor(scores), torch.tensor(rel))
    got = np.asarray(metrics.ndcg_batch(jnp.asarray(scores), jnp.asarray(rel)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    acc = metrics.NDCG()
    acc.observe(scores, rel)
    np.testing.assert_allclose(acc.retrieve()["ndcg"], expected.mean(),
                               rtol=1e-4, atol=1e-5)
