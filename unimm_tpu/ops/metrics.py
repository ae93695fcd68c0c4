"""On-device retrieval metrics: ranks, R@k / MRR / mean-rank, and NDCG.

Vectorised replacements for the reference metric objects
(/root/reference/utils/visdial_metrics.py): ``scores_to_ranks`` there loops in
Python over the batch (:33-35) and NDCG loops per example (:159-169); here
everything is a fixed-shape jnp computation that runs inside jit on TPU.
Accumulator classes mirror the observe/retrieve API so entry points read the
same way as the reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def scores_to_ranks(scores):
    """[..., num_options] scores -> 1-based ranks (1 = best).

    Matches utils/visdial_metrics.py:21-39: rank of option o = position of o
    in descending score order + 1.
    """
    order = jnp.argsort(-scores, axis=-1)           # stable, like torch.sort
    ranks = jnp.argsort(order, axis=-1) + 1
    return ranks


def gt_ranks(scores, gt_inds):
    """Rank of the ground-truth option. scores [..., O], gt_inds [...]."""
    ranks = scores_to_ranks(scores)
    return jnp.take_along_axis(ranks, gt_inds[..., None], axis=-1)[..., 0]


def sparse_metrics_from_ranks(ranks):
    """ranks: flat int array of GT ranks -> dict of scalar metrics."""
    r = ranks.astype(jnp.float32)
    return {
        "r@1": jnp.mean((r <= 1).astype(jnp.float32)),
        "r@5": jnp.mean((r <= 5).astype(jnp.float32)),
        "r@10": jnp.mean((r <= 10).astype(jnp.float32)),
        "mean": jnp.mean(r),
        "mrr": jnp.mean(1.0 / r),
    }


def ndcg_batch(scores, relevance):
    """Per-example NDCG as in utils/visdial_metrics.py:117-177.

    k = number of options with nonzero relevance; DCG over the top-k options
    in predicted-rank order with log2(i+2) discounts, normalised by the ideal
    DCG. scores/relevance: [B, O]. Returns [B] float32.
    """
    O = scores.shape[-1]
    ranks = scores_to_ranks(scores)                       # [B, O]
    pred_order = jnp.argsort(ranks, axis=-1)              # options best-first
    best_order = jnp.argsort(-relevance, axis=-1, stable=True)
    k = jnp.sum((relevance != 0).astype(jnp.int32), axis=-1)   # [B]

    discounts = 1.0 / jnp.log2(jnp.arange(O, dtype=jnp.float32) + 2.0)
    pos_mask = (jnp.arange(O)[None, :] < k[:, None]).astype(jnp.float32)

    rel_by_pred = jnp.take_along_axis(relevance, pred_order, axis=-1)
    rel_by_best = jnp.take_along_axis(relevance, best_order, axis=-1)
    dcg = jnp.sum(rel_by_pred * discounts * pos_mask, axis=-1)
    idcg = jnp.sum(rel_by_best * discounts * pos_mask, axis=-1)
    return dcg / jnp.maximum(idcg, 1e-12)


class SparseGTMetrics:
    """Accumulates GT ranks; retrieve() returns R@k/mean/MRR plus per-round
    variants, same keys as utils/visdial_metrics.py:79-105."""

    def __init__(self):
        self.reset()

    def observe(self, predicted_scores, target_inds):
        """predicted_scores [B, R, O]; target_inds [B, R]."""
        ranks = np.asarray(gt_ranks(jnp.asarray(predicted_scores),
                                    jnp.asarray(target_inds)))
        self._ranks_rnd.append(ranks.reshape(ranks.shape[0], -1))

    def retrieve(self, reset: bool = True):
        if not self._ranks_rnd:
            return {}
        all_rnd = np.concatenate(self._ranks_rnd, axis=0).astype(np.float64)
        flat = all_rnd.reshape(-1)
        metrics = {
            "r@1": float(np.mean(flat <= 1)),
            "r@5": float(np.mean(flat <= 5)),
            "r@10": float(np.mean(flat <= 10)),
            "mean": float(np.mean(flat)),
            "mrr": float(np.mean(1.0 / flat)),
        }
        num_rounds = all_rnd.shape[1]
        for rnd in range(1, num_rounds + 1):
            col = all_rnd[:, rnd - 1]
            metrics[f"r_1_round_{rnd}"] = float(np.mean(col <= 1))
            metrics[f"r_5_round_{rnd}"] = float(np.mean(col <= 5))
            metrics[f"r_10_round_{rnd}"] = float(np.mean(col <= 10))
            metrics[f"mean_round_{rnd}"] = float(np.mean(col))
            metrics[f"mrr_round_{rnd}"] = float(np.mean(1.0 / col))
        if reset:
            self.reset()
        return metrics

    def reset(self):
        self._ranks_rnd = []


class NDCG:
    def __init__(self):
        self.reset()

    def observe(self, predicted_scores, target_relevance):
        vals = np.asarray(ndcg_batch(jnp.asarray(predicted_scores),
                                     jnp.asarray(target_relevance)))
        self._num += float(vals.sum())
        self._den += vals.shape[0]

    def retrieve(self, reset: bool = True):
        metrics = {"ndcg": self._num / self._den} if self._den else {}
        if reset:
            self.reset()
        return metrics

    def reset(self):
        self._num = 0.0
        self._den = 0
