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
        """predicted_scores [B, R, O]; target_inds [B, R]. Empty batches
        (every row masked out as loader tail padding) are a no-op."""
        if np.asarray(predicted_scores).shape[0] == 0:
            return
        ranks = np.asarray(gt_ranks(jnp.asarray(predicted_scores),
                                    jnp.asarray(target_inds)))
        self._ranks_rnd.append(ranks.reshape(ranks.shape[0], -1))

    def stats(self):
        """Sufficient statistics: ([5, R] per-round sums of the indicators
        (r<=1, r<=5, r<=10) and of (r, 1/r), observed row count). Additive
        across shards — the multi-host merge allgathers and sums these."""
        if not self._ranks_rnd:
            return None, 0
        all_rnd = np.concatenate(self._ranks_rnd, axis=0).astype(np.float64)
        s = np.stack([(all_rnd <= 1).sum(axis=0), (all_rnd <= 5).sum(axis=0),
                      (all_rnd <= 10).sum(axis=0), all_rnd.sum(axis=0),
                      (1.0 / all_rnd).sum(axis=0)])
        return s, all_rnd.shape[0]

    @staticmethod
    def metrics_from_stats(s, n) -> dict:
        """``n``: observed row count — a scalar (single shard: every row
        carries every round) or a per-round count vector [R] (multi-host
        merge over shards that may have observed different round counts;
        each round's sums are divided by ITS OWN row count, and rounds no
        shard observed are omitted instead of silently understated)."""
        n_round = (None if s is None
                   else np.full(s.shape[1], float(n), np.float64)
                   if np.ndim(n) == 0 else np.asarray(n, np.float64))
        if s is None or not n_round.sum():
            return {}
        names = ("r_1", "r_5", "r_10", "mean", "mrr")
        flat_names = ("r@1", "r@5", "r@10", "mean", "mrr")
        total = float(n_round.sum())
        metrics = {k: float(v) / total for k, v in zip(flat_names,
                                                       s.sum(axis=1))}
        for rnd in range(1, s.shape[1] + 1):
            if not n_round[rnd - 1]:
                continue
            for k, v in zip(names, s[:, rnd - 1]):
                metrics[f"{k}_round_{rnd}"] = float(v) / n_round[rnd - 1]
        return metrics

    def retrieve(self, reset: bool = True):
        metrics = self.metrics_from_stats(*self.stats())
        if reset:
            self.reset()
        return metrics

    def reset(self):
        self._ranks_rnd = []


class NDCG:
    def __init__(self):
        self.reset()

    def observe(self, predicted_scores, target_relevance):
        if np.asarray(predicted_scores).shape[0] == 0:
            return  # fully-masked loader tail padding batch
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


_BARRIER_SEQ = 0  # one-shot coordination-barrier keys, aligned by call order


def allreduce_metrics(sparse: "SparseGTMetrics", ndcg: "NDCG") -> dict:
    """Global metrics from per-process accumulators (data-sharded multi-host
    eval: each process scored a disjoint loader shard, loader.py process
    sharding). Allgathers the additive sufficient statistics over all JAX
    processes, sums, and evaluates the same formulas retrieve() uses — so
    the result equals a single process having observed every row. The
    accumulators are left unchanged."""
    from jax.experimental import multihost_utils

    s, n = sparse.stats()
    # align processes on the coordination service BEFORE the first Gloo
    # collective: its rendezvous has a ~30 s deadline, and per-process eval
    # durations can skew past it (compile-cache asymmetry, CPU contention)
    try:
        from jax._src.distributed import global_state
        global _BARRIER_SEQ
        if global_state.client is not None:
            global_state.client.wait_at_barrier(
                f"allreduce_metrics_{_BARRIER_SEQ}", 300_000)
            _BARRIER_SEQ += 1
    except Exception:
        pass  # barrier API moved: fall back to Gloo's own deadline
    # a process can legitimately observe ZERO valid rows (every padded batch
    # slice was duplicates — happens whenever process_count exceeds the
    # global eval batch size). Its stats are None with no defined round
    # count R, so agree on max(R) first and contribute zeros.
    r_local = 0 if s is None else s.shape[1]
    r_max = int(np.asarray(
        multihost_utils.process_allgather(np.int64(r_local))).max())
    if r_max == 0:
        return {}
    s_pad = np.zeros((5, r_max), np.float64)
    # per-ROUND row counts (not one scalar): a shard that observed fewer
    # rounds than r_max contributes zero count (not just zero sums) to the
    # rounds it never saw, so the merged *_round_r divide by the number of
    # rows that actually carried round r
    n_pad = np.zeros(r_max, np.float64)
    if s is not None:
        s_pad[:, :s.shape[1]] = s
        n_pad[:s.shape[1]] = float(n)
    payload = {"s": s_pad, "n": n_pad,
               "ndcg": np.asarray([ndcg._num, float(ndcg._den)], np.float64)}
    g = multihost_utils.process_allgather(payload)
    metrics = SparseGTMetrics.metrics_from_stats(
        np.asarray(g["s"]).sum(axis=0), np.asarray(g["n"]).sum(axis=0))
    num, den = np.asarray(g["ndcg"]).sum(axis=0)
    if den:
        metrics["ndcg"] = float(num / den)
    return metrics
