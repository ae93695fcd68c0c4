"""Listwise learning-to-rank losses in JAX (allRank-style zoo).

Port of the semantics of /root/reference/utils/rank_loss.py — NeuralSort +
Sinkhorn NDCG surrogates (``neuralNDCG_transposed`` :518-581 is the one the
dense-annotation finetuning phase optimises,
dense_annotation_finetuning.py:288), plus the rest of the zoo (listNet,
listMLE, rankNet, approxNDCG, lambdaLoss) for parity.

XLA notes:
* Sinkhorn runs a fixed ``max_iter`` ``lax.fori_loop`` — the reference's
  early exit at tolerance (rank_loss.py:72-73) becomes run-to-fixed-iters,
  numerically identical within the tolerance since iterates are stable;
* ``-inf`` fills are replaced by masked ``where`` chains so gradients stay
  finite in bf16/fp32;
* boolean fancy-indexing (rankNet's pair selection) becomes masked means.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_EPS = 1e-8
PADDED_Y_VALUE = -1
NEG_LARGE = -1e8


def _pad_mask(y_true, padded_value_indicator=PADDED_Y_VALUE):
    return y_true == padded_value_indicator


def dcg(y_pred, y_true, ats=None, gain_fn=lambda x: jnp.power(2.0, x) - 1,
        padded_value_indicator=PADDED_Y_VALUE):
    """DCG at ranks (rank_loss.py:18-54). Returns [B, len(ats)]."""
    mask = _pad_mask(y_true, padded_value_indicator)
    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true = jnp.where(mask, 0.0, y_true)
    n = y_true.shape[1]
    ats = [n] if ats is None else [min(a, n) for a in ats]
    order = jnp.argsort(-y_pred, axis=-1)
    true_sorted = jnp.take_along_axis(y_true, order, axis=1)
    discounts = 1.0 / jnp.log2(jnp.arange(n, dtype=jnp.float32) + 2.0)
    cum = jnp.cumsum(gain_fn(true_sorted) * discounts, axis=1)
    return cum[:, jnp.asarray(ats) - 1]


def sinkhorn_scaling(mat, mask=None, max_iter=50):
    """Fixed-iteration Sinkhorn normalisation (rank_loss.py:55-78)."""
    if mask is not None:
        either = mask[:, None, :] | mask[:, :, None]
        both = mask[:, None, :] & mask[:, :, None]
        mat = jnp.where(either, 0.0, mat)
        mat = jnp.where(both, 1.0, mat)

    def body(_, m):
        m = m / jnp.clip(m.sum(axis=1, keepdims=True), min=DEFAULT_EPS)
        m = m / jnp.clip(m.sum(axis=2, keepdims=True), min=DEFAULT_EPS)
        return m

    mat = jax.lax.fori_loop(0, max_iter, body, mat)
    if mask is not None:
        mat = jnp.where(mask[:, None, :] | mask[:, :, None], 0.0, mat)
    return mat


def deterministic_neural_sort(s, tau, mask):
    """NeuralSort relaxation (rank_loss.py:79-112). s: [B, n, 1]; mask [B, n];
    returns approximate permutation matrices [B, n, n]."""
    n = s.shape[1]
    s = jnp.where(mask[:, :, None], NEG_LARGE, s)
    A_s = jnp.abs(s - jnp.swapaxes(s, 1, 2))
    A_s = jnp.where(mask[:, None, :] | mask[:, :, None], 0.0, A_s)
    B = jnp.sum(A_s, axis=2, keepdims=True) * jnp.ones((1, 1, n))

    m = mask.sum(axis=1)                                   # padded count per row
    j = jnp.arange(n, dtype=jnp.float32)[None, :]
    n_eff = (n - m).astype(jnp.float32)[:, None]
    scaling = jnp.where(j < n_eff, n_eff + 1 - 2 * (j + 1), 0.0)  # [B, n]

    s0 = jnp.where(mask[:, :, None], 0.0, s)
    C = s0 * scaling[:, None, :]                           # [B, n, n]

    P_max = jnp.swapaxes(C - B, 1, 2)
    either = mask[:, None, :] | mask[:, :, None]
    both = mask[:, None, :] & mask[:, :, None]
    P_max = jnp.where(either, NEG_LARGE, P_max)   # -inf in ref; finite for grads
    P_max = jnp.where(both, 1.0, P_max)
    return jax.nn.softmax(P_max / tau, axis=-1)


def sample_gumbel(rng, shape, eps=1e-10):
    u = jax.random.uniform(rng, shape)
    return -jnp.log(-jnp.log(u + eps) + eps)


def stochastic_neural_sort(s, n_samples, tau, mask, *, rng, beta=1.0,
                           log_scores=True, eps=1e-10):
    """rank_loss.py:125-153. Returns [n_samples, B, n, n]."""
    B, n = s.shape[0], s.shape[1]
    s_pos = s + jnp.abs(s.min())
    samples = beta * sample_gumbel(rng, (n_samples, B, n, 1))
    if log_scores:
        s_pos = jnp.log(s_pos + eps)
    s_pert = (s_pos[None] + samples).reshape(n_samples * B, n, 1)
    # sample-major layout (s*B + b): tile, NOT repeat_interleave, so masks
    # align with the reshape above
    mask_rep = jnp.tile(mask, (n_samples, 1))
    P_hat = deterministic_neural_sort(s_pert, tau, mask_rep)
    return P_hat.reshape(n_samples, B, n, n)


def neuralNDCG_transposed(y_pred, y_true, padded_value_indicator=PADDED_Y_VALUE,
                          temperature=1.0, powered_relevancies=True, k=None,
                          stochastic=False, n_samples=32, beta=0.1,
                          log_scores=True, max_iter=50, rng=None):
    """The dense-finetuning ranking loss (rank_loss.py:518-581)."""
    n = y_true.shape[1]
    k = n if k is None else k
    mask = _pad_mask(y_true, padded_value_indicator)

    if stochastic:
        P_hat = stochastic_neural_sort(y_pred[..., None], n_samples,
                                       temperature, mask, rng=rng, beta=beta,
                                       log_scores=log_scores)
    else:
        P_hat = deterministic_neural_sort(y_pred[..., None], temperature,
                                          mask)[None]
    S = P_hat.shape[0]
    P_hat = sinkhorn_scaling(P_hat.reshape(S * y_pred.shape[0], n, n),
                             jnp.tile(mask, (S, 1)), max_iter=max_iter)
    P_hat = P_hat.reshape(S, y_pred.shape[0], n, n)

    discounts = 1.0 / jnp.log2(jnp.arange(n, dtype=jnp.float32) + 2.0)
    discounts = jnp.where(jnp.arange(n) < k, discounts, 0.0)
    # expected discounts under the (transposed) soft permutation
    discounts = jnp.einsum("sbji,j->sbi", P_hat, discounts)

    gains = jnp.power(2.0, y_true) - 1 if powered_relevancies else y_true
    discounted_gains = gains[None] * discounts
    idcg = dcg(y_pred=y_true, y_true=y_true, ats=[k])[:, 0]

    ndcg = discounted_gains.sum(axis=2) / (idcg[None] + DEFAULT_EPS)
    idcg_mask = idcg == 0.0
    ndcg = jnp.where(idcg_mask[None], 0.0, ndcg)
    denom = (~idcg_mask).sum() * S
    return jnp.where(denom == 0, 0.0, -ndcg.sum() / jnp.maximum(denom, 1))


def neuralNDCG(y_pred, y_true, padded_value_indicator=PADDED_Y_VALUE,
               temperature=1.0, powered_relevancies=True, k=None,
               stochastic=False, n_samples=32, beta=0.1, log_scores=True,
               rng=None):
    """rank_loss.py:455-515."""
    n = y_true.shape[1]
    k = n if k is None else k
    mask = _pad_mask(y_true, padded_value_indicator)
    if stochastic:
        P_hat = stochastic_neural_sort(y_pred[..., None], n_samples,
                                       temperature, mask, rng=rng, beta=beta,
                                       log_scores=log_scores)
    else:
        P_hat = deterministic_neural_sort(y_pred[..., None], temperature,
                                          mask)[None]
    S = P_hat.shape[0]
    P_hat = sinkhorn_scaling(P_hat.reshape(S * y_pred.shape[0], n, n),
                             jnp.tile(mask, (S, 1)))
    P_hat = P_hat.reshape(S, y_pred.shape[0], n, n)
    P_hat = jnp.where((mask[None, :, :, None] | mask[None, :, None, :]),
                      0.0, P_hat)
    y_m = jnp.where(mask, 0.0, y_true)[None, ..., None]
    if powered_relevancies:
        y_m = jnp.power(2.0, y_m) - 1.0
    ground_truth = jnp.matmul(P_hat, y_m)[..., 0]
    discounts = 1.0 / jnp.log2(jnp.arange(n, dtype=jnp.float32) + 2.0)
    gains = (ground_truth * discounts)[:, :, :k]
    idcg = dcg(y_true, y_true, ats=[k])[:, 0]
    ndcg = gains.sum(axis=-1) / (idcg[None] + DEFAULT_EPS)
    idcg_mask = idcg == 0.0
    ndcg = jnp.where(idcg_mask[None], 0.0, ndcg)
    denom = (~idcg_mask).sum() * S
    return jnp.where(denom == 0, 0.0, -ndcg.sum() / jnp.maximum(denom, 1))


def listNet(y_pred, y_true, eps=DEFAULT_EPS,
            padded_value_indicator=PADDED_Y_VALUE):
    """rank_loss.py:354-378."""
    mask = _pad_mask(y_true, padded_value_indicator)
    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true = jnp.where(mask, -jnp.inf, y_true)
    preds_smax = jax.nn.softmax(y_pred, axis=1) + eps
    true_smax = jax.nn.softmax(y_true, axis=1)
    return jnp.mean(-jnp.sum(true_smax * jnp.log(preds_smax), axis=1))


def listMLE(y_pred, y_true, eps=DEFAULT_EPS,
            padded_value_indicator=PADDED_Y_VALUE, rng=None):
    """rank_loss.py:196-228. ``rng`` shuffles for tie resolution (the
    reference uses torch.randperm); omit for deterministic behaviour."""
    if rng is not None:
        perm = jax.random.permutation(rng, y_pred.shape[-1])
        y_pred, y_true = y_pred[:, perm], y_true[:, perm]
    order = jnp.argsort(-y_true, axis=-1, stable=True)
    y_true_sorted = jnp.take_along_axis(y_true, order, axis=1)
    mask = y_true_sorted == padded_value_indicator
    preds = jnp.take_along_axis(y_pred, order, axis=1)
    preds = jnp.where(mask, -jnp.inf, preds)
    pmax = jnp.max(preds, axis=1, keepdims=True)
    p = preds - pmax
    cums = jnp.flip(jnp.cumsum(jnp.flip(jnp.where(mask, 0.0, jnp.exp(p)),
                                        axis=1), axis=1), axis=1)
    obs = jnp.log(cums + eps) - p
    obs = jnp.where(mask, 0.0, obs)
    return jnp.mean(jnp.mean(obs, axis=1))


def rankNet(y_pred, y_true, padded_value_indicator=PADDED_Y_VALUE,
            weight_by_diff=False, weight_by_diff_powed=False):
    """rank_loss.py:303-352 as a masked mean over ordered pairs."""
    mask = _pad_mask(y_true, padded_value_indicator)
    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true_m = jnp.where(mask, -jnp.inf, y_true)
    td = y_true_m[:, :, None] - y_true_m[:, None, :]
    pd = y_pred[:, :, None] - y_pred[:, None, :]
    sel = (td > 0) & jnp.isfinite(td)
    weight = None
    if weight_by_diff:
        weight = jnp.abs(td)
    elif weight_by_diff_powed:
        tp = jnp.power(y_true_m, 2)
        weight = jnp.abs(tp[:, :, None] - tp[:, None, :])
    # BCEWithLogits(pred_diffs, 1): log(1 + exp(-x)), weighted mean over sel
    pd_safe = jnp.where(sel, pd, 0.0)
    losses = jnp.logaddexp(0.0, -pd_safe)
    w = jnp.where(sel, weight if weight is not None else 1.0, 0.0)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(sel), 1)


def approxNDCGLoss(y_pred, y_true, eps=DEFAULT_EPS,
                   padded_value_indicator=PADDED_Y_VALUE, alpha=1.0):
    """rank_loss.py:230-283."""
    mask = _pad_mask(y_true, padded_value_indicator)
    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true = jnp.where(mask, -jnp.inf, y_true)
    order = jnp.argsort(-y_pred, axis=-1)
    y_pred_sorted = jnp.take_along_axis(y_pred, order, axis=1)
    y_true_sorted = -jnp.sort(-y_true, axis=-1)
    true_by_pred = jnp.take_along_axis(y_true, order, axis=1)
    true_diffs = true_by_pred[:, :, None] - true_by_pred[:, None, :]
    pairs = jnp.isfinite(true_diffs)
    pairs = pairs & ~jnp.eye(pairs.shape[-1], dtype=bool)[None]
    true_by_pred = jnp.clip(true_by_pred, min=0.0)
    y_true_sorted = jnp.clip(y_true_sorted, min=0.0)
    n = y_pred.shape[1]
    D = jnp.log2(1.0 + jnp.arange(1, n + 1, dtype=jnp.float32))[None, :]
    maxDCG = jnp.clip(jnp.sum((jnp.power(2.0, y_true_sorted) - 1) / D,
                              axis=-1), min=eps)
    G = (jnp.power(2.0, true_by_pred) - 1) / maxDCG[:, None]
    sd = y_pred_sorted[:, :, None] - y_pred_sorted[:, None, :]
    sd = jnp.where(pairs, sd, 0.0)
    approx_pos = 1.0 + jnp.sum(
        pairs * jnp.clip(jax.nn.sigmoid(-alpha * sd), min=eps), axis=-1)
    approx_D = jnp.log2(1.0 + approx_pos)
    return -jnp.mean(jnp.sum(G / approx_D, axis=-1))


# -- lambdaLoss weighing schemes (rank_loss.py:162-194) ---------------------

def ndcgLoss1_scheme(G, D, *_):
    return (G / D)[:, :, None]


def ndcgLoss2_scheme(G, D, *_):
    n = G.shape[1]
    pos = jnp.arange(1, n + 1)
    delta_idxs = jnp.abs(pos[:, None] - pos[None, :])
    deltas = jnp.abs(jnp.power(jnp.abs(D[0, delta_idxs - 1]), -1.0)
                     - jnp.power(jnp.abs(D[0, delta_idxs]), -1.0))
    deltas = deltas * (1 - jnp.eye(n))
    return deltas[None] * jnp.abs(G[:, :, None] - G[:, None, :])


def lambdaRank_scheme(G, D, *_):
    return (jnp.abs(jnp.power(D[:, :, None], -1.0)
                    - jnp.power(D[:, None, :], -1.0))
            * jnp.abs(G[:, :, None] - G[:, None, :]))


def ndcgLoss2PP_scheme(G, D, mu, true_sorted):
    return mu * ndcgLoss2_scheme(G, D) + lambdaRank_scheme(G, D)


def rankNet_scheme(G, D, *_):
    return 1.0


def rankNetWeightedByGTDiff_scheme(G, D, mu, true_sorted):
    return jnp.abs(true_sorted[:, :, None] - true_sorted[:, None, :])


def rankNetWeightedByGTDiffPowed_scheme(G, D, mu, true_sorted):
    return jnp.abs(jnp.power(true_sorted[:, :, None], 2)
                   - jnp.power(true_sorted[:, None, :], 2))


_SCHEMES = {
    "ndcgLoss1_scheme": ndcgLoss1_scheme,
    "ndcgLoss2_scheme": ndcgLoss2_scheme,
    "lambdaRank_scheme": lambdaRank_scheme,
    "ndcgLoss2PP_scheme": ndcgLoss2PP_scheme,
    "rankNet_scheme": rankNet_scheme,
    "rankNetWeightedByGTDiff_scheme": rankNetWeightedByGTDiff_scheme,
    "rankNetWeightedByGTDiffPowed_scheme": rankNetWeightedByGTDiffPowed_scheme,
}


def lambdaLoss(y_pred, y_true, eps=DEFAULT_EPS,
               padded_value_indicator=PADDED_Y_VALUE, weighing_scheme=None,
               k=None, sigma=1.0, mu=10.0, reduction="mean",
               reduction_log="binary"):
    """rank_loss.py:379-453. ``weighing_scheme`` is a scheme NAME string
    (the reference dispatches through globals())."""
    n = y_pred.shape[1]
    mask = _pad_mask(y_true, padded_value_indicator)
    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true = jnp.where(mask, -jnp.inf, y_true)
    order = jnp.argsort(-y_pred, axis=-1)
    true_by_pred = jnp.take_along_axis(y_true, order, axis=1)
    true_sorted = -jnp.sort(-y_true, axis=-1)
    td = true_by_pred[:, :, None] - true_by_pred[:, None, :]
    pairs_mask = jnp.isfinite(td)
    if weighing_scheme != "ndcgLoss1_scheme":
        pairs_mask = pairs_mask & (td > 0)
    kk = n if k is None else k
    within = jnp.arange(n) < kk
    ndcg_at_k = (within[:, None] & within[None, :])[None]
    true_by_pred = jnp.clip(true_by_pred, min=0.0)
    true_sorted_c = jnp.clip(true_sorted, min=0.0)
    D = jnp.log2(1.0 + jnp.arange(1, n + 1, dtype=jnp.float32))[None, :]
    maxDCG = jnp.clip(jnp.sum(
        ((jnp.power(2.0, true_sorted_c) - 1) / D)[:, :kk], axis=-1), min=eps)
    G = (jnp.power(2.0, true_by_pred) - 1) / maxDCG[:, None]
    preds_sorted = jnp.take_along_axis(y_pred, order, axis=1)
    sd = jnp.clip(preds_sorted[:, :, None] - preds_sorted[:, None, :],
                  min=-1e8, max=1e8)
    sd = jnp.where(jnp.isnan(sd) | ~jnp.isfinite(sd), 0.0, sd)
    if weighing_scheme is None:
        weights = 1.0
    else:
        weights = _SCHEMES[weighing_scheme](G, D, mu, true_sorted_c)
    probas = jnp.clip(
        jnp.power(jnp.clip(jax.nn.sigmoid(sigma * sd), min=eps), weights),
        min=eps)
    log_fn = jnp.log2 if reduction_log == "binary" else jnp.log
    losses = log_fn(probas)
    sel = pairs_mask & ndcg_at_k
    total = jnp.sum(jnp.where(sel, losses, 0.0))
    if reduction == "sum":
        return -total
    return -total / jnp.maximum(sel.sum(), 1)
