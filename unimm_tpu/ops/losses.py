"""Training losses as a single XLA-friendly graph.

Replicates the loss semantics of the reference
(/root/reference/models/vilbert_dialog.py:1559-1624) with static shapes:
the reference's boolean fancy-indexing (``w>0`` / ``w==-1`` row selection,
:1581-1584) is rewritten as masked segment sums, which is numerically
identical and compiles to fixed-shape TPU code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLAMP_MIN = 1e-6  # vilbert_dialog.py:1558


def masked_lm_ul_loss(mlm_logits, labels, lm_weight, num_tokens=None):
    """MLM likelihood + unlikelihood loss (vilbert_dialog.py:1577-1595).

    Args:
      mlm_logits: [N, L, V] float logits.
      labels: [N, L] int; -1 = ignore ("masked_tokens" channel).
      lm_weight: [N, L] float; >0 likelihood weight, -1 unlikelihood marker,
        0 = no loss.
      num_tokens: optional normaliser override (length-bucketed morsels
        pass the accumulation group's count / k, unimm.lm_loss_and_heads).
    Returns scalar: (sum w*nll[w>0] + sum -log(1-p)[w==-1]) / count(w != 0).
    """
    logits = mlm_logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.maximum(labels, 0)
    tok_logp = jnp.take_along_axis(
        log_probs, safe_labels[..., None], axis=-1)[..., 0]
    valid = labels != -1

    w = lm_weight.astype(jnp.float32)
    l_mask = (w > 0) & valid
    ul_mask = (w == -1) & valid

    l_sum = jnp.sum(jnp.where(l_mask, -tok_logp * w, 0.0))
    # -log(clamp(1 - p, 1e-6)); log1p(-p) is not used to keep bit-parity with
    # the reference clamp formulation.
    p = jnp.exp(tok_logp)
    ul_nll = -jnp.log(jnp.clip(1.0 - p, min=CLAMP_MIN))
    ul_sum = jnp.sum(jnp.where(ul_mask, ul_nll, 0.0))

    if num_tokens is None:
        num_tokens = jnp.sum((w != 0).astype(jnp.float32))
    return (l_sum + ul_sum) / jnp.maximum(num_tokens, 1.0)


def nsp_loss(nsp_logits, labels, nsp_weight=None, norm_counts=None):
    """Class-weighted NSP cross-entropy (vilbert_dialog.py:1605-1621).

    torch.F.cross_entropy(weight=w) semantics: per-sample nll scaled by
    w[label], mean = sum / sum(w[label]). nsp_weight is normalised by its
    first element first (:1608).

    ``norm_counts`` [2]: optional per-class row counts to normalise by
    instead of this batch's own — length-bucketed accumulation morsels pass
    (group class counts) / k so the summed micro-gradients equal the
    group-level grouping's regardless of how rows were re-bucketed
    (data/dataset.length_bucket_morsels).
    """
    logits = nsp_logits.astype(jnp.float32)
    if nsp_weight is None:
        w = jnp.ones((2,), jnp.float32)
    else:
        w = jnp.asarray(nsp_weight, jnp.float32).reshape(-1)[:2]
        w = w / w[0]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    sample_w = w[labels]
    if norm_counts is not None:
        den = jnp.sum(jnp.asarray(norm_counts, jnp.float32) * w)
    else:
        den = jnp.sum(sample_w)
    return jnp.sum(nll * sample_w) / jnp.maximum(den, 1e-12)


def masked_img_loss(img_logits, image_target, image_label, norm=None):
    """Masked-region KLD loss (vilbert_dialog.py:1569-1574):
    KLDiv(log_softmax(logits), cls_prob target) summed over image_label==1
    rows, divided by the number of such rows.

    ``norm``: optional selected-region count to normalise by instead of
    this batch's own (group count / k from accumulation morsels — see
    nsp_loss)."""
    logits = img_logits.astype(jnp.float32)
    target = image_target.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # torch KLDivLoss(reduction='none'): y * (log y - x), with 0*log0 = 0
    kld = jnp.where(target > 0, target * (jnp.log(jnp.clip(target, min=1e-30))
                                          - log_probs), 0.0)
    sel = (image_label == 1).astype(jnp.float32)
    num = jnp.sum(kld * sel[..., None])
    den = jnp.maximum(jnp.sum(sel) if norm is None else norm, 1.0)
    return num / den


def masked_img_loss_mse(img_logits, image_target, image_label, norm=None):
    """predict_feature=True image loss (vilbert_dialog.py:1562-1567):
    elementwise MSE over masked regions, divided by the number of selected
    ELEMENTS (count x feature dim, per the reference's expand_as).
    ``norm``: optional selected-region COUNT normaliser override (scaled by
    the feature dim here, matching the batch-local den)."""
    pred = img_logits.astype(jnp.float32)
    target = image_target.astype(jnp.float32)
    mse = jnp.square(pred - target)
    sel = (image_label == 1).astype(jnp.float32)[..., None]
    num = jnp.sum(mse * sel)
    if norm is None:
        den = jnp.sum(sel * jnp.ones_like(mse))
    else:
        den = jnp.asarray(norm, jnp.float32) * pred.shape[-1]
    return num / jnp.maximum(den, 1.0)


def _online_xent_impl(hidden, decoder_weight, decoder_bias, labels,
                      chunk: int):
    """Returns (nll [...], lse [...flat], true_logit [...flat])."""
    V, H = decoder_weight.shape
    n_chunks = (V + chunk - 1) // chunk
    pad_v = n_chunks * chunk - V
    w = jnp.pad(decoder_weight, ((0, pad_v), (0, 0)))
    b = jnp.pad(decoder_bias, (0, pad_v), constant_values=-1e30)
    w = w.reshape(n_chunks, chunk, H)
    b = b.reshape(n_chunks, chunk)

    shape = hidden.shape[:-1]
    h = hidden.reshape(-1, H)
    lab = labels.reshape(-1)

    def body(carry, xs):
        run_max, run_sum, true_logit = carry
        w_c, b_c, idx0 = xs
        logits = (jnp.matmul(h, w_c.T,
                             preferred_element_type=jnp.float32)
                  + b_c[None, :].astype(jnp.float32))
        c_max = jnp.max(logits, axis=-1)
        new_max = jnp.maximum(run_max, c_max)
        run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.sum(
            jnp.exp(logits - new_max[:, None]), axis=-1)
        local = lab - idx0
        in_chunk = (local >= 0) & (local < chunk)
        picked = jnp.take_along_axis(
            logits, jnp.clip(local, 0, chunk - 1)[:, None], axis=-1)[:, 0]
        true_logit = jnp.where(in_chunk, picked, true_logit)
        return (new_max, run_sum, true_logit), None

    init = (jnp.full((h.shape[0],), -jnp.inf, jnp.float32),
            jnp.zeros((h.shape[0],), jnp.float32),
            jnp.zeros((h.shape[0],), jnp.float32))
    idx0s = jnp.arange(n_chunks) * chunk
    (m, s, t), _ = jax.lax.scan(body, init, (w, b, idx0s))
    lse = m + jnp.log(s)
    nll = jnp.where(lab == -1, 0.0, lse - t)
    return nll.reshape(shape), lse, t


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def online_softmax_xent_vjp(hidden, decoder_weight, decoder_bias, labels,
                            chunk: int = 7680):
    """online_softmax_xent with a memory-lean custom backward: the forward
    saves only [M] softmax statistics; the backward recomputes each vocab
    chunk's logits and accumulates dhidden / ddecoder / dbias chunk-wise —
    the [M, V] logits never exist in either pass."""
    nll, _, _ = _online_xent_impl(hidden, decoder_weight, decoder_bias,
                                  labels, chunk)
    return nll


def _oxv_fwd(hidden, decoder_weight, decoder_bias, labels, chunk):
    nll, lse, _ = _online_xent_impl(hidden, decoder_weight, decoder_bias,
                                    labels, chunk)
    return nll, (hidden, decoder_weight, decoder_bias, labels, lse)


def _oxv_bwd(chunk, res, g):
    hidden, decoder_weight, decoder_bias, labels, lse = res
    V, H = decoder_weight.shape
    n_chunks = (V + chunk - 1) // chunk
    pad_v = n_chunks * chunk - V
    w = jnp.pad(decoder_weight, ((0, pad_v), (0, 0)))
    b = jnp.pad(decoder_bias, (0, pad_v), constant_values=-1e30)
    w = w.reshape(n_chunks, chunk, H).astype(hidden.dtype)
    b = b.reshape(n_chunks, chunk)

    shape = hidden.shape[:-1]
    h = hidden.reshape(-1, H)
    lab = labels.reshape(-1)
    gf = (g.reshape(-1).astype(jnp.float32)
          * (lab != -1).astype(jnp.float32))

    def body(dh, xs):
        w_c, b_c, idx0 = xs
        logits = (jnp.matmul(h, w_c.T,
                             preferred_element_type=jnp.float32)
                  + b_c[None, :].astype(jnp.float32))
        probs = jnp.exp(logits - lse[:, None])
        local = lab - idx0
        in_chunk = (local >= 0) & (local < chunk)
        onehot_col = jnp.clip(local, 0, chunk - 1)
        dlogits = probs
        dlogits = dlogits.at[jnp.arange(h.shape[0]), onehot_col].add(
            jnp.where(in_chunk, -1.0, 0.0))
        dlogits = dlogits * gf[:, None]
        dh = dh + jnp.matmul(dlogits.astype(w_c.dtype), w_c,
                             preferred_element_type=jnp.float32)
        dw_c = jnp.matmul(dlogits.T.astype(h.dtype), h,
                          preferred_element_type=jnp.float32)
        db_c = jnp.sum(dlogits, axis=0)
        return dh, (dw_c, db_c)

    idx0s = jnp.arange(n_chunks) * chunk
    dh0 = jnp.zeros((h.shape[0], H), jnp.float32)
    dh, (dw, db) = jax.lax.scan(body, dh0, (w, b, idx0s))
    dw = dw.reshape(n_chunks * chunk, H)[:V]
    db = db.reshape(n_chunks * chunk)[:V]
    return (dh.reshape(shape + (H,)).astype(hidden.dtype),
            dw.astype(decoder_weight.dtype), db.astype(decoder_bias.dtype),
            None)


online_softmax_xent_vjp.defvjp(_oxv_fwd, _oxv_bwd)


def online_softmax_xent(hidden, decoder_weight, decoder_bias, labels,
                        chunk: int = 7680):
    """Cross-entropy over a large vocab WITHOUT materialising full logits.

    Streams the [V, H] tied decoder in vocab chunks with a running
    max/exp-sum (online softmax), so HBM holds only [N, P, chunk] at a time.
    The reference materialises [N, 256, 30522] logits on every eval forward
    (vilbert_dialog.py:1069, val_lm.py:131-134).

    Args:
      hidden: [..., H] transformed MLM hiddens at label positions.
      decoder_weight: [V, H] tied word-embedding matrix.
      decoder_bias: [V].
      labels: [...] int; -1 = ignore.
      chunk: vocab tile size (multiple of 128 for MXU alignment).
    Returns: nll [...] float32, zero at ignored positions.
    """
    nll, _, _ = _online_xent_impl(hidden, decoder_weight, decoder_bias,
                                  labels, chunk)
    return nll


def masked_lm_ul_loss_gathered(nll, labels, weights, num_tokens=None):
    """masked_lm_ul_loss computed from per-position NLL at gathered label
    positions (pairs with online_softmax_xent_vjp — no [N, L, V] logits).

    Mathematically identical to the dense form: the unlikelihood term
    -log(1 - p) is a function of nll via p = exp(-nll), so autodiff chains
    the correct UL gradient through the xent's custom VJP.

    ``num_tokens``: pass sum(full_lm_weight != 0) for exact denominator
    parity with the dense form (which counts nonzero weights regardless of
    label validity, vilbert_dialog.py:1592).
    """
    nll = nll.astype(jnp.float32)
    valid = labels != -1
    w = weights.astype(jnp.float32)
    l_mask = (w > 0) & valid
    ul_mask = (w == -1) & valid
    l_sum = jnp.sum(jnp.where(l_mask, nll * w, 0.0))
    p = jnp.exp(-nll)
    ul_term = -jnp.log(jnp.clip(1.0 - p, min=CLAMP_MIN))
    ul_sum = jnp.sum(jnp.where(ul_mask, ul_term, 0.0))
    if num_tokens is None:
        num_tokens = jnp.sum(((w != 0) & valid).astype(jnp.float32))
    return (l_sum + ul_sum) / jnp.maximum(num_tokens, 1.0)


def combine_losses(lm, img, nsp, lm_coeff=1.0, nsp_coeff=1.0, img_coeff=1.0):
    """train.py:167-168."""
    return lm_coeff * lm + nsp_coeff * nsp + img_coeff * img
