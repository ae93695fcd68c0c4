"""Focal and gradient-harmonizing losses (port of /root/reference/utils/
losses.py semantics).

In the reference these are imported by the model (vilbert_dialog.py:38) with
every call site commented out; the dense finetuning script computes
``qfocal_loss`` and a KLDiv ``ce_loss`` for LOGGING only
(dense_annotation_finetuning.py:275-280). They are provided here for full
capability parity — usable as drop-in alternatives for the NSP loss — plus
the two logging quantities used by the dense phase.

The GHM losses keep EMA bin-count state across steps in the reference
(losses.py:136-140); here that state is explicit: pass/return
``last_bin_count`` (a [bins] array), which keeps the functions pure and
jit-friendly (bincounting is a fixed-size segment-sum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-20


def binary_ce_focal_loss(predict, target, gamma=2.0, alpha=0.25,
                         reduction="mean", eps=EPS):
    """losses.py:25-34."""
    pt = jax.nn.sigmoid(predict)
    loss = (-alpha * jnp.clip(1 - pt, min=eps) ** gamma * target
            * jnp.log(jnp.clip(pt, min=eps))
            - (1 - alpha) * jnp.clip(pt, min=eps) ** gamma * (1 - target)
            * jnp.log(jnp.clip(1 - pt, min=eps)))
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def multi_ce_focal_loss(predict, target, class_num=2, gamma=2.0, alpha=None,
                        reduction="mean", eps=EPS):
    """losses.py:63-78."""
    pt = jax.nn.softmax(predict, axis=1)
    onehot = jax.nn.one_hot(target, class_num, dtype=pt.dtype)
    if alpha is None:
        alpha = jnp.ones((class_num,), pt.dtype)
    a = jnp.asarray(alpha).reshape(-1)[target]
    probs = jnp.sum(pt * onehot, axis=1)
    log_p = jnp.log(jnp.clip(probs, min=eps))
    loss = -a * jnp.power(1 - probs, gamma) * log_p
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def _ghm_weights(g, n_elems, bins, alpha, last_bin_count):
    bin_idx = jnp.floor(g * (bins - 0.0001)).astype(jnp.int32)
    bin_count = jnp.zeros((bins,), jnp.float32).at[bin_idx.reshape(-1)].add(1.0)
    if last_bin_count is not None:
        bin_count = alpha * last_bin_count + (1 - alpha) * bin_count
    nonempty = jnp.sum((bin_count > 0).astype(jnp.float32))
    gd = jnp.clip(bin_count * nonempty, min=0.0001)
    beta = n_elems / gd
    return beta[bin_idx], bin_count


def ghmc_loss(x, target, bins=10, alpha=0.75, last_bin_count=None):
    """Gradient-harmonized BCE (losses.py:83-106,151-160). Returns
    (loss, new_bin_count) — thread new_bin_count into the next call for the
    EMA behaviour."""
    g = jax.lax.stop_gradient(jnp.abs(jax.nn.sigmoid(x) - target))
    n = x.shape[0] * x.shape[1]
    w, bin_count = _ghm_weights(g, n, bins, alpha, last_bin_count)
    # weighted BCE-with-logits, mean over elements (torch weight semantics)
    per = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per * w), bin_count


def ghmr_loss(x, target, mu=0.02, bins=10, alpha=0.75, last_bin_count=None):
    """Gradient-harmonized regression loss (losses.py:163-178). Returns
    (loss, new_bin_count)."""
    d = x - target
    g = jax.lax.stop_gradient(jnp.abs(d / jnp.sqrt(d * d + mu * mu)))
    n = x.shape[0] * x.shape[1]
    w, bin_count = _ghm_weights(g, n, bins, alpha, last_bin_count)
    loss = jnp.sqrt(d * d + mu * mu) - mu
    return jnp.sum(loss * w) / n, bin_count


# -- dense-finetuning logging quantities ------------------------------------

def dense_qfocal_log(nsp_logits, gt_relevance):
    """dense_annotation_finetuning.py:278-280: quality-focal logging value.
    nsp_logits [B, O, 2]; gt_relevance [B, O]."""
    probs = jax.nn.softmax(nsp_logits, axis=-1)
    log_probs = jax.nn.log_softmax(nsp_logits, axis=-1)
    p0, lp0, lp1 = probs[..., 0], log_probs[..., 0], log_probs[..., 1]
    return -jnp.mean(jnp.abs(gt_relevance - p0) ** 2.0
                     * (gt_relevance * lp0 + (1 - gt_relevance) * lp1))


def dense_ce_log(nsp_logits, gt_relevance):
    """dense_annotation_finetuning.py:275: KLDiv(batchmean) between the
    slate-softmaxed NSP probabilities and softmaxed relevance."""
    p0 = jax.nn.softmax(nsp_logits, axis=-1)[..., 0]
    log_pred = jax.nn.log_softmax(p0, axis=1)
    true = jax.nn.softmax(gt_relevance, axis=1)
    kld = jnp.where(true > 0,
                    true * (jnp.log(jnp.clip(true, min=1e-30)) - log_pred),
                    0.0)
    return jnp.sum(kld) / nsp_logits.shape[0]
