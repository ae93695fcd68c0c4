"""Multi-task V+L heads (VQA-style) — VILBertForVLTasks + SimpleClassifier.

Port of /root/reference/models/vilbert_dialog.py:1629-1709. These heads are
unused by every UniMM entry point (SURVEY §2.1) but are part of the model
file's capability surface, so they are provided for downstream multi-task
use: vil_prediction (weight-normed MLP classifier over the fused pooled
output), vil_logit, per-region vision_logit with padding bias, per-token
linguistic logit, plus the standard pretraining heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import vilbert
from unimm_tpu.models.vilbert import _Rng, dropout, linear


def _weight_norm_linear(p, x):
    """torch weight_norm(dim=None): w = g * v / ||v||_F (weight_g scalar)."""
    v = p["weight_v"]
    g = p["weight_g"]
    w = v * (g / jnp.linalg.norm(v))
    return jnp.matmul(x, w) + p["bias"]


def simple_classifier(p, x, *, drop, train, rng):
    """SimpleClassifier (vilbert_dialog.py:1697-1709): weight-normed MLP."""
    h = jax.nn.relu(_weight_norm_linear(p["0"], x))
    h = dropout(h, drop, train, rng)
    return _weight_norm_linear(p["3"], h)


def vl_tasks_forward(params, cfg: VilbertConfig, batch, *, train=False,
                     rng=None, dtype=jnp.float32, dropout_prob=0.1):
    """VILBertForVLTasks.forward (vilbert_dialog.py:1646-1693).

    batch: descriptor batch as in unimm.encode.
    Returns (vil_prediction, vil_logit, vil_binary_prediction,
             vision_prediction, vision_logit, linguistic_prediction,
             linguistic_logit).
    """
    from unimm_tpu.models import unimm

    r_enc, r_head, r_task = (jax.random.split(rng, 3) if rng is not None
                             else (None, None, None))
    t_seq, v_seq, pooled_t, pooled_v = unimm.encode(
        params, cfg, batch, train=train, rng=r_enc, dtype=dtype)
    mlm_logits, img_logits, nsp_logits = vilbert.pretraining_heads(
        params, cfg, t_seq, v_seq, pooled_t, pooled_v, train=train,
        rng=r_head)

    # own key: pretraining_heads consumed r_head's fold_in(., 0) for its
    # pooled dropout — reusing it here would correlate the dropout masks
    r = _Rng(r_task)
    if cfg.fusion_method == "mul":
        pooled = pooled_t * pooled_v
    else:
        pooled = pooled_t + pooled_v
    pooled = dropout(pooled, dropout_prob, train, r)

    pt = params["task_heads"]
    vil_prediction = simple_classifier(pt["vil_prediction"], pooled,
                                       drop=0.5, train=train, rng=r)
    vil_logit = linear(pt["vil_logit"], pooled)
    image_mask = jnp.asarray(batch["image_mask"], jnp.float32)
    vision_logit = (linear(pt["vision_logit"],
                           dropout(v_seq, dropout_prob, train, r))
                    + ((1.0 - image_mask) * -10000.0)[..., None])
    linguistic_logit = linear(pt["linguisic_logit"],
                              dropout(t_seq, dropout_prob, train, r))
    return (vil_prediction, vil_logit, nsp_logits, img_logits, vision_logit,
            mlm_logits, linguistic_logit)


def init_task_heads(rng, cfg: VilbertConfig, num_labels: int):
    """Parameters for the task heads (added under params['task_heads'])."""
    std = cfg.initializer_range
    ks = jax.random.split(rng, 5)
    bi = cfg.bi_hidden_size

    def wn_linear(key, n_in, n_out):
        v = jax.random.normal(key, (n_in, n_out)) * std
        return {"weight_v": v,
                "weight_g": jnp.linalg.norm(v),
                "bias": jnp.zeros((n_out,))}

    return {
        "vil_prediction": {"0": wn_linear(ks[0], bi, bi * 2),
                           "3": wn_linear(ks[1], bi * 2, num_labels)},
        "vil_logit": vilbert._init_linear(ks[2], bi, 1, std),
        "vision_logit": vilbert._init_linear(ks[3], cfg.v_hidden_size, 1, std),
        "linguisic_logit": vilbert._init_linear(ks[4], cfg.hidden_size, 1,
                                                std),
    }
