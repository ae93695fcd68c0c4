"""Gathered-MLM training path: custom-VJP online xent gradients and loss
equality vs the dense reference formulation."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_model import TINY, make_batch
from unimm_tpu.models import unimm
from unimm_tpu.models import vilbert
from unimm_tpu.ops import losses as L


def test_online_xent_vjp_matches_dense_grads():
    rng = np.random.default_rng(0)
    M, H, V = 10, 16, 300
    hidden = jnp.asarray(rng.normal(size=(M, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(V, H)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, size=(M,)))
    labels = labels.at[0].set(-1)
    weights = jnp.asarray(
        rng.choice([1.0, 2.0, -1.0, 0.0], size=(M,)), jnp.float32)

    def loss_vjp(h, w, b):
        nll = L.online_softmax_xent_vjp(h, w, b, labels, 128)
        num = jnp.sum((weights != 0).astype(jnp.float32))
        return L.masked_lm_ul_loss_gathered(nll, labels, weights, num)

    def loss_dense(h, w, b):
        logits = (h @ w.T + b)[None]   # [1, M, V]
        return L.masked_lm_ul_loss(logits, labels[None], weights[None])

    v1 = float(loss_vjp(hidden, w, b))
    v2 = float(loss_dense(hidden, w, b))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)

    g1 = jax.grad(loss_vjp, argnums=(0, 1, 2))(hidden, w, b)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(hidden, w, b)
    for a, bb, name in zip(g1, g2, ["dh", "dw", "db"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4,
                                   atol=1e-6, err_msg=name)


def _train_batch(rng, cfg, B=3):
    batch = make_batch(rng, cfg, B=B)
    L_, R = cfg.max_seq_len, cfg.max_regions
    labels = np.full((B, L_), -1, np.int32)
    labels[:, 10:18] = rng.integers(0, cfg.vocab_size, size=(B, 8))
    w = np.zeros((B, L_), np.float32)
    w[:, 10:14] = 1.0
    w[1, 14:18] = -1.0
    labels = np.where((w == 0) & (labels != -1) & (np.arange(L_) >= 14),
                      labels, labels)   # keep some labeled-but-zero-weight
    batch.update({
        "mlm_labels": jnp.asarray(labels),
        "lm_weight": jnp.asarray(w),
        "next_sentence_label": jnp.asarray(rng.integers(0, 2, B)),
        "image_target": jnp.asarray(
            rng.dirichlet(np.ones(cfg.v_target_size), (B, R))
            .astype(np.float32)),
        "image_label": jnp.asarray(rng.choice([-1, 1], (B, R))),
    })
    return batch


def test_forward_train_gathered_equals_dense():
    rng = np.random.default_rng(1)
    params = vilbert.init_params(jax.random.PRNGKey(0), TINY)
    batch = _train_batch(rng, TINY)
    cfg_g = TINY.replace(mlm_loss_impl="gathered", max_train_label_positions=16)
    cfg_d = TINY.replace(mlm_loss_impl="dense")
    # eval-mode forward (no dropout) so both paths see identical activations
    out_g = unimm.forward_train(params, cfg_g, batch, rng=jax.random.PRNGKey(1),
                                dtype=jnp.float32, train=False)
    out_d = unimm.forward_train(params, cfg_d, batch, rng=jax.random.PRNGKey(1),
                                dtype=jnp.float32, train=False)
    for k in out_g:
        np.testing.assert_allclose(float(out_g[k]), float(out_d[k]),
                                   rtol=1e-5, err_msg=k)

    # gradient equality through the full model
    def total(p, cfg):
        o = unimm.forward_train(p, cfg, batch, rng=jax.random.PRNGKey(1),
                                dtype=jnp.float32, train=False)
        return o["lm"] + o["nsp"] + o["img"]

    g_g = jax.grad(total)(params, cfg_g)
    g_d = jax.grad(total)(params, cfg_d)
    paths = [
        ("bert", "embeddings", "word_embeddings"),
        ("cls", "predictions", "bias"),
        ("cls", "predictions", "transform", "dense", "kernel"),
        ("bert", "encoder", "layer", "0", "attention", "self", "query",
         "kernel"),
    ]
    for path in paths:
        a, b = g_g, g_d
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6, err_msg=str(path))


def test_label_budget_overflow_metric():
    """train_step reports how many sequences exceed the gathered-MLM label
    budget (telemetry for the documented truncation, config.py
    max_train_label_positions)."""
    from unimm_tpu.train import optim, step as tstep

    cfg = TINY.replace(max_train_label_positions=4, mlm_loss_impl="gathered")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, B=3)
    B, Lx = 3, cfg.max_seq_len
    labels = np.full((B, Lx), -1, np.int32)
    labels[0, 2:12] = 7   # 10 labels > budget 4
    labels[1, 2:5] = 7    # 3 labels, within budget
    labels[2, 2:8] = 7    # 6 labels > budget
    batch.update({
        "mlm_labels": jnp.asarray(labels),
        "lm_weight": jnp.asarray((labels != -1).astype(np.float32)),
        "next_sentence_label": jnp.asarray([0, 1, 0], jnp.int32),
        "image_target": jnp.asarray(rng.dirichlet(
            np.ones(cfg.v_target_size), (B, cfg.max_regions)), jnp.float32),
        "image_label": jnp.asarray(
            rng.choice([-1, 0, 1], (B, cfg.max_regions)), jnp.int32),
    })
    tx = optim.make_optimizer(params, optim.OptimConfig())
    state = tstep.init_state(params, tx)
    step = tstep.make_train_step(cfg, tx, dtype=jnp.float32, donate=False)
    _, metrics = step(state, batch, jnp.asarray([1.0, 1.0]))
    assert int(metrics["label_budget_overflow"]) == 2


def test_label_overflow_fallback_policies():
    """make_train_step_with_fallback: an overflowing batch must route through
    the exact dense path (policy='dense'), raise (policy='error'), and a
    non-overflowing batch must stay on the gathered step."""
    from unimm_tpu.train import optim, step as tstep

    # deterministic config so the dense-routed step is bit-comparable to a
    # step built with mlm_loss_impl='dense' directly
    cfg = TINY.replace(max_train_label_positions=4, mlm_loss_impl="gathered",
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0,
                       v_hidden_dropout_prob=0.0,
                       v_attention_probs_dropout_prob=0.0)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    batch = _train_batch(rng, cfg)           # 8 labels/seq > budget 4
    tx = optim.make_optimizer(params, optim.OptimConfig())
    state = tstep.init_state(params, tx)
    nw = jnp.asarray([1.0, 1.0])
    host_labels = np.asarray(batch["mlm_labels"])

    # policy='dense': equals a step compiled with the dense impl
    step_fb = tstep.make_train_step_with_fallback(
        cfg, tx, policy="dense", dtype=jnp.float32, donate=False)
    _, m_fb = step_fb(state, batch, nw, host_mlm_labels=host_labels)
    step_dense = tstep.make_train_step(cfg.replace(mlm_loss_impl="dense"),
                                       tx, dtype=jnp.float32, donate=False)
    _, m_dense = step_dense(state, batch, nw)
    for k in ("loss", "lm_loss"):
        np.testing.assert_allclose(float(m_fb[k]), float(m_dense[k]),
                                   rtol=1e-6, err_msg=k)
    # ...and differs from the silently-truncating gathered step
    step_g = tstep.make_train_step(cfg, tx, dtype=jnp.float32, donate=False)
    _, m_g = step_g(state, batch, nw)
    assert abs(float(m_g["lm_loss"]) - float(m_fb["lm_loss"])) > 1e-4

    # policy='error': raises instead of truncating
    step_err = tstep.make_train_step_with_fallback(
        cfg, tx, policy="error", dtype=jnp.float32, donate=False)
    try:
        step_err(state, batch, nw, host_mlm_labels=host_labels)
        raise AssertionError("expected ValueError on overflow")
    except ValueError:
        pass

    # no overflow: identical to the plain gathered step (host_labels omitted
    # exercises the addressable-fetch path)
    ok_labels = np.full_like(host_labels, -1)
    ok_labels[:, 10:13] = 7
    ok_batch = dict(batch, mlm_labels=jnp.asarray(ok_labels),
                    lm_weight=jnp.asarray(
                        (ok_labels != -1).astype(np.float32)))
    _, m_ok = step_fb(state, ok_batch, nw)
    _, m_ok_plain = step_g(state, ok_batch, nw)
    np.testing.assert_allclose(float(m_ok["loss"]), float(m_ok_plain["loss"]),
                               rtol=1e-6)
