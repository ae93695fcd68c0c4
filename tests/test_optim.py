"""Optimizer/schedule tests against the reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from unimm_tpu.train import optim


def ref_lr(step, base, warmup=10000, t_total=200000, min_lr=1e-5):
    """utils/optim_utils.py:19-26 literal."""
    if step < warmup:
        f = step / max(1, warmup)
    else:
        f = max(0.0, (t_total - step) / max(1.0, t_total - warmup))
    lr = base * f
    return lr if lr > min_lr else min_lr


def test_schedule_matches_reference():
    cfg = optim.OptimConfig(lr=2e-5)
    sched = optim.warmup_linear_nonzero(2e-5, cfg)
    for step in [0, 1, 100, 9999, 10000, 50000, 150000, 199999, 200000,
                 250000]:
        np.testing.assert_allclose(float(sched(step)), ref_lr(step, 2e-5),
                                   rtol=1e-6, err_msg=str(step))


def test_schedule_floor():
    cfg = optim.OptimConfig(lr=2e-5, min_lr=1e-5)
    sched = optim.warmup_linear_nonzero(2e-5, cfg)
    # late decay floors at min_lr, never zero
    assert float(sched(195000)) == pytest.approx(1e-5)
    assert float(sched(10**6)) == pytest.approx(1e-5)


def test_multisteps_schedule_scale():
    """With batch_multiply=k the schedule must advance k micro-steps per real
    update (the reference calls scheduler.step() every micro-batch,
    train.py:463): the inner schedule is evaluated at update_count * k."""
    k = 4
    cfg = optim.OptimConfig(lr=1e-3, warmup_steps=100, t_total=1000,
                            min_lr=1e-9, batch_multiply=k)
    sched = optim.warmup_linear_nonzero(1e-3, cfg, step_scale=k)
    for updates_done in [0, 10, 25, 100]:
        np.testing.assert_allclose(
            float(sched(updates_done)),
            ref_lr(updates_done * k, 1e-3, warmup=100, t_total=1000,
                   min_lr=1e-9), rtol=1e-6)

    # and the accumulating optimizer only changes params every k micro-steps
    cfg = optim.OptimConfig(lr=1e-3, warmup_steps=1, t_total=1000,
                            min_lr=1e-9, batch_multiply=k)
    params = {"w": jnp.ones((4,))}
    tx = optim.make_optimizer(params, cfg)
    state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    p = params
    changed_at = []
    for i in range(1, 2 * k + 1):
        updates, state = tx.update(grads, state, p)
        p2 = optax.apply_updates(p, updates)
        if not np.allclose(np.asarray(p2["w"]), np.asarray(p["w"])):
            changed_at.append(i)
        p = p2
    # the first real update (count 0) applies lr(0) ~ min_lr, invisible at
    # allclose tolerance; all visible changes land on multiples of k
    assert changed_at and all(c % k == 0 for c in changed_at), changed_at


def test_group_lrs_applied():
    """lang vs img params get their own lr."""
    cfg = optim.OptimConfig(lr=1e-2, image_lr=1e-3, warmup_steps=1,
                            t_total=10**9, min_lr=0.0)
    params = {
        "bert": {"embeddings": {"word_embeddings": jnp.ones((4, 2))},
                 "t_pooler": {"dense": {"kernel": jnp.ones((2, 2)),
                                        "bias": jnp.zeros((2,))}}},
    }
    lang = ["bert_pretrained.bert.embeddings.word_embeddings.weight"]
    tx = optim.make_optimizer(params, cfg, lang)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # step twice so warmup factor is 1
    updates, state = tx.update(grads, state, params)
    updates, state = tx.update(grads, state, params)
    lang_up = float(jnp.abs(
        updates["bert"]["embeddings"]["word_embeddings"]).mean())
    img_up = float(jnp.abs(
        updates["bert"]["t_pooler"]["dense"]["kernel"]).mean())
    assert lang_up > 5 * img_up   # 1e-2 vs 1e-3 (adam-normalised grads ~1)


def test_mu_bf16_moments_track_fp32_loss_curve():
    """-adam_mu_dtype bfloat16: the halved-traffic first moment must not
    change the optimization trajectory beyond bf16 rounding — loss curves on
    the overfit set stay within 2% of fp32 moments."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tests.test_model import TINY, make_batch
    from unimm_tpu.models import vilbert
    from unimm_tpu.train import optim as O, step as tstep

    cfg = TINY
    params0 = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    B, L = 4, cfg.max_seq_len
    batch = make_batch(rng, cfg, B=B)
    labels = np.full((B, L), -1, np.int32)
    labels[:, 12:18] = rng.integers(0, cfg.vocab_size, (B, 6))
    batch.update({
        "mlm_labels": jnp.asarray(labels),
        "lm_weight": jnp.asarray((labels != -1).astype(np.float32)),
        "next_sentence_label": jnp.asarray(rng.integers(0, 2, B)),
        "image_target": jnp.asarray(rng.dirichlet(
            np.ones(cfg.v_target_size),
            (B, cfg.max_regions)).astype(np.float32)),
        "image_label": jnp.asarray(rng.choice([-1, 1],
                                              (B, cfg.max_regions))),
    })

    curves = {}
    for mu_dtype in (None, "bfloat16"):
        ocfg = O.OptimConfig(lr=5e-4, image_lr=5e-4, warmup_steps=1,
                             t_total=1000, mu_dtype=mu_dtype)
        tx = O.make_optimizer(params0, ocfg)
        state = tstep.init_state(params0, tx, seed=0)
        step = tstep.make_train_step(cfg, tx, dtype=jnp.float32,
                                     donate=False)
        losses = []
        for _ in range(25):
            state, m = step(state, batch, jnp.asarray([1.0, 1.0]))
            losses.append(float(m["loss"]))
        curves[str(mu_dtype)] = losses
        if mu_dtype == "bfloat16":
            mu = jax.tree_util.tree_leaves(state["opt_state"])
            assert any(getattr(x, "dtype", None) == jnp.bfloat16
                       for x in mu), "bf16 moments not in the opt state"
    a, b = np.asarray(curves["None"]), np.asarray(curves["bfloat16"])
    assert a[-1] < a[0] * 0.9          # it actually learns
    np.testing.assert_allclose(b, a, rtol=2e-2)


def test_fused_grouped_adamw_equals_multi_transform():
    """The single-pass grouped AdamW (scale_by_adam + per-leaf group
    scaling) must match the original 4-way optax.multi_transform of adamw's
    step for step."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from unimm_tpu import checkpoint as ckpt
    from unimm_tpu.train import optim as O

    rng = np.random.default_rng(0)
    params = {
        "bert": {"embeddings": {"word_embeddings":
                                jnp.asarray(rng.normal(size=(50, 8)),
                                            jnp.float32)},
                 "encoder": {"layer": {"0": {"attention": {"self": {
                     "query": {"kernel": jnp.asarray(
                         rng.normal(size=(8, 8)), jnp.float32),
                         "bias": jnp.zeros(8)}}}}}}},
        "v_pooler": {"dense": {"kernel": jnp.asarray(
            rng.normal(size=(8, 8)), jnp.float32),
            "bias": jnp.zeros(8)}},
    }
    lang = ["bert.embeddings.word_embeddings.weight",
            "bert.encoder.layer.0.attention.self.query.weight",
            "bert.encoder.layer.0.attention.self.query.bias"]
    cfg = O.OptimConfig(lr=1e-3, image_lr=5e-4, warmup_steps=3, t_total=50,
                        weight_decay=0.01)

    lang_set = ckpt.language_param_set(lang)

    def label_tree(tree):
        def rec(node, path):
            if isinstance(node, dict):
                return {k: rec(v, path + (k,)) for k, v in node.items()}
            return ckpt.group_label(path, lang_set)
        return rec(tree, ())

    def adamw(base_lr, wd):
        return optax.adamw(
            learning_rate=O.warmup_linear_nonzero(base_lr, cfg),
            b1=0.9, b2=0.999, eps=cfg.adam_eps, weight_decay=wd)

    tx_old = optax.multi_transform({
        "lang_decay": adamw(cfg.lr, cfg.weight_decay),
        "lang_nodecay": adamw(cfg.lr, 0.0),
        "img_decay": adamw(cfg.image_lr, cfg.weight_decay),
        "img_nodecay": adamw(cfg.image_lr, 0.0),
    }, label_tree(params))
    tx_new = O.make_optimizer(params, cfg, lang)

    s_old, s_new = tx_old.init(params), tx_new.init(params)
    p_old = p_new = params
    for step in range(6):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(step).normal(size=p.shape), p.dtype),
            params)
        u_old, s_old = tx_old.update(g, s_old, p_old)
        u_new, s_new = tx_new.update(g, s_new, p_new)
        p_old = optax.apply_updates(p_old, u_old)
        p_new = optax.apply_updates(p_new, u_new)
    for a, b in zip(jax.tree_util.tree_leaves(p_old),
                    jax.tree_util.tree_leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
