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


def test_fused_kernel_matches_grouped():
    """The fused per-leaf AdamW (make_fused_optimizer + the single-pass
    Pallas kernel, interpret mode on CPU) must match make_optimizer step
    for step — same moments, bias correction, group lr/wd, decay — both
    plain and wrapped in optax.MultiSteps."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from unimm_tpu.train import optim as O

    rng = np.random.default_rng(1)
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
    for k in (1, 3):
        cfg = O.OptimConfig(lr=1e-3, image_lr=5e-4, warmup_steps=3,
                            t_total=50, weight_decay=0.01, batch_multiply=k)
        tx_ref = O.make_optimizer(params, cfg, lang)
        tx_fused = O.make_fused_optimizer(params, cfg, lang)
        s_ref, s_f = tx_ref.init(params), tx_fused.init(params)
        p_ref = p_f = params
        for step in range(6):
            g = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    np.random.default_rng(step).normal(size=p.shape),
                    p.dtype), params)
            u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
            u_f, s_f = tx_fused.update(g, s_f, p_f)
            p_ref = optax.apply_updates(p_ref, u_ref)
            p_f = optax.apply_updates(p_f, u_f)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_f)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"batch_multiply={k}")


def test_fused_state_is_grouped_state_shape():
    """The fused optimizer's state is LITERALLY the grouped optimizer's
    state tree — (ScaleByAdamState, ScaleByScheduleState) — so every
    checkpoint path (graft, extract, Orbax native, fused<->grouped
    resume) works unchanged."""
    import jax
    import optax

    from unimm_tpu.models import vilbert
    from unimm_tpu.train import optim as O
    from tests.test_model import TINY

    params = vilbert.init_params(jax.random.PRNGKey(0), TINY)
    cfg = O.OptimConfig(lr=1e-3, image_lr=5e-4)
    s_f = O.make_fused_optimizer(params, cfg).init(params)
    s_g = O.make_optimizer(params, cfg).init(params)
    assert isinstance(s_f[0], optax.ScaleByAdamState)
    assert type(s_f[1]).__name__ == "ScaleByScheduleState"
    # same treedef as the grouped chain's state (moments leaf-shaped)
    assert (jax.tree_util.tree_structure(s_f)
            == jax.tree_util.tree_structure(s_g))


def test_fused_ckpt_roundtrip_and_cross_compat():
    """Fused-state checkpoints interoperate with the grouped optimizer
    through the reference 4-key .ckpt format: fused -> file -> fused
    restores moments + counts exactly, and fused -> file -> GROUPED lands
    the same moments in the ScaleByAdamState tree (the torch format is the
    common currency, reference train.py:371-386)."""
    import os
    import tempfile

    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimm_tpu import checkpoint as C
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.models import vilbert
    from unimm_tpu.train import optim as O

    from tests.test_model import TINY

    params = vilbert.init_params(jax.random.PRNGKey(3), TINY)
    cfg = O.OptimConfig(lr=1e-3, image_lr=5e-4, warmup_steps=3, t_total=50)
    tx_f = O.make_fused_optimizer(params, cfg)
    s = tx_f.init(params)
    p = params
    for step in range(2):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.default_rng(step).normal(size=x.shape), x.dtype),
            params)
        u, s = tx_f.update(g, s, p)
        import optax
        p = optax.apply_updates(p, u)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "visdial_dialog_encoder_2.ckpt")
        C.save_reference_ckpt(path, jax.device_get(p), 2,
                              opt_state=jax.device_get(s))

        # fused -> fused
        p2, s2, it, _ = C.load_reference_train_state(
            path, jax.device_get(params), tx_f)
        assert it == 2
        for a, b in zip(jax.tree_util.tree_leaves(s2[0].mu),
                        jax.tree_util.tree_leaves(s[0].mu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(s2[0].nu),
                        jax.tree_util.tree_leaves(s[0].nu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)
        assert int(np.asarray(s2[0].count)) == 2

        # fused -> grouped (cross-compat through the torch format)
        tx_g = O.make_optimizer(params, cfg)
        _, sg, _, _ = C.load_reference_train_state(
            path, jax.device_get(params), tx_g)
        mu_g, nu_g, cnt = C.extract_adam_moments(sg, params)
        mu_f, nu_f, _ = C.extract_adam_moments(s, params)
        assert cnt == 2
        for a, b in zip(jax.tree_util.tree_leaves(mu_g),
                        jax.tree_util.tree_leaves(mu_f)):
            np.testing.assert_allclose(a, b, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(nu_g),
                        jax.tree_util.tree_leaves(nu_f)):
            np.testing.assert_allclose(a, b, atol=1e-7)


def test_fused_train_step_matches_grouped():
    """One full donated train step (fwd+bwd+update in one jit) on the fused
    optimizer equals the grouped optimizer's step bit-for-bit in fp32
    (dropout zeroed; same grads feed mathematically identical updates)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimm_tpu.train import optim as O, step as tstep
    from tests.test_model import TINY, make_batch

    cfg = dataclasses.replace(
        TINY, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
        head_dropout_prob=0.0)
    from unimm_tpu.models import vilbert
    params = vilbert.init_params(jax.random.PRNGKey(4), cfg)
    ocfg = O.OptimConfig(lr=1e-3, image_lr=5e-4, warmup_steps=3, t_total=50)
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

    outs = {}
    for kind, tx in (("grouped", O.make_optimizer(params, ocfg)),
                     ("fused", O.make_fused_optimizer(params, ocfg))):
        step_fn = tstep.make_train_step(cfg, tx, dtype=jnp.float32,
                                        donate=False)
        state = tstep.init_state(params, tx, seed=0)
        for _ in range(2):
            state, metrics = step_fn(state, batch)
        outs[kind] = (jax.device_get(state["params"]),
                      float(np.asarray(metrics["loss"])))
    assert np.isfinite(outs["fused"][1])
    for a, b in zip(jax.tree_util.tree_leaves(outs["grouped"][0]),
                    jax.tree_util.tree_leaves(outs["fused"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
