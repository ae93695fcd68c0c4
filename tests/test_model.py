"""Model behaviour tests on a tiny config: shapes, determinism, weight tying,
and the answer-hiding causality invariants that the generative mask layout
must guarantee end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import unimm, vilbert

TINY = VilbertConfig(
    attention_impl="xla",  # these tests exercise/are the XLA oracle path
    vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, max_position_embeddings=64,
    v_feature_size=16, v_target_size=11, v_hidden_size=24,
    v_num_hidden_layers=2, v_num_attention_heads=2, v_intermediate_size=48,
    bi_hidden_size=16, bi_num_attention_heads=2,
    v_biattention_id=(1,), t_biattention_id=(1,),
    max_seq_len=32, max_regions=5,
)


def make_batch(rng, cfg, B=3, gen=True):
    L, R = cfg.max_seq_len, cfg.max_regions
    tokens = rng.integers(1, cfg.vocab_size, size=(B, L)).astype(np.int32)
    segments = rng.integers(0, 2, size=(B, L)).astype(np.int32)
    if gen:
        mode = np.ones(B, np.int32)
        ctx_end = np.full(B, 20, np.int32)
        ans_len = np.full(B, 5, np.int32)
    else:
        mode = np.zeros(B, np.int32)
        ctx_end = np.full(B, 20, np.int32)
        ans_len = np.zeros(B, np.int32)
    feat = rng.normal(size=(B, R, cfg.v_feature_size)).astype(np.float32)
    loc = rng.normal(size=(B, R, 5)).astype(np.float32)
    imask = np.ones((B, R), np.int32)
    imask[:, -1] = 0
    return {
        "tokens": jnp.asarray(tokens), "segments": jnp.asarray(segments),
        "mode": jnp.asarray(mode), "ctx_end": jnp.asarray(ctx_end),
        "ans_len": jnp.asarray(ans_len),
        "image_feat": jnp.asarray(feat), "image_loc": jnp.asarray(loc),
        "image_mask": jnp.asarray(imask),
    }


@pytest.fixture(scope="module")
def params():
    return vilbert.init_params(jax.random.PRNGKey(0), TINY)


def test_shapes_and_determinism(params):
    rng = np.random.default_rng(0)
    batch = make_batch(rng, TINY)
    t_seq, v_seq, pooled_t, pooled_v = unimm.encode(params, TINY, batch)
    B, L, R = 3, TINY.max_seq_len, TINY.max_regions
    assert t_seq.shape == (B, L, TINY.hidden_size)
    assert v_seq.shape == (B, R, TINY.v_hidden_size)
    assert pooled_t.shape == (B, TINY.bi_hidden_size)
    assert pooled_v.shape == (B, TINY.bi_hidden_size)
    # eval path is deterministic
    t2, *_ = unimm.encode(params, TINY, batch)
    np.testing.assert_array_equal(np.asarray(t_seq), np.asarray(t2))
    assert np.isfinite(np.asarray(t_seq)).all()


def test_dropout_active_in_train(params):
    rng = np.random.default_rng(1)
    batch = make_batch(rng, TINY)
    k = jax.random.PRNGKey(42)
    t1, *_ = unimm.encode(params, TINY, batch, train=True, rng=k)
    t2, *_ = unimm.encode(params, TINY, batch, train=True,
                          rng=jax.random.PRNGKey(43))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # same rng -> same output
    t3, *_ = unimm.encode(params, TINY, batch, train=True, rng=k)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t3))


def test_gen_mode_hides_answer_from_image_stream(params):
    """Changing answer tokens (both copies) must not change the vision-stream
    output in generative mode: the co-attention mask hides [CLS] and the
    answer region from image-attends-text (data_utils.py:210,
    vilbert_dialog.py:708), and nothing the image attends can see the answer."""
    rng = np.random.default_rng(2)
    batch = make_batch(rng, TINY, gen=True)
    _, v1, _, pv1 = unimm.encode(params, TINY, batch)

    ctx_end, ans_len = 20, 5
    toks = np.asarray(batch["tokens"]).copy()
    # perturb first answer copy [Lc, L1) and masked copy [L1, L1+A)
    toks[:, ctx_end - ans_len: ctx_end + ans_len] = (
        toks[:, ctx_end - ans_len: ctx_end + ans_len] % 50) + 1
    batch2 = dict(batch, tokens=jnp.asarray(toks))
    _, v2, _, pv2 = unimm.encode(params, TINY, batch2)

    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pv1), np.asarray(pv2), atol=1e-6)


def test_gen_mode_autoregressive_property(params):
    """Hidden state at masked-copy position for answer token j must not
    depend on true answer tokens at indices >= j (strictly-causal rows,
    data_utils.py:205-209)."""
    rng = np.random.default_rng(3)
    batch = make_batch(rng, TINY, B=1, gen=True)
    ctx_end, ans_len = 20, 5
    t1, *_ = unimm.encode(params, TINY, batch)

    j = 2  # check masked position for answer index 2; perturb tokens k >= 2
    toks = np.asarray(batch["tokens"]).copy()
    first_copy_start = ctx_end - ans_len
    toks[:, first_copy_start + j: ctx_end] = (
        toks[:, first_copy_start + j: ctx_end] % 40) + 7
    t2, *_ = unimm.encode(params, TINY, dict(batch, tokens=jnp.asarray(toks)))

    masked_rows = np.asarray(t1)[:, ctx_end: ctx_end + j + 1]
    masked_rows2 = np.asarray(t2)[:, ctx_end: ctx_end + j + 1]
    np.testing.assert_allclose(masked_rows, masked_rows2, atol=1e-6)
    # ...but later masked positions DO see the change
    later = np.asarray(t1)[:, ctx_end + j + 1: ctx_end + ans_len]
    later2 = np.asarray(t2)[:, ctx_end + j + 1: ctx_end + ans_len]
    assert not np.allclose(later, later2, atol=1e-6)


def test_dis_mode_padding_invariance(params):
    """In discriminative mode tokens beyond ctx_end are padding; changing
    them must not affect real rows or pooled outputs."""
    rng = np.random.default_rng(4)
    batch = make_batch(rng, TINY, gen=False)
    t1, v1, p1, pv1 = unimm.encode(params, TINY, batch)
    toks = np.asarray(batch["tokens"]).copy()
    toks[:, 20:] = 9
    t2, v2, p2, pv2 = unimm.encode(params, TINY,
                                   dict(batch, tokens=jnp.asarray(toks)))
    np.testing.assert_allclose(np.asarray(t1[:, :20]), np.asarray(t2[:, :20]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_weight_tying(params):
    """MLM decoder must be tied to word embeddings (vilbert_dialog.py:1020):
    scaling the embedding table must scale MLM logits accordingly."""
    rng = np.random.default_rng(5)
    batch = make_batch(rng, TINY, B=1)
    batch["mlm_labels"] = jnp.where(
        jnp.arange(TINY.max_seq_len)[None, :] < 4, 5, -1)

    out1 = unimm.forward_eval(params, TINY, batch, dtype=jnp.float32,
                              need_nsp=False)
    import copy
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2 = copy.deepcopy(jax.device_get(p2))
    p2["bert"]["embeddings"]["word_embeddings"] = (
        p2["bert"]["embeddings"]["word_embeddings"] * 1.5)
    p2 = jax.tree_util.tree_map(jnp.asarray, p2)
    out2 = unimm.forward_eval(p2, TINY, batch, dtype=jnp.float32,
                              need_nsp=False)
    # embeddings changed -> encoder outputs change -> nll changes; the point
    # is that the decoder path reflects the SAME tensor (no separate weight)
    assert not np.allclose(np.asarray(out1["lm_nll_sum"]),
                           np.asarray(out2["lm_nll_sum"]))


def test_train_losses_finite(params):
    rng = np.random.default_rng(6)
    cfg = TINY
    batch = make_batch(rng, cfg)
    B, L, R = 3, cfg.max_seq_len, cfg.max_regions
    labels = np.full((B, L), -1, np.int32)
    labels[:, 21:24] = rng.integers(0, cfg.vocab_size, size=(B, 3))
    w = np.zeros((B, L), np.float32)
    w[:, 21:24] = 1.0
    w[2, 21:24] = -1.0
    batch.update({
        "mlm_labels": jnp.asarray(labels),
        "lm_weight": jnp.asarray(w),
        "next_sentence_label": jnp.asarray(np.array([0, 1, 1])),
        "image_target": jnp.asarray(
            rng.dirichlet(np.ones(cfg.v_target_size), size=(B, R))
            .astype(np.float32)),
        "image_label": jnp.asarray(
            rng.choice([-1, 0, 1], size=(B, R)).astype(np.int32)),
    })
    out = unimm.forward_train(params, cfg, batch, rng=jax.random.PRNGKey(0),
                              nsp_weight=jnp.asarray([5.0, 1.0]),
                              dtype=jnp.float32)
    for k, v in out.items():
        assert np.isfinite(float(v)), k


def test_label_positions_static_gather():
    labels = jnp.asarray(
        [[-1, -1, 7, -1, 9, 3, -1, -1],
         [1, -1, -1, -1, -1, -1, -1, 2]])
    pos, labs = unimm.label_positions(labels, max_positions=4)
    np.testing.assert_array_equal(np.asarray(pos[0]), [2, 4, 5, 0])
    np.testing.assert_array_equal(np.asarray(labs[0]), [7, 9, 3, -1])
    np.testing.assert_array_equal(np.asarray(pos[1]), [0, 7, 1, 2])
    np.testing.assert_array_equal(np.asarray(labs[1]), [1, 2, -1, -1])
