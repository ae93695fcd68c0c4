"""Parity tests for the v2 whole-sub-block Pallas kernels (interpret mode).

Each kernel must match the XLA path in models/vilbert.py within fp32 rounding
(same op order, fp32 LN stats) across dis- and gen-mode descriptors, and the
model-level "pallas_block" attention_impl must agree with "xla" end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import unimm, vilbert
from unimm_tpu.ops import masks
from unimm_tpu.ops import pallas_attention_v2 as v2

import dataclasses

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


def _tiny_batch(rng, cfg, B=4, train=False):
    L, R = cfg.max_seq_len, cfg.max_regions
    batch = {
        "tokens": jnp.asarray(
            rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32)),
        "segments": jnp.asarray(rng.integers(0, 2, (B, L)).astype(np.int32)),
        "mode": jnp.asarray(rng.integers(0, 2, (B,)).astype(np.int32)),
        "ctx_end": jnp.asarray(
            rng.integers(8, 20, (B,)).astype(np.int32)),
        "ans_len": jnp.asarray(rng.integers(2, 5, (B,)).astype(np.int32)),
        "image_feat": jnp.asarray(
            rng.normal(size=(B, R, cfg.v_feature_size)).astype(np.float32)),
        "image_loc": jnp.asarray(
            rng.normal(size=(B, R, 5)).astype(np.float32)),
        "image_mask": jnp.asarray(np.ones((B, R), np.int32)),
    }
    labels = np.full((B, L), -1, np.int32)
    labels[:, 21:26] = rng.integers(0, cfg.vocab_size, (B, 5))
    batch["mlm_labels"] = jnp.asarray(labels)
    if train:
        batch["lm_weight"] = jnp.asarray(
            (labels != -1).astype(np.float32))
        batch["next_sentence_label"] = jnp.asarray(
            rng.integers(0, 2, (B,)).astype(np.int32))
        batch["image_target"] = jnp.asarray(
            rng.random((B, R, cfg.v_target_size)).astype(np.float32))
        batch["image_label"] = jnp.asarray(
            rng.integers(-1, 2, (B, R)).astype(np.int32))
    return batch


def _desc(rng, B, L):
    mode = rng.integers(0, 2, (B,)).astype(np.int32)
    ctx = rng.integers(max(4, L // 8), L - 20, (B,)).astype(np.int32)
    ans = rng.integers(2, 9, (B,)).astype(np.int32)
    return mode, ctx, ans


def test_fused_attention_block_matches_xla():
    B, H, L, D = 6, 4, 64, 32
    HID = H * D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    mode, ctx, ans = _desc(rng, B, L)
    p = vilbert._init_attention(jax.random.PRNGKey(0), HID, 0.02)
    bias = masks.text_self_bias(jnp.asarray(mode), jnp.asarray(ctx),
                                jnp.asarray(ans), L, jnp.float32)
    ref = vilbert.self_attention_block(
        p, x, bias, num_heads=H, attn_drop=0.0, hidden_drop=0.0,
        train=False, rng=None)
    desc = jnp.asarray(np.stack([mode, ctx, ans], axis=-1))
    out = v2.fused_attention_block(x, desc, p, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("act", ["gelu", "relu", "swish"])
def test_fused_ffn_block_matches_xla(act):
    B, L, HID = 4, 32, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    key = jax.random.PRNGKey(1)
    p_inter = {"dense": vilbert._init_linear(key, HID, 4 * HID, 0.02)}
    p_out = {"dense": vilbert._init_linear(
        jax.random.fold_in(key, 1), 4 * HID, HID, 0.02),
        "LayerNorm": vilbert._init_ln(HID)}
    ref = vilbert.ffn_block(p_inter, p_out, x, act=act, hidden_drop=0.0,
                            train=False, rng=None)
    out = v2.fused_ffn_block(x, p_inter, p_out, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_attention_v2_matches_v1_semantics():
    B, H, L, D = 8, 2, 32, 32
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    mode, ctx, ans = _desc(rng, B, L)
    desc = jnp.asarray(np.stack([mode, ctx, ans], axis=-1))
    bias = masks.text_self_bias(jnp.asarray(mode), jnp.asarray(ctx),
                                jnp.asarray(ans), L, jnp.float32)
    import math
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(D) + bias
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    out = v2.attention_v2(q, k, v, desc, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_model_level_pallas_block_matches_xla():
    cfg_x = TINY
    cfg_p = dataclasses.replace(TINY, attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(3), cfg_x)
    batch = _tiny_batch(np.random.default_rng(7), cfg_x, B=4)
    out_x = unimm.forward_eval(params, cfg_x, batch, dtype=jnp.float32)
    out_p = unimm.forward_eval(params, cfg_p, batch, dtype=jnp.float32)
    for k in out_x:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_x[k]),
                                   rtol=1e-6, atol=1e-6)


def test_pallas_block_training_falls_back_and_differentiates():
    # attention dropout > 0 on CPU cannot use the differentiable block
    # kernel (pltpu PRNG has no interpret lowering) — the XLA fallback
    # chain must engage and still produce finite grads
    cfg = dataclasses.replace(TINY, attention_impl="pallas_block",
                              attention_probs_dropout_prob=0.1)
    params = vilbert.init_params(jax.random.PRNGKey(4), cfg)
    batch = _tiny_batch(np.random.default_rng(8), cfg, B=2, train=True)

    def loss_fn(p):
        losses = unimm.forward_train(p, cfg, batch,
                                     rng=jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        return losses["lm"] + losses["img"] + losses["nsp"]

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)


def test_pallas_block_under_sharded_evaluator():
    """pallas_block must compose with the dp-sharded mesh evaluator (the CLI
    default is pallas_block; -n_gpus > 1 eval goes through this path)."""
    from tests.test_evaluator import make_val_batch
    from unimm_tpu.data.dataset import flatten_for_forward
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = pmesh.make_mesh(4, mp=1)
    cfg = dataclasses.replace(TINY, attention_impl="pallas_block")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    params, _ = pmesh.shard_params(params, mesh)
    batch = make_val_batch(np.random.default_rng(0), TINY)
    flat = flatten_for_forward(batch, train=False, compact_images=True)
    out = RankingEvaluator(cfg, chunk_size=8, need_nsp=False,
                           mesh=mesh).score_flat(params, flat)
    params_x, _ = pmesh.shard_params(
        vilbert.init_params(jax.random.PRNGKey(0), TINY), mesh)
    out_x = RankingEvaluator(TINY, chunk_size=8, need_nsp=False,
                             mesh=mesh).score_flat(params_x, flat)
    np.testing.assert_allclose(out["ll_sum"], out_x["ll_sum"],
                               rtol=2e-2, atol=2e-2)


def _grad_tree(cfg, params, batch, rng):
    def loss_fn(p):
        losses = unimm.forward_train(p, cfg, batch, rng=rng,
                                     dtype=jnp.float32)
        return losses["lm"] + losses["img"] + losses["nsp"]
    return jax.value_and_grad(loss_fn)(params)


def test_pallas_block_train_grads_match_xla():
    """With every dropout off the differentiable block kernel must reproduce
    the XLA path's training gradients to fp32 rounding."""
    kw = dict(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
              v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)
    cfg_x = dataclasses.replace(TINY, **kw)
    cfg_p = dataclasses.replace(TINY, attention_impl="pallas_block", **kw)
    params = vilbert.init_params(jax.random.PRNGKey(5), cfg_x)
    batch = _tiny_batch(np.random.default_rng(9), cfg_x, B=3, train=True)
    rng = jax.random.PRNGKey(2)
    v_x, g_x = _grad_tree(cfg_x, params, batch, rng)
    v_p, g_p = _grad_tree(cfg_p, params, batch, rng)
    assert abs(float(v_x) - float(v_p)) < 1e-4
    flat_x, tree = jax.tree_util.tree_flatten(g_x)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_block_train_hidden_dropout_cpu():
    """attn dropout needs the TPU PRNG, but the hidden-dropout site (external
    hardware-RNG scale mask) must work and be rng-deterministic on CPU."""
    cfg = dataclasses.replace(
        TINY, attention_impl="pallas_block",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.1)
    params = vilbert.init_params(jax.random.PRNGKey(6), cfg)
    batch = _tiny_batch(np.random.default_rng(10), cfg, B=2, train=True)
    rng = jax.random.PRNGKey(3)
    v1, g1 = _grad_tree(cfg, params, batch, rng)
    v2_, g2 = _grad_tree(cfg, params, batch, rng)
    assert float(v1) == float(v2_)          # same rng -> same masks
    assert np.isfinite(float(v1))
    v3, _ = _grad_tree(cfg, params, batch, jax.random.PRNGKey(4))
    assert float(v3) != float(v1)           # different rng -> different masks
    for leaf in jax.tree_util.tree_leaves(g1):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_fused_block_fuzz_shapes():
    """Fused attention block vs XLA chain across random shapes and edge-case
    descriptors (dis/gen, ans_len 0, truncated gen layouts)."""
    rng = np.random.default_rng(42)
    for trial in range(6):
        H = int(rng.choice([2, 4]))
        D = int(rng.choice([16, 32]))
        L = int(rng.choice([32, 64]))
        B = int(rng.integers(2, 5))
        HID = H * D
        x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
        mode = rng.integers(0, 2, (B,)).astype(np.int32)
        ctx = rng.integers(4, L - 2, (B,)).astype(np.int32)
        ans = np.where(mode == 1,
                       rng.integers(0, L // 2, (B,)), 0).astype(np.int32)
        if trial == 0:      # truncated gen: ctx+2*(ans+1) > L
            mode[:] = 1
            ctx[:] = L - 4
            ans[:] = L // 2
        p = vilbert._init_attention(
            jax.random.PRNGKey(100 + trial), HID, 0.02)
        bias = masks.text_self_bias(jnp.asarray(mode), jnp.asarray(ctx),
                                    jnp.asarray(ans), L, jnp.float32)
        ref = vilbert.self_attention_block(
            p, x, bias, num_heads=H, attn_drop=0.0, hidden_drop=0.0,
            train=False, rng=None)
        desc = jnp.asarray(np.stack([mode, ctx, ans], axis=-1))
        out = v2.fused_attention_block(x, desc, p, num_heads=H,
                                       interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-6,
            err_msg=f"trial {trial} H={H} D={D} L={L} B={B}")


def test_fused_co_text_block_matches_xla():
    """Text-side co-attention sub-block kernel vs the XLA connection-layer
    path (q2 attends k1/v1 under the image-padding bias + dense2 + LN2)."""
    B, H, L, R = 3, 2, 32, 5
    BI, HT, HV = 2 * 16, 24, 20
    rng = np.random.default_rng(3)
    t_x = jnp.asarray(rng.normal(size=(B, L, HT)), jnp.float32)
    v_x = jnp.asarray(rng.normal(size=(B, R, HV)), jnp.float32)
    imask = np.ones((B, R), np.int32)
    imask[:, -1] = 0
    key = jax.random.PRNGKey(9)
    p_conn = {
        "biattention": {
            "query2": vilbert._init_linear(key, HT, BI, 0.02),
            "key1": vilbert._init_linear(jax.random.fold_in(key, 1),
                                         HV, BI, 0.02),
            "value1": vilbert._init_linear(jax.random.fold_in(key, 2),
                                           HV, BI, 0.02),
        },
        "biOutput": {
            "dense2": vilbert._init_linear(jax.random.fold_in(key, 3),
                                           BI, HT, 0.02),
            "LayerNorm2": vilbert._init_ln(HT),
        },
    }
    # XLA reference path (mirrors connection_layer's text side)
    from unimm_tpu.ops import masks as M
    v_bias = M.image_self_bias(jnp.asarray(imask), jnp.float32)
    q2 = vilbert._split_heads(
        vilbert.linear(p_conn["biattention"]["query2"], t_x), H)
    k1 = vilbert._split_heads(
        vilbert.linear(p_conn["biattention"]["key1"], v_x), H)
    v1 = vilbert._split_heads(
        vilbert.linear(p_conn["biattention"]["value1"], v_x), H)
    ctx = vilbert._merge_heads(vilbert.attention_core(
        q2, k1, v1, v_bias, drop_rate=0.0, train=False, rng=None))
    t_h = vilbert.linear(p_conn["biOutput"]["dense2"], ctx)
    ref = vilbert.layer_norm(p_conn["biOutput"]["LayerNorm2"], t_h + t_x)

    out = v2.fused_co_text_block(t_x, v_x, jnp.asarray(imask), p_conn,
                                 num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)


@pytest.mark.parametrize("shape", [(3, 2, 32, 16), (2, 4, 64, 16),
                                   (5, 2, 48, 32)])
def test_train_vjp_grads_fuzz_shapes(shape):
    """Direct grad parity of fused_attention_block_train vs the XLA chain
    (dropout off) over head-count/head-dim/length variations."""
    B, H, L, D = shape
    HID = H * D
    rng = np.random.default_rng(hash(shape) % 2 ** 31)
    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    mode, ctx, ans = _desc(rng, B, L)
    desc = jnp.asarray(np.stack([mode, ctx, ans], axis=-1))
    seed = jnp.array([3], jnp.int32)
    m_o = jnp.ones((B, L, HID), jnp.float32)
    p = vilbert._init_attention(jax.random.PRNGKey(L + H), HID, 0.02)
    bias = masks.text_self_bias(jnp.asarray(mode), jnp.asarray(ctx),
                                jnp.asarray(ans), L, jnp.float32)

    def ref_fn(x, p):
        out = vilbert.self_attention_block(
            p, x, bias, num_heads=H, attn_drop=0.0, hidden_drop=0.0,
            train=False, rng=None)
        return jnp.sum(out * jnp.sin(out))

    def fused_fn(x, p):
        ps, po = p["self"], p["output"]
        out = v2.fused_attention_block_train(
            H, 0.0, True, x, desc, seed, m_o,
            ps["query"]["kernel"], ps["query"]["bias"],
            ps["key"]["kernel"], ps["key"]["bias"],
            ps["value"]["kernel"], ps["value"]["bias"],
            po["dense"]["kernel"], po["dense"]["bias"],
            po["LayerNorm"]["weight"], po["LayerNorm"]["bias"])
        return jnp.sum(out * jnp.sin(out))

    (v_r, g_r), (v_f, g_f) = (jax.value_and_grad(f, argnums=(0, 1))(x, p)
                              for f in (ref_fn, fused_fn))
    # the loss is an unnormalized fp32 sum over B*L*HID elements — compare
    # relative to its magnitude, not absolutely
    assert abs(float(v_r) - float(v_f)) < 1e-5 * max(1.0, abs(float(v_r)))
    for a, b in zip(jax.tree_util.tree_leaves(g_r[1]),
                    jax.tree_util.tree_leaves(g_f[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(g_r[0]), np.asarray(g_f[0]),
                               rtol=5e-5, atol=5e-5)
