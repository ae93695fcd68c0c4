"""TPU-native ViLBERT two-stream co-attention encoder (UniMM-UL core model).

A from-scratch functional JAX implementation with the same computational
semantics as the reference PyTorch model
(/root/reference/models/vilbert_dialog.py: BertModel :1299, BertEncoder :786,
BertBiAttention :615, BertForMultiModalPreTraining :1496), designed for XLA:

* pure functions over an explicit parameter pytree (nested dicts whose
  structure mirrors the reference ``state_dict`` names, so checkpoint
  conversion is a mechanical key/transpose map);
* dense compute stays in large batched einsum/matmul form for the MXU;
* attention masks arrive as additive biases already built on device from
  compact descriptors (see unimm_tpu/ops/masks.py) — never shipped from host;
* dropout is explicit (rng + ``train`` flag); the eval path is deterministic;
* mixed precision via ``dtype`` (bf16 on TPU) with fp32 LayerNorm/softmax.

Layer order for the shipped 6-connection config replicates the reference
interleave (vilbert_dialog.py:842-930):
t0..t5, [co0, v0, t6], [co1, v1, t7], ..., [co5, v5, t11]  — i.e. six text
layers first, then alternating co-attention / vision / text blocks, finishing
with v5 and t11 after the final connection.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# small building blocks
# ---------------------------------------------------------------------------

class _Rng:
    """Deterministic per-site rng splitter for dropout under jit."""

    def __init__(self, rng: Optional[jax.Array]):
        self._rng = rng
        self._i = 0

    def next(self) -> jax.Array:
        assert self._rng is not None, "rng required when train=True"
        k = jax.random.fold_in(self._rng, self._i)
        self._i += 1
        return k


def gelu(x):
    """erf-based gelu (vilbert_dialog.py:115-121) in fp32; the tanh
    approximation in bf16 — their max difference (~3e-3 near |x|=2) is below
    bf16 rounding at those magnitudes, and the exact erf costs ~17% of the
    whole encoder on the TPU VPU (measured: 418 -> 346 ms per 512-seq eval
    batch on v5e)."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def cast_floating(tree, dtype):
    """Cast floating-point leaves to the compute dtype (bf16 on TPU) so every
    matmul feeds the MXU at full rate; LayerNorm/softmax still accumulate in
    fp32 internally."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


ACT = {"gelu": gelu, "relu": jax.nn.relu, "swish": jax.nn.swish}


def linear(p: Params, x):
    return jnp.matmul(x, p["kernel"]) + p["bias"]


def layer_norm(p: Params, x, eps: float = 1e-12):
    # fp32 statistics regardless of compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def dropout_scale_mask(key, shape, rate: float, dtype):
    """Bernoulli(1-rate) scale mask (values 0 or 1/keep) from the hardware
    RNG — shared by ``dropout`` and the fused-kernel training path (which
    applies the hidden-dropout mask inside the Pallas kernel)."""
    keep = 1.0 - rate
    k = jnp.asarray(jax.random.key_data(key), jnp.uint32).reshape(-1)
    k = jnp.concatenate([k, k])[:4]
    _, bits = jax.lax.rng_bit_generator(k, shape, dtype=jnp.uint32)
    thresh = jnp.uint32(min(int(keep * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits < thresh,
                     jnp.asarray(1.0 / keep, dtype),
                     jnp.asarray(0.0, dtype))


def dropout(x, rate: float, train: bool, rng: _Rng):
    """Inverted dropout with masks drawn from the hardware RNG.

    jax.random.bernoulli (threefry) costs ~36% of the whole flagship train
    step on TPU (measured: 1176 -> 757 ms/step with dropout off, B=240 —
    scripts/bench_train.py; remat recomputes the masks in the backward pass,
    doubling the RNG bill). lax.rng_bit_generator lowers to the TPU's native
    RNG instead, keyed deterministically from the same per-site threefry key,
    so remat still regenerates identical masks. The mask distribution is
    Bernoulli(keep) either way; streams differ from the reference by design
    (SURVEY §7 RNG parity: stochastic paths are statistical, not bitwise).
    """
    if not train or rate == 0.0:
        return x
    mask = dropout_scale_mask(rng.next(), x.shape, rate,
                              jnp.promote_types(x.dtype, jnp.float32))
    return (x * mask).astype(x.dtype)


def dropout_seed(rng: _Rng):
    """Scalar int32 seed for in-kernel (pltpu) dropout streams."""
    return jax.random.randint(rng.next(), (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)


def _split_heads(x, num_heads: int):
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def attention_core(q, k, v, bias, *, drop_rate, train, rng):
    """Softmax attention over pre-split heads; bias is additive ([.,1|H,S,S])."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    probs = dropout(probs, drop_rate, train, rng)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# transformer blocks (shared by text and vision streams)
# ---------------------------------------------------------------------------

def self_attention_block(p: Params, x, bias, *, num_heads, attn_drop, hidden_drop,
                         train, rng, fused_attn=None, fused_block=None,
                         fused_block_train=None):
    """BertAttention: self-attention + output projection/LN residual.

    ``fused_attn`` (q, k, v) -> ctx replaces the bias-based XLA attention with
    the Pallas kernel that regenerates the mask in-kernel. ``fused_block``
    (p, x) -> out replaces the ENTIRE block (projections, attention, output
    dense, residual+LN) with the one-pass Pallas kernel
    (ops/pallas_attention_v2.fused_attention_block); ``fused_block_train``
    (p, x, rng) -> out is its differentiable variant with both training
    dropout sites."""
    if fused_block_train is not None:
        return fused_block_train(p, x, rng)
    if fused_block is not None:
        return fused_block(p, x)
    ps = p["self"]
    q = _split_heads(linear(ps["query"], x), num_heads)
    k = _split_heads(linear(ps["key"], x), num_heads)
    v = _split_heads(linear(ps["value"], x), num_heads)
    if fused_attn is not None:
        ctx = _merge_heads(fused_attn(q, k, v))
    else:
        ctx = _merge_heads(attention_core(
            q, k, v, bias, drop_rate=attn_drop, train=train, rng=rng))
    po = p["output"]
    h = dropout(linear(po["dense"], ctx), hidden_drop, train, rng)
    return layer_norm(po["LayerNorm"], h + x)


def ffn_block(p_inter: Params, p_out: Params, x, *, act, hidden_drop, train, rng,
              fused_ffn=None):
    """BertIntermediate + BertOutput. ``fused_ffn`` (p_inter, p_out, x) -> out
    replaces the chain with the one-pass Pallas kernel."""
    if fused_ffn is not None:
        return fused_ffn(p_inter, p_out, x)
    h = ACT[act](linear(p_inter["dense"], x))
    h = dropout(linear(p_out["dense"], h), hidden_drop, train, rng)
    return layer_norm(p_out["LayerNorm"], h + x)


def encoder_layer(p: Params, x, bias, *, num_heads, act, attn_drop, hidden_drop,
                  train, rng, fused_attn=None, fused_block=None, fused_ffn=None,
                  fused_block_train=None):
    """BertLayer / BertImageLayer (vilbert_dialog.py:472-483, :601-612)."""
    attn_out = self_attention_block(
        p["attention"], x, bias, num_heads=num_heads, attn_drop=attn_drop,
        hidden_drop=hidden_drop, train=train, rng=rng, fused_attn=fused_attn,
        fused_block=fused_block, fused_block_train=fused_block_train)
    return ffn_block(p["intermediate"], p["output"], attn_out, act=act,
                     hidden_drop=hidden_drop, train=train, rng=rng,
                     fused_ffn=fused_ffn)


def connection_layer(p: Params, cfg: VilbertConfig, v_x, v_bias, t_x, co_bias, *,
                     train, rng, fused_t_ffn=None, fused_co_text=None):
    """BertConnectionLayer (vilbert_dialog.py:757-783): co-attention + FFNs.

    Replicates BertBiAttention masking exactly (vilbert_dialog.py:655-709):
    text->image scores get only the image padding bias; image->text scores get
    only the co-attention bias (the text padding-mask add is commented out in
    the reference, :706).
    """
    pb = p["biattention"]
    nh = cfg.bi_num_attention_heads
    po = p["biOutput"]

    q1 = _split_heads(linear(pb["query1"], v_x), nh)   # vision
    k2 = _split_heads(linear(pb["key2"], t_x), nh)
    v2 = _split_heads(linear(pb["value2"], t_x), nh)
    # image queries attend text keys/values  (scores2, vilbert_dialog.py:701-721)
    ctx_v_from_t = _merge_heads(attention_core(
        q1, k2, v2, co_bias, drop_rate=cfg.attention_probs_dropout_prob,
        train=train, rng=rng))

    # BertBiOutput with the reference's argument swap (vilbert_dialog.py:775):
    # biOutput(bi_output2, v_x, bi_output1, t_x) — the image-queries-text
    # context (region-length) feeds the VISION residual via dense1, and the
    # text-queries-image context (text-length) feeds the TEXT residual.
    v_h = dropout(linear(po["dense1"], ctx_v_from_t),
                  cfg.v_hidden_dropout_prob, train, rng)
    v_out = layer_norm(po["LayerNorm1"], v_h + v_x)

    if fused_co_text is not None:
        # text-side sub-block (q2 attends k1/v1 + dense2 + residual + LN2)
        # as one Pallas kernel (eval paths)
        t_out = fused_co_text(p, v_x, t_x)
    else:
        q2 = _split_heads(linear(pb["query2"], t_x), nh)   # text
        k1 = _split_heads(linear(pb["key1"], v_x), nh)
        v1 = _split_heads(linear(pb["value1"], v_x), nh)
        # text queries attend image keys/values (scores1, :681-698)
        ctx_t_from_v = _merge_heads(attention_core(
            q2, k1, v1, v_bias, drop_rate=cfg.v_attention_probs_dropout_prob,
            train=train, rng=rng))
        t_h = dropout(linear(po["dense2"], ctx_t_from_v),
                      cfg.hidden_dropout_prob, train, rng)
        t_out = layer_norm(po["LayerNorm2"], t_h + t_x)

    v_out = ffn_block(p["v_intermediate"], p["v_output"], v_out,
                      act=cfg.v_hidden_act,
                      hidden_drop=cfg.v_hidden_dropout_prob, train=train, rng=rng)
    t_out = ffn_block(p["t_intermediate"], p["t_output"], t_out,
                      act=cfg.hidden_act,
                      hidden_drop=cfg.hidden_dropout_prob, train=train, rng=rng,
                      fused_ffn=fused_t_ffn)
    return v_out, t_out


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def text_embeddings(p: Params, cfg: VilbertConfig, input_ids, token_type_ids,
                    position_ids, *, train, rng, dtype):
    """BertEmbeddingsDialog (vilbert_dialog.py:300-356) without the dead
    sinusoid buffer; segment ids >= type_vocab_size route to the 10-entry
    extension table (:337-350)."""
    we = p["word_embeddings"].astype(dtype)[input_ids]
    pe = p["position_embeddings"].astype(dtype)[position_ids]
    ext = token_type_ids - cfg.type_vocab_size
    is_ext = ext >= 0
    base = jnp.where(is_ext, 0, token_type_ids)
    te_base = p["token_type_embeddings"].astype(dtype)[base]
    te_ext = p["token_type_embeddings_extension"].astype(dtype)[
        jnp.where(is_ext, ext, 0)]
    te = jnp.where(is_ext[..., None], te_ext, te_base)
    emb = layer_norm(p["LayerNorm"], we + pe + te)
    return dropout(emb, cfg.hidden_dropout_prob, train, rng)


def image_embeddings(p: Params, cfg: VilbertConfig, features, locations, *,
                     train, rng, dtype):
    """BertImageEmbeddings (vilbert_dialog.py:1475-1493)."""
    emb = linear(p["image_embeddings"], features.astype(dtype)) + linear(
        p["image_location_embeddings"], locations.astype(dtype))
    emb = layer_norm(p["LayerNorm"], emb)
    return dropout(emb, cfg.hidden_dropout_prob, train, rng)


# ---------------------------------------------------------------------------
# encoder + poolers + heads
# ---------------------------------------------------------------------------

def encoder(p: Params, cfg: VilbertConfig, t_x, v_x, t_bias, v_bias, co_bias, *,
            train, rng, text_fused_attn=None, text_fused_block=None,
            text_fused_ffn=None, text_fused_block_train=None,
            text_fused_co=None, tap=None):
    """BertEncoder interleave (vilbert_dialog.py:817-937).

    Supports the reference's optional modes:
    * fixed_t_layer / fixed_v_layer — the frozen prefix runs under no_grad in
      the reference (:850-869); here the equivalent stop_gradient blocks both
      the layer's parameter grads and backprop into the embeddings;
    * in_batch_pairs — before the first co-attention, cross every text
      sequence with every image: batch B -> B^2 (:876-893);
    * fast_mode — broadcast a single text sequence over the image batch
      (:895-899).

    ``tap(kind, idx, x)`` — optional observer called with each text layer's
    input hidden states ("t", layer_idx, t_x) and each connection layer's
    vision-stream input ("c_v", count, v_x). Used by the prefix-cache gen
    scorer (eval/prefix.py) to record the context K/V sources; it never
    alters the computation.
    """
    base_key = rng._rng if isinstance(rng, _Rng) else rng

    def _key(tag):
        return (jax.random.fold_in(base_key, tag)
                if base_key is not None else None)

    def t_fn(lp, x, key):
        return encoder_layer(
            lp, x, t_bias, num_heads=cfg.num_attention_heads,
            act=cfg.hidden_act, attn_drop=cfg.attention_probs_dropout_prob,
            hidden_drop=cfg.hidden_dropout_prob, train=train, rng=_Rng(key),
            fused_attn=text_fused_attn, fused_block=text_fused_block,
            fused_ffn=text_fused_ffn,
            fused_block_train=text_fused_block_train)

    def t_fn_selective(lp, x, key):
        # selective remat for the fused-training path: the attention block's
        # custom VJP already saves cheap residuals (x, ctx, m_o) instead of
        # recomputing the whole sub-block, so only the FFN is checkpointed.
        attn_out = self_attention_block(
            lp["attention"], x, None, num_heads=cfg.num_attention_heads,
            attn_drop=cfg.attention_probs_dropout_prob,
            hidden_drop=cfg.hidden_dropout_prob, train=train, rng=_Rng(key),
            fused_block_train=text_fused_block_train)

        def ffn(lp_, h, k2):
            return ffn_block(lp_["intermediate"], lp_["output"], h,
                             act=cfg.hidden_act,
                             hidden_drop=cfg.hidden_dropout_prob,
                             train=train, rng=_Rng(k2))

        ffn = jax.checkpoint(ffn)
        k2 = (jax.random.fold_in(key, 7777) if key is not None else None)
        return ffn(lp, attn_out, k2)

    def v_fn(lp, x, key):
        return encoder_layer(
            lp, x, v_bias, num_heads=cfg.v_num_attention_heads,
            act=cfg.v_hidden_act,
            attn_drop=cfg.v_attention_probs_dropout_prob,
            hidden_drop=cfg.v_hidden_dropout_prob, train=train, rng=_Rng(key))

    def c_fn(cp, vx, tx, key):
        return connection_layer(cp, cfg, vx, v_bias, tx, co_bias,
                                train=train, rng=_Rng(key),
                                fused_t_ffn=text_fused_ffn,
                                fused_co_text=text_fused_co)

    if cfg.remat:
        t_fn = (t_fn_selective if text_fused_block_train is not None
                else jax.checkpoint(t_fn))
        v_fn = jax.checkpoint(v_fn)
        c_fn = jax.checkpoint(c_fn)

    v_start = t_start = 0
    for count, (v_end, t_end) in enumerate(
            zip(cfg.v_biattention_id, cfg.t_biattention_id)):
        for i in range(v_start, v_end):
            v_x = v_fn(p["v_layer"][str(i)], v_x, _key(100 + i))
            if i < cfg.fixed_v_layer:
                v_x = jax.lax.stop_gradient(v_x)
        for i in range(t_start, t_end):
            if tap is not None:
                tap("t", i, t_x)
            t_x = t_fn(p["layer"][str(i)], t_x, _key(i))
            if i < cfg.fixed_t_layer:
                t_x = jax.lax.stop_gradient(t_x)

        if count == 0 and cfg.in_batch_pairs:
            B = t_x.shape[0]
            # image axis varies fastest for text, slowest for image (:878-893)
            v_x = jnp.repeat(v_x[None], B, axis=0).reshape(
                B * B, *v_x.shape[1:])
            v_bias = jnp.repeat(v_bias[None], B, axis=0).reshape(
                B * B, *v_bias.shape[1:])
            t_x = jnp.repeat(t_x[:, None], B, axis=1).reshape(
                B * B, *t_x.shape[1:])
            t_bias = jnp.repeat(t_bias[:, None], B, axis=1).reshape(
                B * B, *t_bias.shape[1:])
            co_bias = jnp.repeat(co_bias[:, None], B, axis=1).reshape(
                B * B, *co_bias.shape[1:])
        if count == 0 and cfg.fast_mode:
            B = v_x.shape[0]
            t_x = jnp.broadcast_to(t_x, (B,) + t_x.shape[1:])
            t_bias = jnp.broadcast_to(t_bias, (B,) + t_bias.shape[1:])

        if cfg.with_coattention:
            if tap is not None:
                tap("c_v", count, v_x)
            v_x, t_x = c_fn(p["c_layer"][str(count)], v_x, t_x,
                            _key(200 + count))
        v_start, t_start = v_end, t_end
    for i in range(v_start, cfg.v_num_hidden_layers):
        v_x = v_fn(p["v_layer"][str(i)], v_x, _key(100 + i))
    for i in range(t_start, cfg.num_hidden_layers):
        if tap is not None:
            tap("t", i, t_x)
        t_x = t_fn(p["layer"][str(i)], t_x, _key(i))
    return t_x, v_x


def pooler(p: Params, x):
    """First-token pooling -> Linear -> ReLU (vilbert_dialog.py:940-967)."""
    return jax.nn.relu(linear(p["dense"], x[:, 0]))


def bert_model(params: Params, cfg: VilbertConfig, *, input_ids, token_type_ids,
               position_ids, text_bias, image_feat, image_loc, image_bias,
               co_bias, train=False, rng=None, dtype=jnp.float32,
               text_fused_attn=None, text_fused_block=None,
               text_fused_ffn=None, text_fused_block_train=None,
               text_fused_co=None, tap=None):
    """BertModel.forward (vilbert_dialog.py:1359-1472) with biases precomputed.

    Returns (sequence_t, sequence_v, pooled_t, pooled_v).
    """
    r = _Rng(rng)
    params = cast_floating(params, dtype)
    p = params["bert"]
    t_x = text_embeddings(p["embeddings"], cfg, input_ids, token_type_ids,
                          position_ids, train=train, rng=r, dtype=dtype)
    v_x = image_embeddings(p["v_embeddings"], cfg, image_feat, image_loc,
                           train=train, rng=r, dtype=dtype)
    t_seq, v_seq = encoder(p["encoder"], cfg, t_x, v_x, text_bias, image_bias,
                           co_bias, train=train, rng=r,
                           text_fused_attn=text_fused_attn,
                           text_fused_block=text_fused_block,
                           text_fused_ffn=text_fused_ffn,
                           text_fused_block_train=text_fused_block_train,
                           text_fused_co=text_fused_co, tap=tap)
    return t_seq, v_seq, pooler(p["t_pooler"], t_seq), pooler(p["v_pooler"], v_seq)


def pretraining_heads(params: Params, cfg: VilbertConfig, t_seq, v_seq,
                      pooled_t, pooled_v, *, train=False, rng=None):
    """BertPreTrainingHeads (vilbert_dialog.py:1049-1073): tied-decoder MLM
    logits, fused NSP logits, region-class logits."""
    r = _Rng(rng)
    params = cast_floating(params, t_seq.dtype)
    pc = params["cls"]
    if cfg.fusion_method == "mul":
        pooled = pooled_t * pooled_v
    else:
        pooled = pooled_t + pooled_v
    # fixed 0.1 in the reference (vilbert_dialog.py:1056), cfg-surfaced
    pooled = dropout(pooled, cfg.head_dropout_prob, train, r)

    pp = pc["predictions"]
    h = linear(pp["transform"]["dense"], t_seq)
    h = gelu(h) if cfg.hidden_act == "gelu" else ACT[cfg.hidden_act](h)
    h = layer_norm(pp["transform"]["LayerNorm"], h)
    decoder = params["bert"]["embeddings"]["word_embeddings"]  # tied (:1020)
    mlm_logits = jnp.matmul(h, decoder.astype(h.dtype).T) + pp["bias"]

    nsp_logits = linear(pc["bi_seq_relationship"], pooled)

    pi = pc["imagePredictions"]
    hv = linear(pi["transform"]["dense"], v_seq)
    hv = gelu(hv) if cfg.hidden_act == "gelu" else ACT[cfg.hidden_act](hv)
    hv = layer_norm(pi["transform"]["LayerNorm"], hv)
    img_logits = linear(pi["decoder"], hv)

    return mlm_logits, img_logits, nsp_logits


def nsp_and_img_heads(params: Params, cfg: VilbertConfig, v_seq, pooled_t,
                      pooled_v, *, train=False, rng=None):
    """NSP + region-class heads without the MLM decode (the gathered-MLM
    training path computes answer NLL separately)."""
    r = _Rng(rng)
    params = cast_floating(params, v_seq.dtype)
    pc = params["cls"]
    if cfg.fusion_method == "mul":
        pooled = pooled_t * pooled_v
    else:
        pooled = pooled_t + pooled_v
    # fixed 0.1 in the reference (vilbert_dialog.py:1056), cfg-surfaced
    pooled = dropout(pooled, cfg.head_dropout_prob, train, r)
    nsp_logits = linear(pc["bi_seq_relationship"], pooled)
    pi = pc["imagePredictions"]
    hv = linear(pi["transform"]["dense"], v_seq)
    hv = gelu(hv) if cfg.hidden_act == "gelu" else ACT[cfg.hidden_act](hv)
    hv = layer_norm(pi["transform"]["LayerNorm"], hv)
    img_logits = linear(pi["decoder"], hv)
    return img_logits, nsp_logits


def mlm_head_at_positions(params: Params, cfg: VilbertConfig, t_seq, positions):
    """MLM hidden transform at gathered positions only — avoids materialising
    the full [B, L, vocab] logits the reference always computes
    (vilbert_dialog.py:1069). Returns transformed hiddens [B, P, H]; pair with
    ops.losses.online_softmax_xent for streaming NLL over the vocab."""
    pp = cast_floating(params["cls"]["predictions"], t_seq.dtype)
    gathered = jnp.take_along_axis(t_seq, positions[..., None], axis=1)
    h = linear(pp["transform"]["dense"], gathered)
    h = gelu(h) if cfg.hidden_act == "gelu" else ACT[cfg.hidden_act](h)
    return layer_norm(pp["transform"]["LayerNorm"], h)


# ---------------------------------------------------------------------------
# initialisation (normal(0.02) / LN ones-zeros, vilbert_dialog.py:1110-1121)
# ---------------------------------------------------------------------------

def _init_linear(rng, n_in, n_out, std):
    kr, _ = jax.random.split(rng)
    return {"kernel": jax.random.normal(kr, (n_in, n_out), jnp.float32) * std,
            "bias": jnp.zeros((n_out,), jnp.float32)}


def _init_ln(dim):
    return {"weight": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _init_attention(rng, dim, std):
    ks = jax.random.split(rng, 4)
    return {
        "self": {"query": _init_linear(ks[0], dim, dim, std),
                 "key": _init_linear(ks[1], dim, dim, std),
                 "value": _init_linear(ks[2], dim, dim, std)},
        "output": {"dense": _init_linear(ks[3], dim, dim, std),
                   "LayerNorm": _init_ln(dim)},
    }


def _init_layer(rng, dim, inter, std):
    ks = jax.random.split(rng, 3)
    return {
        "attention": _init_attention(ks[0], dim, std),
        "intermediate": {"dense": _init_linear(ks[1], dim, inter, std)},
        "output": {"dense": _init_linear(ks[2], inter, dim, std),
                   "LayerNorm": _init_ln(dim)},
    }


def _init_connection(rng, cfg: VilbertConfig):
    std = cfg.initializer_range
    ks = jax.random.split(rng, 12)
    bi = cfg.bi_hidden_size
    return {
        "biattention": {
            "query1": _init_linear(ks[0], cfg.v_hidden_size, bi, std),
            "key1": _init_linear(ks[1], cfg.v_hidden_size, bi, std),
            "value1": _init_linear(ks[2], cfg.v_hidden_size, bi, std),
            "query2": _init_linear(ks[3], cfg.hidden_size, bi, std),
            "key2": _init_linear(ks[4], cfg.hidden_size, bi, std),
            "value2": _init_linear(ks[5], cfg.hidden_size, bi, std),
        },
        "biOutput": {
            "dense1": _init_linear(ks[6], bi, cfg.v_hidden_size, std),
            "LayerNorm1": _init_ln(cfg.v_hidden_size),
            "q_dense1": _init_linear(ks[7], bi, cfg.v_hidden_size, std),
            "dense2": _init_linear(ks[8], bi, cfg.hidden_size, std),
            "LayerNorm2": _init_ln(cfg.hidden_size),
            "q_dense2": _init_linear(ks[9], bi, cfg.hidden_size, std),
        },
        "v_intermediate": {"dense": _init_linear(
            ks[10], cfg.v_hidden_size, cfg.v_intermediate_size, std)},
        "v_output": {"dense": _init_linear(
            ks[11], cfg.v_intermediate_size, cfg.v_hidden_size, std),
            "LayerNorm": _init_ln(cfg.v_hidden_size)},
        "t_intermediate": {"dense": _init_linear(
            jax.random.fold_in(rng, 100), cfg.hidden_size,
            cfg.intermediate_size, std)},
        "t_output": {"dense": _init_linear(
            jax.random.fold_in(rng, 101), cfg.intermediate_size,
            cfg.hidden_size, std), "LayerNorm": _init_ln(cfg.hidden_size)},
    }


def init_params(rng, cfg: VilbertConfig) -> Params:
    """Random init mirroring the reference parameter set, including the unused
    ``sep_embeddings`` table kept for checkpoint-format parity
    (vilbert_dialog.py:319)."""
    std = cfg.initializer_range
    keys = jax.random.split(rng, 16)
    H, V = cfg.hidden_size, cfg.vocab_size

    embeddings = {
        "word_embeddings": jax.random.normal(keys[0], (V, H)) * std,
        "position_embeddings": jax.random.normal(
            keys[1], (cfg.max_position_embeddings, H)) * std,
        "token_type_embeddings": jax.random.normal(
            keys[2], (cfg.type_vocab_size, H)) * std,
        "token_type_embeddings_extension": jax.random.normal(
            keys[3], (10, H)) * std,
        "sep_embeddings": jax.random.normal(keys[4], (50, H)) * std,
        "LayerNorm": _init_ln(H),
    }
    v_embeddings = {
        "image_embeddings": _init_linear(
            keys[5], cfg.v_feature_size, cfg.v_hidden_size, std),
        "image_location_embeddings": _init_linear(
            keys[6], 5, cfg.v_hidden_size, std),
        "LayerNorm": _init_ln(cfg.v_hidden_size),
    }
    enc = {
        "layer": {str(i): _init_layer(jax.random.fold_in(keys[7], i), H,
                                      cfg.intermediate_size, std)
                  for i in range(cfg.num_hidden_layers)},
        "v_layer": {str(i): _init_layer(jax.random.fold_in(keys[8], i),
                                        cfg.v_hidden_size,
                                        cfg.v_intermediate_size, std)
                    for i in range(cfg.v_num_hidden_layers)},
        "c_layer": {str(i): _init_connection(jax.random.fold_in(keys[9], i), cfg)
                    for i in range(len(cfg.v_biattention_id))},
    }
    params = {
        "bert": {
            "embeddings": embeddings,
            "v_embeddings": v_embeddings,
            "encoder": enc,
            "t_pooler": {"dense": _init_linear(
                keys[10], H, cfg.bi_hidden_size, std)},
            "v_pooler": {"dense": _init_linear(
                keys[11], cfg.v_hidden_size, cfg.bi_hidden_size, std)},
        },
        "cls": {
            "predictions": {
                "transform": {"dense": _init_linear(keys[12], H, H, std),
                              "LayerNorm": _init_ln(H)},
                "bias": jnp.zeros((V,), jnp.float32),
            },
            "bi_seq_relationship": _init_linear(
                keys[13], cfg.bi_hidden_size, 2, std),
            "imagePredictions": {
                "transform": {"dense": _init_linear(
                    keys[14], cfg.v_hidden_size, cfg.v_hidden_size, std),
                    "LayerNorm": _init_ln(cfg.v_hidden_size)},
                "decoder": _init_linear(
                    keys[15], cfg.v_hidden_size, cfg.v_target_size, std),
            },
        },
    }
    return params
