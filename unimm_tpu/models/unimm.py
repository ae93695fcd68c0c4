"""UniMM-UL top-level model functions: descriptors -> biases -> encoder ->
heads/losses/scores.

This is the TPU-native equivalent of VisualDialogEncoder +
BertForMultiModalPreTraining.forward (/root/reference/models/
visual_dialog_encoder.py:18-50, /root/reference/models/vilbert_dialog.py:1519)
— a train path returning (lm_loss, img_loss, nsp_loss) and an eval path
returning candidate-ranking scores, with the key structural difference that
attention masks are generated on device from 3 ints per sequence and the eval
path never materialises the [N, L, vocab] MLM logits (answer-token NLL is
computed by online softmax at gathered label positions).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import vilbert
from unimm_tpu.ops import losses as L
from unimm_tpu.ops import masks

# Maximum number of MLM-label positions gathered per sequence on the eval
# scoring path. The generative layout bounds the answer by
# ctx + 2*(ans+1) <= 256, so an answer can carry at most ~126 label tokens
# with a minimal context; 128 therefore covers EVERY representable sequence
# (no silent score truncation). Positions beyond the actual label count
# point at padding with label -1 and contribute zero NLL.
MAX_LABEL_POSITIONS = 128


def build_biases(mode, ctx_end, ans_len, image_mask, max_len: int,
                 dtype=jnp.float32):
    """Descriptor -> (text_bias [B,1,L,L], image_bias [B,1,1,R],
    co_bias [B,1,1,L], position_ids [B,L])."""
    return (
        masks.text_self_bias(mode, ctx_end, ans_len, max_len, dtype),
        masks.image_self_bias(image_mask, dtype),
        masks.co_attention_bias(mode, ctx_end, ans_len, max_len, dtype),
        masks.position_ids(mode, ctx_end, ans_len, max_len),
    )


def expand_images(batch):
    """Resolve compact image storage: when ``img_index`` [N] is present, the
    image arrays are stored once per IMAGE ([B_img, ...]) and gathered to
    per-sequence arrays on device. This avoids shipping the region features
    duplicated across all rounds x candidates of a dialog (the reference
    expands [B,10,100,37,2048] host-side, val_lm.py:84-93 — 1000x redundant
    host->device traffic)."""
    if "img_index" not in batch or batch["img_index"] is None:
        return batch
    idx = batch["img_index"]
    out = {k: v for k, v in batch.items() if k != "img_index"}
    for k in ("image_feat", "image_loc", "image_mask", "image_target",
              "image_label"):
        if k in out and out[k] is not None:
            out[k] = jnp.asarray(out[k])[idx]
    return out


def _shard_map_dp(mesh, fn, n_batch: int):
    """shard_map ``fn`` over the mesh's dp axis.

    The first ``n_batch`` positional args are batch-leading (split on dim 0
    across dp); the rest (weights, scalars) are replicated. This makes the
    partitioning of the Pallas custom calls EXPLICIT — XLA's GSPMD has no
    SPMD rule for custom calls and would otherwise all-gather the batch
    around each kernel on a real multi-chip mesh (ROADMAP "GSPMD x Pallas").
    Weight cotangents are psum-reduced across dp by shard_map's transpose,
    so the wrap is differentiation-safe (tested vs the unsharded path in
    tests/test_shard_kernels.py)."""
    from unimm_tpu.parallel.mesh import DP
    from jax.sharding import PartitionSpec
    dp, rep = PartitionSpec(DP), PartitionSpec()

    def wrapped(*args):
        specs = tuple(dp if i < n_batch else rep for i in range(len(args)))
        return jax.shard_map(fn, mesh=mesh, in_specs=specs, out_specs=dp,
                             check_vma=False)(*args)

    return wrapped


def _kernel_mesh(mesh, n_rows: int):
    """The mesh to shard_map kernels over, or None to rely on GSPMD:
    requires a dp axis > 1 that divides the batch row count."""
    if mesh is None:
        return None
    from unimm_tpu.parallel.mesh import DP
    dp = mesh.shape.get(DP, 1) if hasattr(mesh.shape, "get") else dict(
        mesh.shape).get(DP, 1)
    return mesh if dp > 1 and n_rows % dp == 0 else None


def encode(params, cfg: VilbertConfig, batch, *, train=False, rng=None,
           dtype=jnp.float32, mesh=None, tap=None):
    """Run the two-stream encoder from a descriptor batch.

    batch keys: tokens [B,L] int32, segments [B,L] int32, mode/ctx_end/ans_len
    [B] int32, image_feat [B,R,2048], image_loc [B,R,5], image_mask [B,R].
    Optional: positions [B,L] override; img_index [B] for compact per-image
    feature storage (see expand_images).
    ``mesh``: optional jax.sharding.Mesh — Pallas kernel calls are wrapped in
    jax.shard_map over its dp axis (explicit partitioning; see _shard_map_dp).
    Returns (t_seq, v_seq, pooled_t, pooled_v).
    """
    batch = expand_images(batch)
    Lmax = batch["tokens"].shape[-1]
    # Pallas text-stream kernels regenerate the text mask in-kernel, so the
    # [B, L, L] bias is never materialised on those paths. "pallas_block"
    # uses the whole-sub-block kernels: the eval variant on inference paths
    # and the differentiable variant (custom VJP, in-kernel prob dropout)
    # in training; the v1 per-head kernel ("pallas") has a VJP but no
    # dropout site, so it only trains when attention dropout is off.
    impl = cfg.attention_impl
    interpret = jax.default_backend() == "cpu"
    pairs_ok = not cfg.in_batch_pairs and not cfg.fast_mode
    use_block = impl == "pallas_block" and pairs_ok and not train
    # the differentiable block kernel regenerates its prob-dropout masks
    # with the TPU hardware PRNG, which has no CPU interpret lowering — on
    # CPU it is only usable when attention dropout is off (tests)
    use_block_train = (impl == "pallas_block" and pairs_ok and train
                       and not (interpret
                                and cfg.attention_probs_dropout_prob > 0))
    use_pallas = (impl == "pallas" and pairs_ok
                  and not (train and cfg.attention_probs_dropout_prob > 0))
    text_fused_attn = text_fused_block = text_fused_ffn = None
    text_fused_block_train = text_fused_co = None
    t_bias = None
    if use_block or use_block_train or use_pallas:
        desc = jnp.stack(
            [jnp.asarray(batch["mode"], jnp.int32),
             jnp.asarray(batch["ctx_end"], jnp.int32),
             jnp.asarray(batch["ans_len"], jnp.int32)], axis=-1)
        smesh = _kernel_mesh(mesh, batch["tokens"].shape[0])
    if use_block:
        from unimm_tpu.ops import pallas_attention_v2 as pattn2

        def _block(x, d, p_attn):
            return pattn2.fused_attention_block(
                x, d, p_attn, num_heads=cfg.num_attention_heads,
                interpret=interpret)

        _block_c = _shard_map_dp(smesh, _block, 2) if smesh else _block

        def text_fused_block(p_attn, x):
            return _block_c(x, desc, p_attn)

        if cfg.fused_ffn:
            def _ffn(x, p_inter, p_out):
                return pattn2.fused_ffn_block(
                    x, p_inter, p_out, act=cfg.hidden_act,
                    interpret=interpret)

            _ffn_c = _shard_map_dp(smesh, _ffn, 1) if smesh else _ffn

            def text_fused_ffn(p_inter, p_out, x):
                return _ffn_c(x, p_inter, p_out)

        if cfg.fused_co:
            imask = jnp.asarray(batch["image_mask"])

            def _co(t_x, v_x, im, p_conn):
                return pattn2.fused_co_text_block(
                    t_x, v_x, im, p_conn,
                    num_heads=cfg.bi_num_attention_heads,
                    interpret=interpret)

            _co_c = _shard_map_dp(smesh, _co, 3) if smesh else _co

            def text_fused_co(p_conn, v_x, t_x):
                return _co_c(t_x, v_x, imask, p_conn)
    elif use_block_train:
        from unimm_tpu.ops import pallas_attention_v2 as pattn2

        def _bt(x, d, m_o, seed, *ws):
            if smesh is not None:
                # decorrelate the in-kernel prob-dropout stream per dp shard:
                # the kernel seeds per LOCAL (sequence, head) tag, which
                # repeats across shards under shard_map
                from unimm_tpu.parallel.mesh import DP
                seed = seed + jax.lax.axis_index(DP).astype(
                    jnp.int32) * jnp.int32(1000003)
            return pattn2.fused_attention_block_train(
                cfg.num_attention_heads, cfg.attention_probs_dropout_prob,
                interpret, x, d, seed, m_o, *ws)

        _bt_c = _shard_map_dp(smesh, _bt, 3) if smesh else _bt

        def text_fused_block_train(p_attn, x, r):
            # fp32 mask so the 1/keep scale matches the XLA dropout path
            # exactly (the kernel consumes m_o in fp32 either way)
            m_o = (vilbert.dropout_scale_mask(
                       r.next(), x.shape, cfg.hidden_dropout_prob,
                       jnp.float32)
                   if cfg.hidden_dropout_prob > 0
                   else jnp.ones(x.shape, jnp.float32))
            seed = vilbert.dropout_seed(r)
            ps, po = p_attn["self"], p_attn["output"]
            return _bt_c(
                x, desc, m_o, seed,
                ps["query"]["kernel"], ps["query"]["bias"],
                ps["key"]["kernel"], ps["key"]["bias"],
                ps["value"]["kernel"], ps["value"]["bias"],
                po["dense"]["kernel"], po["dense"]["bias"],
                po["LayerNorm"]["weight"], po["LayerNorm"]["bias"])
    elif use_pallas:
        from unimm_tpu.ops import pallas_attention as pattn

        def _pattn(q, k, v, d):
            return pattn.fused_text_attention(q, k, v, d, interpret)

        _pattn_c = _shard_map_dp(smesh, _pattn, 4) if smesh else _pattn

        def text_fused_attn(q, k, v):
            return _pattn_c(q, k, v, desc)
    else:
        t_bias = masks.text_self_bias(batch["mode"], batch["ctx_end"],
                                      batch["ans_len"], Lmax, dtype)
    v_bias = masks.image_self_bias(batch["image_mask"], dtype)
    co_bias = masks.co_attention_bias(batch["mode"], batch["ctx_end"],
                                      batch["ans_len"], Lmax, dtype)
    pos = masks.position_ids(batch["mode"], batch["ctx_end"],
                             batch["ans_len"], Lmax)
    if "positions" in batch and batch["positions"] is not None:
        pos = batch["positions"]
    return vilbert.bert_model(
        params, cfg,
        input_ids=batch["tokens"], token_type_ids=batch["segments"],
        position_ids=pos, text_bias=t_bias,
        image_feat=batch["image_feat"], image_loc=batch["image_loc"],
        image_bias=v_bias, co_bias=co_bias, train=train, rng=rng, dtype=dtype,
        text_fused_attn=text_fused_attn, text_fused_block=text_fused_block,
        text_fused_ffn=text_fused_ffn,
        text_fused_block_train=text_fused_block_train,
        text_fused_co=text_fused_co, tap=tap)


def forward_train(params, cfg: VilbertConfig, batch, *, rng,
                  nsp_weight=None, dtype=jnp.bfloat16, train=True,
                  mesh=None):
    """Training losses (vilbert_dialog.py:1559-1624 semantics).

    Extra batch keys: mlm_labels [B,L] (-1 ignore), lm_weight [B,L],
    next_sentence_label [B], image_target [B,R,1601], image_label [B,R].
    Returns dict(lm=..., img=..., nsp=...) of scalar fp32 losses.
    """
    batch = expand_images(batch)
    r_enc, r_head = (jax.random.split(rng) if rng is not None else (None, None))
    t_seq, v_seq, pooled_t, pooled_v = encode(
        params, cfg, batch, train=train, rng=r_enc, dtype=dtype, mesh=mesh)
    lm, img_logits, nsp_logits = lm_loss_and_heads(
        params, cfg, t_seq, v_seq, pooled_t, pooled_v, batch, train=train,
        rng=r_head)
    img_loss_fn = (L.masked_img_loss_mse if cfg.predict_feature
                   else L.masked_img_loss)
    # group-level normaliser overrides (length-bucketed accumulation
    # morsels, data/dataset.length_bucket_morsels): absent -> per-batch
    # denominators (reference-exact accumulation semantics)
    return {
        "lm": lm,
        "img": img_loss_fn(img_logits, batch["image_target"],
                           batch["image_label"],
                           norm=batch.get("img_norm")),
        "nsp": L.nsp_loss(nsp_logits, batch["next_sentence_label"], nsp_weight,
                          norm_counts=batch.get("nsp_norm_counts")),
    }


def lm_loss_and_heads(params, cfg: VilbertConfig, t_seq, v_seq, pooled_t,
                      pooled_v, batch, *, train, rng):
    """MLM likelihood+unlikelihood loss + NSP/image head logits, honoring
    cfg.mlm_loss_impl: 'gathered' computes NLL at gathered label positions
    with the chunk-recomputing custom VJP (no [N, L, vocab] logits — the
    reference always materialises them, vilbert_dialog.py:1069); 'dense' is
    the exactness oracle. Shared by forward_train and the dense-finetuning
    step."""
    # optional normaliser override: length-bucketed accumulation morsels
    # pass lm_norm = (group label-token count) / k so sorted morsels keep
    # the unsorted gradient's expectation (data/dataset.py
    # length_bucket_morsels); absent -> per-batch count (reference exact)
    norm = batch.get("lm_norm")
    if cfg.mlm_loss_impl == "gathered":
        pos, labs = label_positions(batch["mlm_labels"],
                                    cfg.max_train_label_positions)
        w_g = jnp.take_along_axis(batch["lm_weight"], pos, axis=-1)
        hidden = vilbert.mlm_head_at_positions(params, cfg, t_seq, pos)
        decoder = params["bert"]["embeddings"]["word_embeddings"].astype(
            hidden.dtype)
        bias = params["cls"]["predictions"]["bias"].astype(jnp.float32)
        nll = L.online_softmax_xent_vjp(hidden, decoder, bias, labs)
        num_tokens = (norm if norm is not None else jnp.sum(
            (batch["lm_weight"] != 0).astype(jnp.float32)))
        lm = L.masked_lm_ul_loss_gathered(nll, labs, w_g, num_tokens)
        img_logits, nsp_logits = vilbert.nsp_and_img_heads(
            params, cfg, v_seq, pooled_t, pooled_v, train=train, rng=rng)
    else:
        mlm_logits, img_logits, nsp_logits = vilbert.pretraining_heads(
            params, cfg, t_seq, v_seq, pooled_t, pooled_v, train=train,
            rng=rng)
        lm = L.masked_lm_ul_loss(mlm_logits, batch["mlm_labels"],
                                 batch["lm_weight"], num_tokens=norm)
    return lm, img_logits, nsp_logits


def label_positions(mlm_labels, max_positions: int = MAX_LABEL_POSITIONS):
    """Static-shape gather indices of label positions per sequence.

    Returns (positions [B,P] int32, labels_at [B,P] with -1 padding). Uses a
    stable argsort on the "is-label" indicator so real positions come first in
    original order.
    """
    is_lab = mlm_labels != -1
    order = jnp.argsort(~is_lab, axis=-1, stable=True)
    pos = order[..., :max_positions]
    labs = jnp.take_along_axis(mlm_labels, pos, axis=-1)
    return pos.astype(jnp.int32), labs


def forward_eval(params, cfg: VilbertConfig, batch, *, dtype=jnp.bfloat16,
                 need_lm=True, need_nsp=True,
                 max_label_positions: int = MAX_LABEL_POSITIONS, mesh=None):
    """Eval scoring pass (val_lm.py:121-143 / train.py:258-263 semantics).

    Returns dict with:
      nsp_logits [B, 2]
      lm_nll_sum [B]   — answer NLL summed over label tokens (seq-level LL = -sum)
      lm_nll_mean [B]  — token-averaged NLL (val_avg_lm.py:135)

    ``max_label_positions``: static per-sequence label budget P. The MLM head
    cost is linear in P (the tied-decoder online softmax over the 30K vocab
    dominates), so callers that know the batch's true maximum label count
    (the evaluator does — labels are host-built) should pass the smallest
    covering bucket; 128 covers every representable generative answer.
    """
    t_seq, v_seq, pooled_t, pooled_v = encode(
        params, cfg, batch, train=False, rng=None, dtype=dtype, mesh=mesh)
    out = {}
    if need_nsp:
        pooled = (pooled_t * pooled_v if cfg.fusion_method == "mul"
                  else pooled_t + pooled_v)
        out["nsp_logits"] = vilbert.linear(
            params["cls"]["bi_seq_relationship"], pooled).astype(jnp.float32)
    if need_lm:
        pos, labs = label_positions(batch["mlm_labels"], max_label_positions)
        hidden = vilbert.mlm_head_at_positions(params, cfg, t_seq, pos)
        decoder = params["bert"]["embeddings"]["word_embeddings"].astype(dtype)
        bias = params["cls"]["predictions"]["bias"].astype(jnp.float32)
        nll = L.online_softmax_xent(hidden, decoder, bias, labs)
        count = jnp.sum((labs != -1).astype(jnp.float32), axis=-1)
        out["lm_nll_sum"] = jnp.sum(nll, axis=-1)
        out["lm_nll_mean"] = out["lm_nll_sum"] / jnp.maximum(count, 1.0)
    return out
