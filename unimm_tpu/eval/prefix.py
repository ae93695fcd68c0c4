"""Prefix-cache generative scoring: prefill each slate's shared context once,
then score all answer options against the cached context K/V.

The reference's val_lm (val_lm.py:121-143) runs a FULL forward of every
[L=256] sequence for each of the 100 answer options of a round, although the
options differ only in the answer tokens. The generative mask layout
(ops/masks.py, data_utils.py:139-288) makes the shared part provably
option-independent:

* context rows ``[1, Lc)`` attend only ``[1, Lc)`` — never the [CLS] column,
  never either answer copy;
* the image stream attends text columns ``[1, Lc)`` only (gen co-mask), and
  text attends image without restriction — so the ENTIRE vision stream is a
  function of (context, image) alone;
* no row other than [CLS] itself ever attends column 0, and [CLS] feeds only
  the NSP pooler — irrelevant to LM scoring.

Therefore, per slate, the hidden states of the context rows and the whole
vision stream are identical across all options at EVERY layer. This module
exploits that the TPU-serving way (prefix/KV caching):

1. **Context prefill** — one standard forward per slate over the context only
   (descriptor ``mode=gen, ctx_end=Lc, ans_len=0`` reproduces exactly the
   context-row and vision-stream computation of the full sequences), tapping
   each text layer's input hiddens and each connection layer's vision-stream
   input (vilbert.encoder ``tap``).
2. **Answer pass** — per option, only the ``2*ans_len`` answer rows (first +
   masked copy) run through the text stream; their queries attend the cached
   context K/V plus the option's own rows. Every answer row attends the full
   context ``[1, Lc)`` (first-copy rows attend ``j <= i``, second-copy rows
   ``j < i - A``; both contain all of ``[1, Lc)``), so the context-side bias
   is row-independent and only the small [W, W] row->row bias has structure.

Cost per 100-option slate drops from 100 full-length forwards to one context
forward + 100 x ~16-row passes (~10x fewer FLOPs at typical VisDial shapes),
and the vision stream runs once instead of 100 times. Exact up to float
rounding: masked columns contribute exp(-1e4) = 0 to the fp32 softmax, so
the excluded [CLS]/padding columns change nothing (same argument as the
length-bucketed evaluator); tests/test_prefix.py asserts fp32 agreement and
rank equality with the flat path.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import unimm, vilbert
from unimm_tpu.ops import losses as L
from unimm_tpu.ops import masks


def slate_eligibility(batch) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side per-slate prefix eligibility for a [B, R, O] val batch.

    A slate qualifies when every option is generative, shares the identical
    context prefix (tokens+segments on ``[0, Lc)`` with a common
    ``Lc = ctx_end - ans_len``), and carries labels only inside its answer
    rows ``[ctx_end, min(ctx_end + ans_len, L))`` — all true for real
    encode_gen output (data/encoding.py); synthetic or truncated-context
    slates fall back to the flat scorer.

    Returns (ok [B*R] bool, lc [B*R] int32, rows_max [B*R] int32).
    """
    tokens = np.asarray(batch["tokens"])
    B, R, O, Lx = tokens.shape
    NS = B * R
    toks = tokens.reshape(NS, O, Lx)
    segs = np.asarray(batch["segments"]).reshape(NS, O, Lx)
    labs = np.asarray(batch["mlm_labels"]).reshape(NS, O, Lx)
    mode = np.asarray(batch["mode"]).reshape(NS, O)
    ce = np.asarray(batch["ctx_end"]).reshape(NS, O).astype(np.int64)
    al = np.asarray(batch["ans_len"]).reshape(NS, O).astype(np.int64)

    lc = ce - al
    ok = (mode == 1).all(-1) & (al >= 1).all(-1)
    ok &= (lc == lc[:, :1]).all(-1)
    lc0 = np.clip(lc[:, 0], 0, None)
    ok &= (lc0 >= 2) & (lc0 < Lx)

    j = np.arange(Lx)[None, None, :]
    in_ctx = j < lc0[:, None, None]
    ok &= (~in_ctx | (toks == toks[:, :1])).all((-1, -2))
    ok &= (~in_ctx | (segs == segs[:, :1])).all((-1, -2))

    T = np.minimum(ce + al, Lx)
    lab_ok = (labs == -1) | ((j >= ce[..., None]) & (j < T[..., None]))
    ok &= lab_ok.all((-1, -2))

    rows_max = np.clip(T - lc0[:, None], 0, Lx).max(-1).astype(np.int32)
    return ok, lc0.astype(np.int32), rows_max


def pack_option_rows(n, rb: int, p_quantum: int = 256):
    """Bin-pack each slate's per-option answer rows into ``rb``-row blocks.

    The packed answer pass (``_answer_impl_packed``) lays option rows out
    contiguously instead of padding every option to a power-of-two W, so a
    group's row count tracks sum(2*ans_len) instead of O*W (~36% fewer row
    FLOPs at bench shapes, more on real VisDial's short answers). Options
    never straddle an ``rb`` boundary — row->row attention then stays
    strictly intra-block and the fused answer kernel's block-diagonal bias
    applies unchanged (ops/pallas_prefix.py:fused_answer_block).

    Args:
      n: [G, O] int — rows needed per option (2*ans_len, truncation-clipped).
      rb: row-block size (the kernel grid's Rw).
      p_quantum: the packed length is rounded up to a multiple of this, to
        bound the number of distinct compiled shapes (CLAUDE.md: full-model
        graphs compile through a remote server — shape variety is expensive).

    Returns (starts [G, O] int64 — packed offset of each option's first row,
    P int — the padded packed length, a multiple of lcm(rb, p_quantum)).
    """
    G, O = n.shape
    cum = np.zeros(G, np.int64)
    starts = np.empty((G, O), np.int64)
    for o in range(O):
        no = n[:, o].astype(np.int64)
        spill = (cum % rb) + no > rb
        cum = np.where(spill, ((cum // rb) + 1) * rb, cum)
        starts[:, o] = cum
        cum += no
    q = rb * p_quantum // math.gcd(rb, p_quantum)  # lcm: P must satisfy BOTH
    P = int(-(-int(cum.max()) // q) * q)
    return starts, max(P, q)


class PrefixScorer:
    """Scores generative slates via context prefill + answer-rows passes.

    ``group``: slates per device dispatch (a group shares one context-length
    bucket Lcb and one rows bucket W; slates are sorted by Lc first so groups
    are length-homogeneous). Groups are balanced to equal sizes per call so
    only one (G, Lcb, W) shape compiles per batch shape.

    The context prefill runs the standard encoder on ``attention_impl='xla'``:
    it is a small fraction of slate work, and per-(G, Lcb) Pallas executables
    would each cost a remote Mosaic compile (CLAUDE.md). The answer pass
    routes its per-layer attention sub-block through the fused answer
    kernel (ops/pallas_prefix.py — rows x cached-context K/V, VMEM-resident
    probs) when ``cfg.attention_impl == 'pallas_block'``; everything else
    (embeddings, FFNs, co-attention text side, label head) is XLA.

    ``mesh``: optional jax.sharding.Mesh — both passes are dp-sharded over
    the slate/group axis (group sizes are rounded up to a dp multiple).
    Pure XLA end to end, so GSPMD partitions everything without custom-call
    rules. Multi-process meshes work like the flat evaluator's multi-host
    serving: every process stages the SAME global grouping from the
    replicated val batch (eligibility/sorting/bucketing are deterministic
    in the batch alone), contributes its contiguous dp-block of each group
    via jax.make_array_from_process_local_data, and the per-option score
    vectors are replicated on the way out so every process can fetch them.
    """

    _IMG_KEYS = ("image_feat", "image_loc", "image_mask")

    def __init__(self, cfg: VilbertConfig, *, dtype=jnp.bfloat16,
                 group: int = 40, bucket_div: int = 8, mesh=None,
                 packed: bool = True, row_block: int = 0):
        assert not cfg.in_batch_pairs and not cfg.fast_mode
        self.cfg = cfg
        self.dtype = dtype
        self.group = group
        self._bucket_div = bucket_div
        # packed answer rows (pack_option_rows): options laid out
        # contiguously in row_block bins instead of each padded to W —
        # row FLOPs track sum(2*ans_len) instead of O*W. Falls back to the
        # W-padded layout per group when an option needs > row_block rows.
        # row_block=0 (default) picks the block size PER GROUP from its
        # context bucket (_rb_for): the v5e hardware sweep
        # (scripts/bench_rowblock_ab.py, interleaved, coalesced-pair
        # workload) measured medians 64: 24.41 / 128: 22.37 / 256: 23.48
        # d/s at Lcb=192 (pinned extents) but 64: 18.62 / 128: 20.60 /
        # 256: 20.93 at Lcb=256 (realistic ctx growth) — the optimum flips
        # with the context bucket, so the size is chosen where Lcb is known.
        self.packed = packed
        self._rb = row_block
        self.mesh = mesh
        self._dp = 1
        self._nproc = 1
        self._repl = None
        if mesh is not None:
            from unimm_tpu.parallel import mesh as pmesh
            self._dp = mesh.shape[pmesh.DP]
            self._nproc = pmesh.mesh_process_count(mesh)
            self._repl = pmesh.replicated(mesh)
            assert self._dp % self._nproc == 0, \
                ("multi-process prefix scoring requires the dp axis to span "
                 "processes (mp must stay within a process)",
                 dict(mesh.shape), self._nproc)
        self._ctx_cfg = cfg.replace(attention_impl="xla")
        # one dispatch per group: prefill + answer pass in a single jit —
        # halves the per-dispatch tunnel overhead (~30 ms each, CLAUDE.md)
        # and the caches never materialise beyond XLA intermediates
        self._grp_fn = jax.jit(self._group_impl)
        self._grp_fn_packed = jax.jit(self._group_impl_packed,
                                      static_argnames="rb")

    def _rb_for(self, Lcb: int, need: int) -> int:
        """Row-block size for a group with context bucket ``Lcb`` whose
        largest option needs ``need`` rows. Fixed when the scorer was built
        with an explicit ``row_block``; otherwise 64 below the Lcb=192/256
        crossover measured on v5e (see __init__), escalated to 256 when an
        option does not fit a 64-row bin (packing still beats the W-padded
        fallback, round-4 A/B)."""
        if self._rb:
            return self._rb
        return 64 if (Lcb <= 192 and need <= 64) else 256

    def _make_ffn(self, use_kernel, rows, rng0, smesh, interp):
        """Per-layer answer-pass FFN: the fused Pallas block
        (ops/pallas_attention_v2.fused_ffn_block — weights VMEM-resident,
        the [*, intermediate] activation never reaches HBM) when the
        production kernels are on and ``cfg.fused_ffn``; the XLA
        vilbert.ffn_block otherwise. ``rows`` is the per-group answer row
        count (packed P, or O*W in the W-layout); the kernel grid re-blocks
        it into the largest <=256-row divisor (VMEM-bounded like the flat
        path's fused FFN). Returns ffn(p_inter, p_out, h)."""
        cfg = self.cfg
        rbf = next((b for b in (256, 128, 64, 32, 16, 8)
                    if rows % b == 0), None)
        if not (use_kernel and cfg.fused_ffn and rbf):
            def ffn(p_inter, p_out, h):
                return vilbert.ffn_block(p_inter, p_out, h,
                                         act=cfg.hidden_act, hidden_drop=0.0,
                                         train=False, rng=rng0)
            return ffn

        from unimm_tpu.models.unimm import _shard_map_dp
        from unimm_tpu.ops import pallas_attention_v2 as pattn2

        def _ffn_k(h, p_inter, p_out):
            g = h.shape[0]
            hb = h.reshape(g * (rows // rbf), rbf, h.shape[-1])
            y = pattn2.fused_ffn_block(hb, p_inter, p_out,
                                       act=cfg.hidden_act, interpret=interp)
            return y.reshape(h.shape)

        _ffn_c = _shard_map_dp(smesh, _ffn_k, 1) if smesh else _ffn_k

        def ffn(p_inter, p_out, h):
            return _ffn_c(h, p_inter, p_out)
        return ffn

    def _group_impl_packed(self, params, ctx_batch, rows, rb):
        res = self._answer_impl_packed(
            params, self._context_impl(params, ctx_batch), rows, rb)
        if self._nproc > 1:
            res = {k: jax.lax.with_sharding_constraint(v, self._repl)
                   for k, v in res.items()}
        return res

    def _group_impl(self, params, ctx_batch, rows):
        res = self._answer_impl(params, self._context_impl(params,
                                                           ctx_batch), rows)
        if self._nproc > 1:
            # dp-sharded outputs are not addressable across hosts — replicate
            # the tiny [G, O] score arrays so every process can fetch them
            res = {k: jax.lax.with_sharding_constraint(v, self._repl)
                   for k, v in res.items()}
        return res

    def _put(self, batch):
        """Stage a group-axis dict: every process passes the same GLOBAL
        staging; under a multi-process mesh each contributes its contiguous
        dp-block (shard_batch assembles without host-global arrays)."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from unimm_tpu.parallel import mesh as pmesh
        if self._nproc > 1:
            r = jax.process_index()

            def loc(v):
                v = np.asarray(v)
                k = v.shape[0] // self._nproc
                return v[r * k:(r + 1) * k]

            batch = {k: loc(v) for k, v in batch.items()}
        return pmesh.shard_batch(batch, self.mesh)

    def _put_images(self, imgs):
        """Per-image arrays are indexed on device by the dp-sharded
        img_index: single-process meshes go through shard_batch (sharded or
        replicated by divisibility — GSPMD resolves the gather); multi-
        process meshes assemble them REPLICATED (every process holds the
        same images; slicing them like batch rows would be wrong)."""
        if self.mesh is None or self._nproc == 1:
            return self._put(imgs)
        return {k: jax.make_array_from_process_local_data(
            self._repl, np.asarray(v), np.asarray(v).shape)
            for k, v in imgs.items()}

    # ------------------------------------------------------------------
    # device functions
    # ------------------------------------------------------------------

    def _context_impl(self, params, ctx_batch):
        cfg = self.cfg
        taps = {"t": [None] * cfg.num_hidden_layers,
                "c_v": [None] * len(cfg.t_biattention_id)}

        def tap(kind, idx, x):
            taps[kind][idx] = x

        unimm.encode(params, self._ctx_cfg, ctx_batch, train=False,
                     dtype=self.dtype, tap=tap)
        return {"t": tuple(taps["t"]),
                "c_v": tuple(x for x in taps["c_v"] if x is not None)}

    def _answer_impl(self, params, caches, rows, with_head: bool = True):
        # with_head=False stops before the MLM label head (attribution
        # probes only, scripts/bench_prefix_attr.py)
        cfg, dtype = self.cfg, self.dtype
        # fp32 tied-decoder bias BEFORE the compute-dtype cast: the flat path
        # (unimm.forward_eval) takes it fp32-direct from the original params,
        # so a bf16 round-trip here would shift near-tied options between the
        # prefix and flat scorers inside one mixed batch
        d_bias = params["cls"]["predictions"]["bias"].astype(jnp.float32)
        params = vilbert.cast_floating(params, dtype)
        p = params["bert"]
        G, O, W = rows["tokens"].shape
        Lmax = cfg.max_seq_len
        lc = rows["lc"]                      # [G]
        A = rows["ans_len"]                  # [G, O]
        ce = rows["ctx_end"]                 # [G, O]

        r_ids = jnp.arange(W, dtype=jnp.int32)
        i_glob = lc[:, None, None] + r_ids[None, None, :]       # [G, 1, W]
        first = r_ids[None, None, :] < A[..., None]             # [G, O, W]
        T = jnp.minimum(ce + A, Lmax)
        n_rows = jnp.clip(T - lc[:, None], 0, W)
        valid = r_ids[None, None, :] < n_rows[..., None]
        # gen position ids: first copy keeps i, the masked copy reuses the
        # first copy's positions (i - A); padding rows -> 0 like the full path
        pos = jnp.where(valid,
                        jnp.where(first, i_glob, i_glob - A[..., None]), 0)

        x = vilbert.text_embeddings(
            p["embeddings"], cfg, rows["tokens"], rows["segments"], pos,
            train=False, rng=vilbert._Rng(None), dtype=dtype)

        # --- biases (fp32, cast at add like ops/masks additive biases) ---
        neg = jnp.float32(masks.NEG_INF)
        Lcb = caches["t"][0].shape[1]
        jc = jnp.arange(Lcb, dtype=jnp.int32)
        ctx_open = (jc[None, :] >= 1) & (jc[None, :] < lc[:, None])  # [G,Lcb]
        b_ctx = jnp.where(ctx_open, 0.0, neg)[:, None, None, None, :]
        rq, ks = r_ids[:, None], r_ids[None, :]
        A4 = A[..., None, None]
        is_first_q = rq[None, None] < A4                 # [G, O, W, 1]
        allow_first = ks <= rq                           # [W, W]
        allow_second = (ks < (rq - A4)) | (ks == rq)[None, None]
        rr_open = jnp.where(is_first_q, allow_first[None, None], allow_second)
        b_rr = jnp.where(rr_open, 0.0, neg)[:, :, None, :, :]
        b_img = masks.image_self_bias(rows["image_mask"])[:, None]  # [G,1,1,1,Rg]

        nh_t, nh_b = cfg.num_attention_heads, cfg.bi_num_attention_heads

        # fused answer-attention kernel (ops/pallas_prefix.py): under the
        # production attention_impl the per-layer attention sub-block runs
        # as one VMEM-resident Pallas pass — the XLA path materialises
        # [G,O,H,W,Lcb+W] score/prob tensors in HBM (~3.7 ms/layer at bench
        # shapes, ROADMAP "TPU backlog results" #3). Biases are layer-
        # independent, so both are precomputed once here. Under a mesh the
        # kernel is shard_mapped over dp (GSPMD has no custom-call rule).
        use_kernel = cfg.attention_impl == "pallas_block"
        smesh = None
        interp = False
        if use_kernel:
            from unimm_tpu.models.unimm import _kernel_mesh, _shard_map_dp
            from unimm_tpu.ops import pallas_prefix

            interp = jax.default_backend() == "cpu"
            o_blk = pallas_prefix.pick_o_blk(O, W)
            b_rr_k = pallas_prefix.block_rr_bias(rr_open, o_blk)
            b_ctx_k = jnp.where(ctx_open, 0.0, neg)[:, None, :]
            smesh = _kernel_mesh(self.mesh, G)

            def _ans(xf, kc_f, vc_f, bc, brr, p_attn):
                return pallas_prefix.fused_answer_block(
                    xf, kc_f, vc_f, bc, brr, p_attn, num_heads=nh_t,
                    interpret=interp)

            _ans_c = _shard_map_dp(smesh, _ans, 5) if smesh else _ans

        def split_rows(t, nh):
            g, o, w, d = t.shape
            return t.reshape(g, o, w, nh, d // nh).transpose(0, 1, 3, 2, 4)

        def split_ctx(t, nh):
            g, k, d = t.shape
            return t.reshape(g, k, nh, d // nh).transpose(0, 2, 1, 3)

        def merge_rows(t):
            g, o, nh, w, dh = t.shape
            return t.transpose(0, 1, 3, 2, 4).reshape(g, o, w, nh * dh)

        rng0 = vilbert._Rng(None)
        ffn = self._make_ffn(use_kernel, O * W, rng0, smesh, interp)

        def rows_attention(q, kr, vr, kc, vc, b_row):
            # q/kr/vr [G,O,h,W,d]; kc/vc [G,h,K,d]; keys = cached ctx ++ rows
            scale = 1.0 / math.sqrt(q.shape[-1])
            s_ctx = jnp.einsum("gohwd,ghkd->gohwk", q, kc) * scale
            s_rr = jnp.einsum("gohwd,gohsd->gohws", q, kr) * scale
            s = jnp.concatenate([s_ctx + b_ctx.astype(s_ctx.dtype),
                                 s_rr + b_row.astype(s_rr.dtype)], axis=-1)
            pr = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            pc, prr = pr[..., :kc.shape[2]], pr[..., kc.shape[2]:]
            return (jnp.einsum("gohwk,ghkd->gohwd", pc, vc)
                    + jnp.einsum("gohws,gohsd->gohwd", prr, vr))

        def t_layer(lp, x, li):
            ps, po = lp["attention"]["self"], lp["attention"]["output"]
            tc = caches["t"][li].astype(dtype)              # [G, Lcb, D]
            if use_kernel:
                h = _ans_c(x.reshape(G, O * W, -1),
                           vilbert.linear(ps["key"], tc),
                           vilbert.linear(ps["value"], tc),
                           b_ctx_k, b_rr_k,
                           lp["attention"]).reshape(G, O, W, -1)
            else:
                q = split_rows(vilbert.linear(ps["query"], x), nh_t)
                kr = split_rows(vilbert.linear(ps["key"], x), nh_t)
                vr = split_rows(vilbert.linear(ps["value"], x), nh_t)
                kc = split_ctx(vilbert.linear(ps["key"], tc), nh_t)
                vc = split_ctx(vilbert.linear(ps["value"], tc), nh_t)
                ctx = merge_rows(rows_attention(q, kr, vr, kc, vc, b_rr))
                h = vilbert.linear(po["dense"], ctx)
                h = vilbert.layer_norm(po["LayerNorm"], h + x)
            return ffn(lp["intermediate"], lp["output"], h)

        def c_layer(cp, x, v_in):
            # text side of BertConnectionLayer only: the vision stream is
            # option-independent and lives entirely in the prefill
            pb, po = cp["biattention"], cp["biOutput"]
            vi = v_in.astype(dtype)
            q2 = split_rows(vilbert.linear(pb["query2"], x), nh_b)
            k1 = split_ctx(vilbert.linear(pb["key1"], vi), nh_b)
            v1 = split_ctx(vilbert.linear(pb["value1"], vi), nh_b)
            scale = 1.0 / math.sqrt(q2.shape[-1])
            s = jnp.einsum("gohwd,ghkd->gohwk", q2, k1) * scale
            s = s + b_img.astype(s.dtype)
            pr = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q2.dtype)
            ctx_t = merge_rows(jnp.einsum("gohwk,ghkd->gohwd", pr, v1))
            t_h = vilbert.linear(po["dense2"], ctx_t)
            t_out = vilbert.layer_norm(po["LayerNorm2"], t_h + x)
            return ffn(cp["t_intermediate"], cp["t_output"], t_out)

        enc = p["encoder"]
        t_start = 0
        for count, t_end in enumerate(cfg.t_biattention_id):
            for i in range(t_start, t_end):
                x = t_layer(enc["layer"][str(i)], x, i)
            if cfg.with_coattention:
                x = c_layer(enc["c_layer"][str(count)],
                            x, caches["c_v"][count])
            t_start = t_end
        for i in range(t_start, cfg.num_hidden_layers):
            x = t_layer(enc["layer"][str(i)], x, i)

        if not with_head:
            return {"x_sum": jnp.sum(x.astype(jnp.float32))}
        # answer NLL at gathered label positions (same online softmax as
        # forward_eval); labels sit on second-copy rows, at most W // 2
        P = max(8, W // 2)
        labs_flat = rows["mlm_labels"].reshape(G * O, W)
        pos_l, labs = unimm.label_positions(labs_flat, P)
        hid = vilbert.mlm_head_at_positions(
            params, cfg, x.reshape(G * O, W, -1), pos_l)
        decoder = params["bert"]["embeddings"]["word_embeddings"].astype(dtype)
        if use_kernel:
            # fused online-softmax head (ops/pallas_head.py): the XLA scan
            # spills each [M, chunk] logits tile to HBM between matmul and
            # reduction (~4.1 ms/group measured, ROADMAP "TPU backlog" #3);
            # the kernel keeps tiles VMEM-resident and writes only [M] NLL
            from unimm_tpu.ops import pallas_head

            def _head(h_, l_, w_, b_):
                return pallas_head.online_softmax_xent_tpu(
                    h_, w_, b_, l_, interpret=interp)

            _head_c = (_shard_map_dp(smesh, _head, 2) if smesh
                       else _head)
            nll = _head_c(hid.reshape(G, O * hid.shape[1], -1),
                          labs.reshape(G, -1), decoder,
                          d_bias).reshape(labs.shape)
        else:
            nll = L.online_softmax_xent(hid, decoder, d_bias, labs)
        cnt = jnp.sum((labs != -1).astype(jnp.float32), -1)
        nll_sum = jnp.sum(nll, -1)
        return {"ll_sum": (-nll_sum).reshape(G, O),
                "ll_mean": (-(nll_sum / jnp.maximum(cnt, 1.0))).reshape(G, O)}

    def _answer_impl_packed(self, params, caches, rows, rb: int,
                            with_head: bool = True):
        """Packed-layout answer pass: every option's rows laid out
        contiguously per slate (pack_option_rows) instead of each option
        padded to a power-of-two W — row FLOPs track sum(2*ans_len)
        instead of O*W.

        rows keys: tokens/segments/mlm_labels/opt_id/r_in [G, P] (opt_id
        == O marks inter-option packing padding; r_in is the row's index
        within its option's window, identical to the W-layout row index),
        lc [G], ans_len [G, O], image_mask [G, Rg]. Options never straddle
        a row_block boundary, so row->row attention is intra-block and the
        fused answer kernel's block-diagonal bias applies unchanged.
        Scores match _answer_impl / the flat forward_eval to float
        rounding (tests/test_prefix_packed.py).
        """
        cfg, dtype = self.cfg, self.dtype
        d_bias = params["cls"]["predictions"]["bias"].astype(jnp.float32)
        params = vilbert.cast_floating(params, dtype)
        p = params["bert"]
        G, P = rows["tokens"].shape
        O = rows["ans_len"].shape[1]
        RB = rb
        assert P % RB == 0, (P, RB)
        PB = P // RB
        lc = rows["lc"]                                    # [G]
        opt = rows["opt_id"]                               # [G, P]
        rin = rows["r_in"]                                 # [G, P]
        A_pad = jnp.concatenate(
            [rows["ans_len"],
             jnp.zeros((G, 1), rows["ans_len"].dtype)], axis=1)
        A_row = jnp.take_along_axis(A_pad, opt, axis=1)    # [G, P]
        valid = opt < O
        first = valid & (rin < A_row)
        # gen position ids: first copy keeps lc + r_in, the masked copy
        # reuses the first copy's positions; packing padding -> 0
        i_glob = lc[:, None] + rin
        pos = jnp.where(valid,
                        jnp.where(first, i_glob, i_glob - A_row), 0)

        x = vilbert.text_embeddings(
            p["embeddings"], cfg, rows["tokens"], rows["segments"], pos,
            train=False, rng=vilbert._Rng(None), dtype=dtype)

        # --- biases (fp32, layer-independent) ---
        neg = jnp.float32(masks.NEG_INF)
        Lcb = caches["t"][0].shape[1]
        jc = jnp.arange(Lcb, dtype=jnp.int32)
        ctx_open = (jc[None, :] >= 1) & (jc[None, :] < lc[:, None])
        b_ctx = jnp.where(ctx_open, 0.0, neg)[:, None, None, None, :]
        # blocked row->row bias [G, PB, RB, RB]: same option AND the
        # W-layout rule on within-option indices (first copy causal,
        # second copy strictly-before i - A), self always open (eye)
        ob = opt.reshape(G, PB, RB)
        rnb = rin.reshape(G, PB, RB)
        anb = A_row.reshape(G, PB, RB)
        fq = first.reshape(G, PB, RB)[..., :, None]
        same = ((ob[..., :, None] == ob[..., None, :])
                & (ob[..., :, None] < O))
        rq, ks = rnb[..., :, None], rnb[..., None, :]
        allow_first = ks <= rq
        allow_second = ks < (rq - anb[..., :, None])
        rr_open = (same & jnp.where(fq, allow_first, allow_second)) \
            | jnp.eye(RB, dtype=bool)
        b_rr = jnp.where(rr_open, 0.0, neg).astype(jnp.float32)
        b_img = masks.image_self_bias(rows["image_mask"])  # [G, 1, 1, Rg]

        nh_t, nh_b = cfg.num_attention_heads, cfg.bi_num_attention_heads

        use_kernel = cfg.attention_impl == "pallas_block"
        smesh = None
        interp = False
        if use_kernel:
            from unimm_tpu.models.unimm import _kernel_mesh, _shard_map_dp
            from unimm_tpu.ops import pallas_prefix

            interp = jax.default_backend() == "cpu"
            b_ctx_k = jnp.where(ctx_open, 0.0, neg)[:, None, :]
            smesh = _kernel_mesh(self.mesh, G)

            def _ans(xf, kc_f, vc_f, bc, brr, p_attn):
                return pallas_prefix.fused_answer_block(
                    xf, kc_f, vc_f, bc, brr, p_attn, num_heads=nh_t,
                    interpret=interp)

            _ans_c = _shard_map_dp(smesh, _ans, 5) if smesh else _ans

        rng0 = vilbert._Rng(None)
        ffn = self._make_ffn(use_kernel, P, rng0, smesh, interp)

        def split_blocks(t, nh):       # [G, P, Hd] -> [G, PB, nh, RB, d]
            return t.reshape(G, PB, RB, nh, -1).transpose(0, 1, 3, 2, 4)

        def split_ctx(t, nh):          # [G, K, Hd] -> [G, nh, K, d]
            g, k, d = t.shape
            return t.reshape(g, k, nh, d // nh).transpose(0, 2, 1, 3)

        def merge_blocks(t):           # [G, PB, nh, RB, d] -> [G, P, Hd]
            g, pb, nh, rbs, dh = t.shape
            return t.transpose(0, 1, 3, 2, 4).reshape(g, pb * rbs, nh * dh)

        def t_layer(lp, x, li):
            ps, po = lp["attention"]["self"], lp["attention"]["output"]
            tc = caches["t"][li].astype(dtype)             # [G, Lcb, D]
            if use_kernel:
                h = _ans_c(x,
                           vilbert.linear(ps["key"], tc),
                           vilbert.linear(ps["value"], tc),
                           b_ctx_k, b_rr, lp["attention"])
            else:
                q = split_blocks(vilbert.linear(ps["query"], x), nh_t)
                kr = split_blocks(vilbert.linear(ps["key"], x), nh_t)
                vr = split_blocks(vilbert.linear(ps["value"], x), nh_t)
                kc = split_ctx(vilbert.linear(ps["key"], tc), nh_t)
                vc = split_ctx(vilbert.linear(ps["value"], tc), nh_t)
                scale = 1.0 / math.sqrt(q.shape[-1])
                s_ctx = jnp.einsum("gbhwd,ghkd->gbhwk", q, kc) * scale
                s_rr = jnp.einsum("gbhwd,gbhsd->gbhws", q, kr) * scale
                s = jnp.concatenate(
                    [s_ctx + b_ctx.astype(s_ctx.dtype),
                     s_rr + b_rr[:, :, None].astype(s_rr.dtype)], axis=-1)
                pr = jax.nn.softmax(s.astype(jnp.float32),
                                    axis=-1).astype(q.dtype)
                pc, prr = pr[..., :Lcb], pr[..., Lcb:]
                ctx = merge_blocks(
                    jnp.einsum("gbhwk,ghkd->gbhwd", pc, vc)
                    + jnp.einsum("gbhws,gbhsd->gbhwd", prr, vr))
                h = vilbert.linear(po["dense"], ctx)
                h = vilbert.layer_norm(po["LayerNorm"], h + x)
            return ffn(lp["intermediate"], lp["output"], h)

        def c_layer(cp, x, v_in):
            # text side of BertConnectionLayer; rows are row-independent
            # queries over the cached vision stream, so no block structure
            pb_, po = cp["biattention"], cp["biOutput"]
            vi = v_in.astype(dtype)
            q2 = split_ctx(vilbert.linear(pb_["query2"], x), nh_b)
            k1 = split_ctx(vilbert.linear(pb_["key1"], vi), nh_b)
            v1 = split_ctx(vilbert.linear(pb_["value1"], vi), nh_b)
            scale = 1.0 / math.sqrt(q2.shape[-1])
            s = jnp.einsum("ghpd,ghkd->ghpk", q2, k1) * scale
            s = s + b_img.astype(s.dtype)
            pr = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q2.dtype)
            ctx_t = jnp.einsum("ghpk,ghkd->ghpd", pr, v1)
            ctx_t = ctx_t.transpose(0, 2, 1, 3).reshape(G, P, -1)
            t_h = vilbert.linear(po["dense2"], ctx_t)
            t_out = vilbert.layer_norm(po["LayerNorm2"], t_h + x)
            return ffn(cp["t_intermediate"], cp["t_output"], t_out)

        enc = p["encoder"]
        t_start = 0
        for count, t_end in enumerate(cfg.t_biattention_id):
            for i in range(t_start, t_end):
                x = t_layer(enc["layer"][str(i)], x, i)
            if cfg.with_coattention:
                x = c_layer(enc["c_layer"][str(count)], x,
                            caches["c_v"][count])
            t_start = t_end
        for i in range(t_start, cfg.num_hidden_layers):
            x = t_layer(enc["layer"][str(i)], x, i)

        if not with_head:
            return {"x_sum": jnp.sum(x.astype(jnp.float32))}
        # labels occupy at most half of any option's rows (the masked
        # second copy), so P // 2 gathered positions always suffice
        P_lab = max(8, P // 2)
        pos_l, labs = unimm.label_positions(rows["mlm_labels"], P_lab)
        hid = vilbert.mlm_head_at_positions(params, cfg, x, pos_l)
        decoder = params["bert"]["embeddings"]["word_embeddings"].astype(
            dtype)
        if use_kernel:
            from unimm_tpu.ops import pallas_head

            def _head(h_, l_, w_, b_):
                return pallas_head.online_softmax_xent_tpu(
                    h_, w_, b_, l_, interpret=interp)

            _head_c = (_shard_map_dp(smesh, _head, 2) if smesh
                       else _head)
            nll = _head_c(hid, labs, decoder, d_bias)      # [G, P_lab]
        else:
            nll = L.online_softmax_xent(hid, decoder, d_bias, labs)
        # per-option NLL via a one-hot segment sum over the label rows
        opt_l = jnp.take_along_axis(opt, pos_l, axis=1)    # [G, P_lab]
        onehot = ((opt_l[..., None] == jnp.arange(O)[None, None, :])
                  & (labs != -1)[..., None]).astype(jnp.float32)
        nll_sum = jnp.einsum("gp,gpo->go", nll.astype(jnp.float32), onehot)
        cnt = jnp.sum(onehot, axis=1)
        return {"ll_sum": -nll_sum,
                "ll_mean": -(nll_sum / jnp.maximum(cnt, 1.0))}

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------

    def score(self, params, batch) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        """Score the eligible slates of a [B, R, O] batch.

        Returns (scores {ll_sum/ll_mean: [B*R, O] float32 — rows of
        ineligible slates undefined}, ok [B*R] bool).
        """
        return self.score_async(params, batch)()

    def score_async(self, params, batch):
        """Stage + dispatch all slate groups of a batch; return a closure
        that fetches and assembles (scores, ok). Dispatches are async, so a
        caller can stage/dispatch the NEXT batch before finalizing this one
        (evaluate_split keeps one batch in flight — the host staging and
        the ~30 ms/dispatch relay latency overlap device compute)."""
        tokens = np.asarray(batch["tokens"])
        B, R, O, Lx = tokens.shape
        NS = B * R
        ok, lc, rows_max = slate_eligibility(batch)
        # eligibility of the batch just dispatched, for callers that stage a
        # fallback for the ~ok slates without waiting on finalize
        self.last_ok = ok
        scores = {k: np.zeros((NS, O), np.float32)
                  for k in ("ll_sum", "ll_mean")}
        sel = np.nonzero(ok)[0]
        if sel.size == 0:
            return lambda: (scores, ok)

        toks = tokens.reshape(NS, O, Lx)
        segs = np.asarray(batch["segments"]).reshape(NS, O, Lx)
        labs = np.asarray(batch["mlm_labels"]).reshape(NS, O, Lx)
        ce = np.asarray(batch["ctx_end"]).reshape(NS, O).astype(np.int32)
        al = np.asarray(batch["ans_len"]).reshape(NS, O).astype(np.int32)
        img_of_slate = np.repeat(np.arange(B, dtype=np.int32), R)
        imask_h = np.asarray(batch["image_mask"])

        # stage the per-image arrays once for the whole batch (compact
        # staging, as in score_flat); indexed on device by the dp-sharded
        # img_index
        imgs = self._put_images({k: batch[k] for k in self._IMG_KEYS})

        # rows each option needs (2*ans_len, truncation-clipped) — packed
        # layout eligibility is decided PER GROUP below, once the group's
        # row-block size is known (real answers are ~2-20 rows; a
        # pathological giant option falls back to the W-padded layout)
        T_all = np.minimum(ce + al, Lx)
        n_all = np.clip(T_all - lc[:, None], 0, Lx).astype(np.int64)

        # sort by context length, balance groups to ONE shape per call;
        # under a mesh the group axis is dp-sharded, so round it up
        sel = sel[np.argsort(lc[sel], kind="stable")]
        n_groups = max(1, -(-sel.size // self.group))
        gsize = -(-sel.size // n_groups)
        gsize = -(-gsize // self._dp) * self._dp

        outs = []
        for gi in range(n_groups):
            g = sel[gi * gsize:(gi + 1) * gsize]
            if g.size == 0:      # dp rounding made earlier groups absorb all
                break
            pad = gsize - g.size
            if pad:
                g = np.concatenate([g, np.repeat(g[-1:], pad)])
            Lcb = masks.quarter_bucket(int(lc[g].max()), Lx,
                                       div=self._bucket_div)

            ctx_batch = self._put(dict(
                tokens=np.ascontiguousarray(toks[g, 0, :Lcb]),
                segments=np.ascontiguousarray(segs[g, 0, :Lcb]),
                mode=np.ones(g.size, np.int32),
                ctx_end=lc[g],
                ans_len=np.zeros(g.size, np.int32),
                img_index=img_of_slate[g]))
            ctx_batch.update(imgs)

            need = int(n_all[g].max())
            rb = self._rb_for(Lcb, need)
            if self.packed and need <= rb:
                gs = g.size
                n = n_all[g]                            # [gs, O] rows/option
                starts, P = pack_option_rows(n, rb)
                reps = n.ravel()
                oid = np.repeat(
                    np.tile(np.arange(O, dtype=np.int64), gs), reps)
                sid = np.repeat(np.repeat(np.arange(gs), O), reps)
                csum = np.concatenate([[0], np.cumsum(reps)[:-1]])
                rin = (np.arange(int(reps.sum()), dtype=np.int64)
                       - np.repeat(csum, reps))
                ppos = np.repeat(starts.ravel(), reps) + rin
                src = lc[g].astype(np.int64)[sid] + rin  # < Lx (n <= T - lc)
                tokens_p = np.zeros((gs, P), np.int32)
                segs_p = np.zeros((gs, P), np.int32)
                labs_p = np.full((gs, P), -1, np.int32)
                opt_p = np.full((gs, P), O, np.int32)
                rin_p = np.zeros((gs, P), np.int32)
                tg, sg, lg = toks[g], segs[g], labs[g]
                tokens_p[sid, ppos] = tg[sid, oid, src]
                segs_p[sid, ppos] = sg[sid, oid, src]
                labs_p[sid, ppos] = lg[sid, oid, src]
                opt_p[sid, ppos] = oid
                rin_p[sid, ppos] = rin
                rows = self._put(dict(
                    tokens=tokens_p, segments=segs_p, mlm_labels=labs_p,
                    opt_id=opt_p, r_in=rin_p, lc=lc[g],
                    ans_len=al[g].astype(np.int32),
                    image_mask=imask_h[img_of_slate[g]]))
                outs.append((g[:gs - pad] if pad else g, pad,
                             self._grp_fn_packed(params, ctx_batch, rows,
                                                 rb=rb)))
                continue

            need = max(1, int(rows_max[g].max()))
            W = 16
            while W < need:
                W *= 2
            W = min(W, Lx)

            idx = lc[g][:, None, None] + np.arange(W, dtype=np.int64)[None,
                                                                      None, :]
            in_range = idx < Lx
            idx_c = np.minimum(idx, Lx - 1)
            take = np.broadcast_to(idx_c, (g.size, O, W))

            def _rows(a, fill):
                v = np.take_along_axis(a[g], take, axis=-1)
                return np.where(in_range, v, fill).astype(a.dtype)

            rows = self._put(dict(
                tokens=_rows(toks, 0), segments=_rows(segs, 0),
                mlm_labels=_rows(labs, -1), lc=lc[g],
                ans_len=al[g], ctx_end=ce[g],
                image_mask=imask_h[img_of_slate[g]]))
            outs.append((g[:g.size - pad] if pad else g, pad,
                         self._grp_fn(params, ctx_batch, rows)))

        def finalize():
            for g, pad, res in outs:
                for k in scores:
                    v = np.asarray(res[k])
                    scores[k][g] = v[:g.size] if pad else v
            return scores, ok

        return finalize
