"""Candidate-ranking evaluation: the framework's flagship serving path.

Covers all four reference eval modes in one engine:
* generative sequence log-likelihood ranking   (val_lm.py:121-143)
* generative token-averaged log-likelihood     (val_avg_lm.py:120-148)
* discriminative NSP-probability ranking       (train.py:180-290 visdial_evaluate)
* multi-model ensemble with per-slate min-max normalisation
  (val.py:151-164, evaluate.py:108-118)

TPU-native structure: all candidates of a batch of dialogs are flattened to
one [N, L] descriptor batch, processed by ONE jitted forward per fixed-size
chunk (padded, so only two executable shapes ever compile), with the
answer-token NLL computed at gathered label positions via online softmax —
the reference instead runs 250-sequence chunks that each materialise
[250, 256, 30522] logits and a Python rank loop.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import unimm
from unimm_tpu.ops import masks as M_masks
from unimm_tpu.ops import metrics as M

# per-chunk sequence arrays. 'positions'/'sep_indices' are intentionally NOT
# shipped: eval always regenerates position ids from the descriptor on
# device, which tests prove identical to the host-built ones
# (test_encoding.py::test_gen_parity_deterministic).
_SEQ_KEYS = ("tokens", "segments", "mode", "ctx_end", "ans_len",
             "mlm_labels", "img_index")
_IMG_KEYS = ("image_feat", "image_loc", "image_mask")


class RankingEvaluator:
    def __init__(self, cfg: VilbertConfig, *, chunk_size: int = 256,
                 dtype=jnp.bfloat16, need_lm=True, need_nsp=True, mesh=None,
                 length_buckets=True, bucket_div: int = 8,
                 gen_prefix=True, prefix_group: int = 40,
                 prefix_packed=True, prefix_rowblock: int = 0):
        """``mesh``: optional jax.sharding.Mesh — eval chunks are dp-sharded
        across it (multi-chip serving; chunk_size must divide the dp axis).

        ``length_buckets``: score sequences sorted by their true attended
        extent (dis: ctx_end; gen: min(ctx_end + ans_len, L) — rows beyond
        are fully masked, ops/masks.py), each chunk sliced to the smallest
        covering multiple of L/bucket_div. Attention cost is ~quadratic, FFN
        linear in sequence length, and real VisDial rounds grow from short
        to long, so sorting makes early-round chunks run at half length.
        EXACT: masked-out columns contribute exp(-1e4)=0 to the fp32
        softmax and no valid row or the co-attention mask ever reaches past
        the extent (equality tested in test_evaluator.py). Scores are
        re-assembled into the caller's order.

        ``gen_prefix``: for LM-only scoring (need_nsp=False), score slates
        whose options share a context via the prefix-cache scorer
        (eval/prefix.py: one context prefill per slate + per-option
        answer-rows passes) through ``score_slates``; ineligible slates fall
        back to the flat path. A mesh dp-shards the prefix passes; under a
        multi-process mesh every process stages the same global grouping
        from the replicated val batch and contributes its dp-block, like
        score_flat's multi-host chunks."""
        self.cfg = cfg
        self.chunk = chunk_size
        self.dtype = dtype
        self.mesh = mesh
        self.length_buckets = length_buckets
        # bucket granularity: buckets are multiples of max_len/bucket_div;
        # div 8 beat div 4 on the val_lm bench (2.51 -> 2.59 d/s/chip) and
        # bounds the compiled executables at 8 per (chunk, label-bucket)
        self._bucket_div = bucket_div
        self._chunk_sharding = None
        self._repl = None
        self._nproc = 1
        if mesh is not None:
            from unimm_tpu.parallel import mesh as pmesh
            assert chunk_size % mesh.shape[pmesh.DP] == 0, \
                (chunk_size, dict(mesh.shape))
            self._chunk_sharding = pmesh.batch_sharding(mesh)
            self._repl = pmesh.replicated(mesh)
            # multi-host serving: every process runs score_flat over the SAME
            # host data (the val split is replicated, as in the reference);
            # each device_puts only its slice of every chunk and the global
            # arrays are assembled without host-global staging
            self._nproc = pmesh.mesh_process_count(mesh)
            assert chunk_size % self._nproc == 0, (chunk_size, self._nproc)
            # each process's devices must own whole contiguous dp-row blocks
            # (mp axes spanning processes would make the per-process chunk
            # slice non-contiguous in dp order)
            assert mesh.shape[pmesh.DP] % self._nproc == 0, \
                ("multi-host serving requires the dp axis to span processes "
                 "(mp must stay within a process)", dict(mesh.shape),
                 self._nproc)

        def fwd(params, batch, pmax):
            out = unimm.forward_eval(params, cfg, batch, dtype=dtype,
                                     need_lm=need_lm, need_nsp=need_nsp,
                                     max_label_positions=pmax, mesh=mesh)
            res = {}
            if need_nsp:
                # P(next) = softmax(logits)[:, 0]  (train.py:261-263)
                res["nsp_prob"] = jax.nn.softmax(
                    out["nsp_logits"], axis=-1)[:, 0]
            if need_lm:
                res["ll_sum"] = -out["lm_nll_sum"]
                res["ll_mean"] = -out["lm_nll_mean"]
            if self._repl is not None and self._nproc > 1:
                # replicate the tiny per-sequence score vectors so every
                # process can fetch them (dp-sharded outputs are not
                # addressable across hosts)
                res = {k: jax.lax.with_sharding_constraint(v, self._repl)
                       for k, v in res.items()}
            return res

        self._fwd = jax.jit(fwd, static_argnames="pmax")
        self._need_lm = need_lm
        self._prefix = None
        if (gen_prefix and need_lm and not need_nsp
                and not cfg.in_batch_pairs and not cfg.fast_mode):
            from unimm_tpu.eval.prefix import PrefixScorer
            self._prefix = PrefixScorer(cfg, dtype=dtype, group=prefix_group,
                                        bucket_div=bucket_div, mesh=mesh,
                                        packed=prefix_packed,
                                        row_block=prefix_rowblock)

    def _label_bucket(self, flat) -> int:
        """Smallest power-of-two label budget covering this batch.

        The MLM-head cost is linear in the budget and real answers carry ~8
        label tokens, so scoring at the 128 worst-case budget wastes ~16x the
        head FLOPs. Buckets (vs exact counts) keep the number of compiled
        executables bounded at 5."""
        if not self._need_lm:
            return unimm.MAX_LABEL_POSITIONS
        counts = (np.asarray(flat["mlm_labels"]) != -1).sum(axis=-1)
        need = int(counts.max(initial=1))
        p = 8
        while p < need:
            p *= 2
        return min(p, unimm.MAX_LABEL_POSITIONS)

    def _length_order(self, flat):
        """(sort order, sorted extents) by true attended extent
        (ops/masks.attended_extent; the mlm_labels guard keeps bucketing
        exact even for synthetic inputs with labels past the extent).
        Buckets are the multiples of Lmax/bucket_div
        (masks.quarter_bucket). Measured on the val_lm bench (v5e): halves
        {128, 256} 1.86 -> 2.20 d/s/chip, quarters {64..256} -> 2.51,
        eighths {32..256} -> 2.59 (+39% total)."""
        ext = M_masks.attended_extent(
            flat["mode"], flat["ctx_end"], flat["ans_len"],
            flat["tokens"].shape[-1],
            flat.get("mlm_labels") if self._need_lm else None)
        order = np.argsort(ext, kind="stable")
        return order, ext[order]

    def score_flat(self, params, flat: Dict[str, np.ndarray]) -> dict:
        """Score a flat [N, ...] batch in fixed-size padded chunks.

        Per-image arrays (compact storage + img_index) are staged on device
        ONCE for the whole batch; only the small sequence arrays move per
        chunk. With ``length_buckets`` the sequences are scored in
        ascending-extent order at per-chunk length buckets and the score
        vectors are restored to input order before returning."""
        return self.score_flat_async(params, flat)()

    def score_flat_async(self, params, flat: Dict[str, np.ndarray]):
        """Stage + dispatch all chunks of a flat batch; return a closure
        that fetches and assembles the score dict. Lets a caller pipeline
        the next batch's host staging/dispatch against this batch's device
        compute (evaluate_split keeps one batch in flight)."""
        N = flat["tokens"].shape[0]
        Lmax = flat["tokens"].shape[-1]
        compact = "img_index" in flat
        pmax = self._label_bucket(flat)
        order = None
        if self.length_buckets and N > 1:
            order, ext_sorted = self._length_order(flat)
            seq_keys = [k for k in _SEQ_KEYS if k in flat] + \
                [k for k in _IMG_KEYS if k in flat and not compact]
            flat = dict(flat, **{k: np.asarray(flat[k])[order]
                                 for k in seq_keys})

        def put_img(v):
            if self._repl is None:
                return jnp.asarray(v)
            if self._nproc > 1:
                return jax.make_array_from_process_local_data(
                    self._repl, np.asarray(v), np.asarray(v).shape)
            return jax.device_put(v, self._repl)

        imgs = ({k: put_img(flat[k]) for k in _IMG_KEYS if k in flat}
                if compact else {})
        chunk_keys = list(_SEQ_KEYS) + ([] if compact else list(_IMG_KEYS))
        outs: List[dict] = []
        for s in range(0, N, self.chunk):
            e = min(s + self.chunk, N)
            chunk = {k: flat[k][s:e] for k in chunk_keys if k in flat}
            pad = self.chunk - (e - s)
            if pad:
                chunk = {k: np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in
                    chunk.items()}
            if order is not None:
                Lb = M_masks.quarter_bucket(int(ext_sorted[s:e].max()), Lmax,
                                            div=self._bucket_div)
                if Lb < Lmax:
                    for k in ("tokens", "segments", "mlm_labels"):
                        if k in chunk:
                            chunk[k] = np.ascontiguousarray(
                                chunk[k][:, :Lb])
            if self._chunk_sharding is not None and self._nproc > 1:
                # contribute only this process's rows; the global chunk is
                # assembled via make_array_from_process_local_data
                from unimm_tpu.parallel import mesh as pmesh
                k = self.chunk // self._nproc
                r = jax.process_index()
                chunk = pmesh.shard_batch(
                    {key: v[r * k:(r + 1) * k] for key, v in chunk.items()},
                    self.mesh)
            elif self._chunk_sharding is not None:
                chunk = {k: jax.device_put(v, self._chunk_sharding)
                         for k, v in chunk.items()}
            else:
                chunk = {k: jnp.asarray(v) for k, v in chunk.items()}
            chunk.update(imgs)
            # keep results on device; fetch in finalize() so successive
            # chunk (and next-batch) dispatches overlap with compute
            outs.append((e - s, self._fwd(params, chunk, pmax)))

        def finalize():
            fetched = [{k: np.asarray(v)[:n] for k, v in res.items()}
                       for n, res in outs]
            scores = {k: np.concatenate([o[k] for o in fetched])
                      for k in fetched[0]}
            if order is not None:
                inv = np.empty_like(order)
                inv[order] = np.arange(N)
                scores = {k: v[inv] for k, v in scores.items()}
            return scores

        return finalize

    def score_slates(self, params, batch: Dict[str, np.ndarray]) -> dict:
        """Score a structured [B, R, O] val batch; returns flat [B*R*O]
        scores in the same order/keys as ``score_flat`` over
        ``flatten_for_forward(batch)``.

        Slates whose 100 options share a generative context are scored by
        the prefix-cache scorer (one context prefill + answer-rows passes,
        eval/prefix.py); the rest go through the flat chunked path."""
        return self.score_slates_async(params, batch)()

    def score_slates_async(self, params, batch: Dict[str, np.ndarray]):
        """Stage + dispatch a [B, R, O] val batch; return a closure that
        fetches and assembles the flat [B*R*O] score dict — the pipelined
        form of ``score_slates`` (evaluate_split dispatches batch i+1
        before finalizing batch i, hiding host staging and relay latency
        behind device compute)."""
        from unimm_tpu.data.dataset import flatten_for_forward

        B, R, O = batch["tokens"].shape[:3]
        if self._prefix is None:
            return self.score_flat_async(
                params, flatten_for_forward(batch, train=False,
                                            compact_images=True))
        fin_prefix = self._prefix.score_async(params, batch)
        # eligibility is decided host-side at dispatch time, so the flat
        # fallback for ineligible slates (rare: synthetic mixes, dis-mode
        # options) is dispatched eagerly too — mixed batches keep pipelining
        ok = self._prefix.last_ok
        fin_flat, m = None, None
        if not ok.all():
            flat = flatten_for_forward(batch, train=False,
                                       compact_images=True)
            m = np.repeat(~ok, O)
            # per-image arrays (_IMG_KEYS) pass whole; every per-sequence
            # array, img_index included, is masked to the ineligible rows
            sub = {k: (v if k in _IMG_KEYS else v[m])
                   for k, v in flat.items()}
            fin_flat = self.score_flat_async(params, sub)

        def finalize():
            pref, _ = fin_prefix()
            scores = {k: v.reshape(B * R * O).copy() for k, v in pref.items()}
            if fin_flat is not None:
                fb = fin_flat()
                for k in scores:
                    scores[k][m] = fb[k]
            return scores

        return finalize


def _merge_batches(bs: Sequence[dict]) -> dict:
    """Concatenate loader batches along the dialog axis (coalesced serving:
    one bigger dispatch amortises the per-dispatch relay overhead). The
    'valid' tail-padding mask is merged treating absent masks as all-True."""
    if len(bs) == 1:
        return bs[0]
    keys = set(bs[0]) - {"valid"}
    for b in bs[1:]:
        if set(b) - {"valid"} != keys:
            # explicit (not assert): input validation must survive python -O
            raise ValueError(
                f"coalesced batches must share keys: {sorted(keys)} vs "
                f"{sorted(set(b) - {'valid'})}")
    out = {k: np.concatenate([np.asarray(b[k]) for b in bs], axis=0)
           for k in keys}
    if any("valid" in b for b in bs):
        out["valid"] = np.concatenate(
            [np.asarray(b["valid"]) if "valid" in b
             else np.ones(np.asarray(b["tokens"]).shape[0], bool)
             for b in bs])
    return out


def _coalesced(loader, n: int):
    """Yield (loader batches merged, merged batch) groups of up to n."""
    buf: List[dict] = []
    for b in loader:
        buf.append(b)
        if len(buf) == n:
            yield len(buf), _merge_batches(buf)
            buf = []
    if buf:
        yield len(buf), _merge_batches(buf)


def _serving_loop(loader, dispatch, consume, *, pipeline_depth: int,
                  coalesce: int):
    """Shared pipelined/coalesced serving driver (evaluate_split and
    evaluate_ensemble): dispatch batch group i+depth before fetching group
    i's scores, so host staging + relay latency overlap device compute.
    ``consume(done, batch, fin)`` receives the cumulative LOADER-batch count
    after the group — progress accounting counts loader batches (matching
    len(loader)), not dispatch groups."""
    if pipeline_depth < 1:
        raise ValueError(f"pipeline_depth must be >= 1, got {pipeline_depth}")
    if coalesce < 1:
        raise ValueError(f"coalesce must be >= 1, got {coalesce}")
    pending: List[tuple] = []
    done = 0
    for nb, batch in _coalesced(loader, coalesce):
        done += nb
        fin = dispatch(batch)
        pending.append((done, batch, fin))
        if len(pending) > pipeline_depth:
            consume(*pending.pop(0))
    for p in pending:
        consume(*p)


def evaluate_split(params, cfg: VilbertConfig, loader, *, mode: str,
                   chunk_size: int = 256, dtype=jnp.bfloat16,
                   ranks_out: Optional[list] = None,
                   progress_every: int = 10, log=print, mesh=None,
                   gen_prefix: bool = True, prefix_group: int = 40,
                   prefix_packed: bool = True, prefix_rowblock: int = 0,
                   process_merge: bool = False,
                   pipeline_depth: int = 1,
                   coalesce: int = 2) -> dict:
    """Run ranking eval over a val loader.

    mode: 'nsp' (discriminative), 'll_sum' (val_lm), 'll_mean' (val_avg_lm).
    Returns the metric dict (R@k/mean/MRR (+rounds) + NDCG).

    ``pipeline_depth`` batches are kept in flight: batch i+depth is staged
    and dispatched before batch i's scores are fetched, so host staging +
    the per-dispatch relay latency overlap device compute (jax dispatch is
    async). Depth 1 hides one batch of staging; deeper keeps the device fed
    across consecutive host-side consume() stalls at the cost of holding
    depth batches' score buffers on device.

    ``coalesce`` merges that many consecutive loader batches into one
    scoring dispatch (exact — metrics/ranks are per-row). With a matching
    ``prefix_group`` (= slates per coalesced batch) it amortises the fixed
    per-dispatch relay overhead over more slates; the defaults (2 batches,
    group 40) won the interleaved A/B by +12% over one-dispatch-per-batch
    (scripts/bench_coalesce_ab.py; group 60 was worse and unstable).

    Batches may carry a boolean ``valid`` row mask (the process-sharded
    DataLoader pads non-divisible tails by duplicating the last row):
    invalid rows are scored (fixed shapes) but excluded from metrics and
    ``ranks_out``. With ``process_merge`` (data-sharded multi-host eval:
    each process's loader holds a disjoint shard) the per-process metric
    statistics are allgathered and summed at the end, so every process
    returns the global metrics — identical to one process scoring the whole
    split. This is distinct from the replicated-loader multi-host mode
    (``mesh`` spanning processes, every process iterating the same data).
    """
    from unimm_tpu.data.dataset import flatten_for_forward

    need_lm = mode in ("ll_sum", "ll_mean")
    ev = RankingEvaluator(cfg, chunk_size=_fit_chunk(chunk_size, mesh),
                          dtype=dtype, need_lm=need_lm,
                          need_nsp=not need_lm, mesh=mesh,
                          gen_prefix=gen_prefix, prefix_group=prefix_group,
                          prefix_packed=prefix_packed,
                          prefix_rowblock=prefix_rowblock)
    sparse = M.SparseGTMetrics()
    ndcg = M.NDCG()
    key = "nsp_prob" if mode == "nsp" else mode

    def dispatch(batch):
        if need_lm:
            return ev.score_slates_async(params, batch)
        return ev.score_flat_async(
            params, flatten_for_forward(batch, train=False,
                                        compact_images=True))

    logged = 0

    def consume(done, batch, finalize):
        nonlocal logged
        B, R, O = batch["tokens"].shape[:3]
        out = finalize()[key].reshape(B, R, O)
        # rows duplicated by the loader's tail padding: scored (fixed
        # shapes) but never observed
        valid = (np.asarray(batch["valid"]) if "valid" in batch
                 else np.ones(B, bool))

        if ranks_out is not None:
            ranks = np.asarray(M.scores_to_ranks(out))
            for b in range(B):
                if not valid[b]:
                    continue
                for r in range(R):
                    ranks_out.append({
                        "image_id": int(batch["image_id"][b]),
                        "round_id": r + 1,
                        "ranks": [int(x) for x in ranks[b, r]],
                    })

        sparse.observe(out[valid], np.asarray(batch["gt_option_inds"])[valid])
        rid = np.asarray(batch["round_id"]).reshape(B)
        dense_scores = out[np.arange(B), rid - 1]
        ndcg.observe(dense_scores[valid],
                     np.asarray(batch["gt_relevance"])[valid])
        # progress counts LOADER batches (so the printed count matches
        # len(loader) regardless of coalescing); one line per consumed
        # dispatch group whenever a progress_every boundary was crossed
        if progress_every and done // progress_every > logged:
            logged = done // progress_every
            cur = {**sparse.retrieve(reset=False),
                   **ndcg.retrieve(reset=False)}
            # a data-sharded process can have seen only padding rows so far
            # (nproc > global batch size): its accumulators are empty
            keys = ("r@1", "r@5", "r@10", "mean", "mrr", "ndcg")
            body = " ".join(f"{k} {cur[k]:.4f}" for k in keys if k in cur)
            log(f"eval batches: {done} "
                + (body or "(no valid rows on this process yet)"))

    _serving_loop(loader, dispatch, consume,
                  pipeline_depth=pipeline_depth, coalesce=coalesce)
    if process_merge and jax.process_count() > 1:
        return M.allreduce_metrics(sparse, ndcg)
    return {**sparse.retrieve(), **ndcg.retrieve()}


def _fit_chunk(chunk_size: int, mesh) -> int:
    """Round the chunk down to a multiple of the dp axis when sharding."""
    if mesh is None:
        return chunk_size
    from unimm_tpu.parallel import mesh as pmesh
    dp = mesh.shape[pmesh.DP]
    return max(dp, (chunk_size // dp) * dp)


def minmax_per_slate(scores: np.ndarray) -> np.ndarray:
    """Per-slate min-max normalisation for ensembling (val.py:151-158)."""
    lo = scores.min(axis=-1, keepdims=True)
    hi = scores.max(axis=-1, keepdims=True)
    return (scores - lo) / np.maximum(hi - lo, 1e-12)


def evaluate_ensemble(param_list: Sequence, cfg: VilbertConfig, loader, *,
                      mode: str = "nsp", chunk_size: int = 256,
                      dtype=jnp.bfloat16, ranks_out: Optional[list] = None,
                      test_split: bool = False, log=print, mesh=None,
                      gen_prefix: bool = True, prefix_group: int = 40,
                      prefix_packed: bool = True, prefix_rowblock: int = 0,
                      process_merge: bool = False,
                      pipeline_depth: int = 1, coalesce: int = 1,
                      progress_every: int = 10) -> dict:
    """Multi-checkpoint ensemble: per-model scores are min-max normalised per
    slate and summed (val.py:151-164 / evaluate.py:108-132). With
    ``test_split`` the loader yields [B, 1, 100] slates and ranks_out records
    the EvalAI format (round_id from the data); no metrics are computed (the
    test split has no ground truth).

    Full serving parity with evaluate_split: ``pipeline_depth`` batch groups
    in flight (all ensemble members' passes for group i+depth dispatched
    before group i is fetched), ``coalesce`` loader batches per dispatch
    group, the loader's ``valid`` tail-padding mask excluding duplicated
    rows from metrics and ranks_out, and ``process_merge`` allgathering the
    per-process metric statistics under data-sharded multi-host eval."""
    from unimm_tpu.data.dataset import flatten_for_forward

    need_lm = mode in ("ll_sum", "ll_mean")
    ev = RankingEvaluator(cfg, chunk_size=_fit_chunk(chunk_size, mesh),
                          dtype=dtype, need_lm=need_lm,
                          need_nsp=not need_lm, mesh=mesh,
                          gen_prefix=gen_prefix, prefix_group=prefix_group,
                          prefix_packed=prefix_packed,
                          prefix_rowblock=prefix_rowblock)
    sparse = M.SparseGTMetrics()
    ndcg = M.NDCG()
    key = "nsp_prob" if mode == "nsp" else mode
    logged = 0

    def dispatch(batch):
        if need_lm:
            return [ev.score_slates_async(params, batch)
                    for params in param_list]
        flat = flatten_for_forward(batch, train=False, compact_images=True)
        return [ev.score_flat_async(params, flat) for params in param_list]

    def consume(done, batch, fins):
        nonlocal logged
        B, R, O = batch["tokens"].shape[:3]
        total = np.zeros((B, R, O), np.float64)
        for fin in fins:
            total += minmax_per_slate(fin()[key].reshape(B, R, O))
        # rows duplicated by the process-sharded loader's tail padding are
        # scored (fixed shapes) but never ranked or observed
        valid = (np.asarray(batch["valid"]) if "valid" in batch
                 else np.ones(B, bool))

        if ranks_out is not None:
            ranks = np.asarray(M.scores_to_ranks(total))
            for b in range(B):
                if not valid[b]:
                    continue
                if test_split:
                    ranks_out.append({
                        "image_id": int(batch["image_id"][b]),
                        "round_id": int(np.asarray(batch["round_id"])
                                        .reshape(B)[b]),
                        "ranks": [int(x) for x in ranks[b, 0]],
                    })
                else:
                    for r in range(R):
                        ranks_out.append({
                            "image_id": int(batch["image_id"][b]),
                            "round_id": r + 1,
                            "ranks": [int(x) for x in ranks[b, r]],
                        })
        if not test_split:
            sparse.observe(total[valid],
                           np.asarray(batch["gt_option_inds"])[valid])
            rid = np.asarray(batch["round_id"]).reshape(B)
            ndcg.observe(total[np.arange(B), rid - 1][valid],
                         np.asarray(batch["gt_relevance"])[valid])
        if progress_every and done // progress_every > logged:
            logged = done // progress_every
            log(f"eval batches: {done}")

    _serving_loop(loader, dispatch, consume,
                  pipeline_depth=pipeline_depth, coalesce=coalesce)
    if test_split:
        return {}
    if process_merge and jax.process_count() > 1:
        return M.allreduce_metrics(sparse, ndcg)
    return {**sparse.retrieve(), **ndcg.retrieve()}


def dump_ranks(ranks: list, path: str, all_processes: bool = False):
    # multi-host serving: every process computes identical ranks from the
    # replicated scores; only process 0 writes (shared-filesystem race).
    # Data-sharded eval (all_processes=True) instead writes per-rank files
    # of its disjoint shard — the caller puts the rank in ``path``.
    if (not all_processes and jax.process_count() > 1
            and jax.process_index() != 0):
        return
    with open(path, "w") as f:
        json.dump(ranks, f)


def dump_ranks_merged(ranks: list, path: str) -> int:
    """Write ONE predictions file from data-sharded eval (the reference
    emits a single save_name file, val_lm.py:186-190): every process's
    disjoint rank entries are allgathered and process 0 writes them sorted
    by (image_id, round_id) — deterministic regardless of how the loader
    interleaved the shards. Single-process: plain dump. Returns the merged
    record count (on every process; only process 0 wrote the file)."""
    if jax.process_count() == 1:
        ranks = sorted(ranks, key=lambda e: (e["image_id"], e["round_id"]))
        with open(path, "w") as f:
            json.dump(ranks, f)
        return len(ranks)
    from jax.experimental import multihost_utils

    # per-process entry counts AND per-entry option counts can differ
    # (disjoint shards, padded tails, heterogeneous slates) — agree on the
    # widths, pad, allgather, then strip the padding using each entry's
    # own carried length (padding zeros would otherwise masquerade as
    # rank values; real ranks are 1-based)
    n = len(ranks)
    o = max((len(e["ranks"]) for e in ranks), default=0)
    dims = np.asarray(multihost_utils.process_allgather(
        np.asarray([n, o], np.int64)))
    n_max, o_max = int(dims[:, 0].max()), int(dims[:, 1].max())
    n_total = int(dims[:, 0].sum())
    if n_max == 0:
        if jax.process_index() == 0:
            with open(path, "w") as f:
                json.dump([], f)
        return n_total
    # row layout: [valid, image_id, round_id, o_len, ranks...]
    flat = np.zeros((n_max, 4 + o_max), np.int64)
    for i, e in enumerate(ranks):
        flat[i, 0] = 1
        flat[i, 1] = e["image_id"]
        flat[i, 2] = e["round_id"]
        flat[i, 3] = len(e["ranks"])
        flat[i, 4:4 + len(e["ranks"])] = e["ranks"]
    g = np.asarray(multihost_utils.process_allgather(flat))
    if jax.process_index() != 0:
        return n_total
    rows = g.reshape(-1, 4 + o_max)
    rows = rows[rows[:, 0] == 1]
    merged = [{"image_id": int(r[1]), "round_id": int(r[2]),
               "ranks": [int(x) for x in r[4:4 + int(r[3])]]}
              for r in rows]
    merged.sort(key=lambda e: (e["image_id"], e["round_id"]))
    with open(path, "w") as f:
        json.dump(merged, f)
    return len(merged)
