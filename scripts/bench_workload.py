"""Canonical val_lm bench workload (shared-context generative slates).

The single source of truth for the slate generator used by bench.py,
scripts/bench_pipeline_ab.py, scripts/bench_prefix_ab.py and
scripts/bench_prefix_attr.py — one place to change the workload shape so the
benches stay comparable. The RNG draw ORDER is bench.py's original
(per-option answer draws): changing it would silently change every measured
series.

Layout per (dialog, round): one shared context of 58-191 tokens; per option
a 2-8 token answer appended as the first copy + a masked second copy with
the labels on the second copy, exactly as data/encoding.py's encode_gen
emits for real VisDial slates (the 100 options of a round share their
context and differ only in the answer).
"""

import numpy as np


def realistic_ctx_range(L):
    """Per-round context ranges matching real VisDial dialog growth: the
    round-r context is the caption + r (question, answer) pairs — roughly
    10 + 22*r tokens, so extents grow ~30 at round 1 to ~250 at round 10
    (the reference's val split at max_seq_len 256). +/-15% spread, capped
    to leave room for the two answer copies. Used by bench.py's second
    (realistic-distribution) series; the PINNED headline series keeps the
    original uniform ctx_range."""
    def fn(r):
        base = 10 + 22 * (r + 1)
        lo = max(24, int(base * 0.85))
        hi = min(L - 18, int(base * 1.15))
        return lo, max(lo + 1, hi)
    return fn


def make_dis_batch(rng, cfg, B=2, R=10, O=100, ctx_range=(58, 192),
                   ans_range=(2, 9), feat_dim=None, ctx_range_fn=None):
    """Discriminative (NSP-ranking) slates: context + ONE answer copy per
    option, mode 0, ctx_end = total real length, ans_len = 0 — the layout
    encode_dis emits (data/encoding.py; reference data_utils.py:291-428).
    Same per-(round, option) rng draw conventions as make_val_batch so the
    dis series is length-comparable with the generative one."""
    L, Rg = cfg.max_seq_len, cfg.max_regions
    if feat_dim is None:
        feat_dim = 2048
    tokens = np.zeros((B, R, O, L), np.int32)
    segments = np.zeros((B, R, O, L), np.int32)
    ctx_end = np.zeros((B, R, O), np.int32)
    for b in range(B):
        for r in range(R):
            lc = int(rng.integers(*(ctx_range_fn(r) if ctx_range_fn
                                    else ctx_range)))
            ctx = rng.integers(1, cfg.vocab_size, lc).astype(np.int32)
            cs = rng.integers(0, 2, lc).astype(np.int32)
            for o in range(O):
                a = int(rng.integers(*ans_range))
                ans = rng.integers(1, cfg.vocab_size, a).astype(np.int32)
                t1 = min(lc + a, L)
                tokens[b, r, o, :lc] = ctx
                segments[b, r, o, :lc] = cs
                tokens[b, r, o, lc:t1] = ans[:t1 - lc]
                ctx_end[b, r, o] = t1
    return {
        "tokens": tokens, "segments": segments,
        "mode": np.zeros((B, R, O), np.int32),
        "ctx_end": ctx_end, "ans_len": np.zeros((B, R, O), np.int32),
        "mlm_labels": np.full((B, R, O, L), -1, np.int32),
        "image_feat": rng.normal(size=(B, Rg, feat_dim)).astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
        "gt_option_inds": rng.integers(0, O, (B, R)).astype(np.int32),
        "round_id": rng.integers(1, R + 1, (B,)).astype(np.int32),
        "gt_relevance": rng.random((B, O)).astype(np.float32),
        "image_id": np.arange(B).astype(np.int64),
    }


def make_val_batch(rng, cfg, B=2, R=10, O=100, ctx_range=(58, 192),
                   ans_range=(2, 9), feat_dim=None, ctx_range_fn=None):
    """``ctx_range``/``ans_range``/``feat_dim`` let tiny-config consumers
    (scripts/drive_verify.py, __graft_entry__) reuse this generator; the
    DEFAULTS (and the per-option rng draw order) are frozen — changing them
    changes every measured bench series. ``ctx_range_fn(r) -> (lo, hi)``
    overrides ctx_range per round (the realistic-growth series)."""
    L, Rg = cfg.max_seq_len, cfg.max_regions
    if feat_dim is None:
        feat_dim = 2048
    tokens = np.zeros((B, R, O, L), np.int32)
    segments = np.zeros((B, R, O, L), np.int32)
    labels = np.full((B, R, O, L), -1, np.int32)
    ctx_end = np.zeros((B, R, O), np.int32)
    ans_len = np.zeros((B, R, O), np.int32)
    for b in range(B):
        for r in range(R):
            lc = int(rng.integers(*(ctx_range_fn(r) if ctx_range_fn
                                    else ctx_range)))
            ctx = rng.integers(1, cfg.vocab_size, lc).astype(np.int32)
            cs = rng.integers(0, 2, lc).astype(np.int32)
            for o in range(O):
                a = int(rng.integers(*ans_range))
                ans = rng.integers(1, cfg.vocab_size, a).astype(np.int32)
                tokens[b, r, o, :lc] = ctx
                segments[b, r, o, :lc] = cs
                t1, t2 = lc + a, min(lc + 2 * a, L)
                tokens[b, r, o, lc:t1] = ans
                tokens[b, r, o, t1:t2] = ans[:t2 - t1]
                labels[b, r, o, t1:t2] = ans[:t2 - t1]
                ctx_end[b, r, o] = t1
                ans_len[b, r, o] = a
    return {
        "tokens": tokens, "segments": segments,
        "mode": np.ones((B, R, O), np.int32),
        "ctx_end": ctx_end, "ans_len": ans_len, "mlm_labels": labels,
        "image_feat": rng.normal(size=(B, Rg, feat_dim)).astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
    }
