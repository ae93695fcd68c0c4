"""Shared synthetic val-split builder for the data-sharded eval tests
(tests/_multihost_eval_worker.py and the single-process reference run in
test_multihost.py::test_eval_tail_padding_two_process). Pure numpy — safe
to import before (or without) jax.distributed initialisation."""

import numpy as np


def make_split(cfg, N, R, O, seed=3, gt_seed=5):
    """Shared-context gen slates with per-slate DISTINCT answers (first
    answer token = option index + 1) so no two options tie — rank-based
    metrics are then insensitive to float-rounding differences between
    sharded and single-process chunk compositions."""
    rng = np.random.default_rng(seed)
    L, Rg = cfg.max_seq_len, cfg.max_regions
    toks = np.zeros((N, R, O, L), np.int32)
    segs = np.zeros((N, R, O, L), np.int32)
    labs = np.full((N, R, O, L), -1, np.int32)
    ce = np.zeros((N, R, O), np.int32)
    al = np.zeros((N, R, O), np.int32)
    for b in range(N):
        for r in range(R):
            lc = int(rng.integers(6, 16))
            ctx = rng.integers(1, cfg.vocab_size, lc).astype(np.int32)
            cs = rng.integers(0, 2, lc).astype(np.int32)
            for o in range(O):
                a = int(rng.integers(2, 5))
                ans = rng.integers(1, cfg.vocab_size, a).astype(np.int32)
                ans[0] = o + 1
                toks[b, r, o, :lc] = ctx
                segs[b, r, o, :lc] = cs
                t1, t2 = lc + a, min(lc + 2 * a, L)
                toks[b, r, o, lc:t1] = ans
                toks[b, r, o, t1:t2] = ans[:t2 - t1]
                labs[b, r, o, t1:t2] = ans[:t2 - t1]
                ce[b, r, o], al[b, r, o] = t1, a
    grng = np.random.default_rng(gt_seed)
    return {
        "tokens": toks, "segments": segs,
        "mode": np.ones((N, R, O), np.int32),
        "ctx_end": ce, "ans_len": al, "mlm_labels": labs,
        "image_feat": rng.normal(
            size=(N, Rg, cfg.v_feature_size)).astype(np.float32),
        "image_loc": rng.normal(size=(N, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((N, Rg), np.float32),
        "gt_option_inds": grng.integers(0, O, (N, R)).astype(np.int32),
        "round_id": grng.integers(1, R + 1, (N,)).astype(np.int32),
        "gt_relevance": grng.random((N, O)).astype(np.float32),
        "image_id": np.arange(N).astype(np.int64),
    }


class SlateDataset:
    """Dict-split-backed dataset; records served indices for coverage
    assertions."""

    def __init__(self, split, n):
        self.split = split
        self.n = n
        self.served = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.served.append(i)
        return {k: v[i] for k, v in self.split.items()}


def collate(items):
    return {k: np.stack([it[k] for it in items]) for k in items[0]}
