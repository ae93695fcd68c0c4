"""Prefix-cache gen scorer (eval/prefix.py) vs the flat chunked path.

The prefix decomposition must reproduce the flat scores: context rows and
the vision stream are option-independent under the gen masks, and the
answer-rows pass attends cached context K/V — exact up to float rounding
(separate matmuls regroup accumulations), so fp32 agreement is asserted to
tight tolerances and ranks must match exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import TINY
from unimm_tpu.data import encoding
from unimm_tpu.data.dataset import flatten_for_forward
from unimm_tpu.eval import evaluator
from unimm_tpu.eval.prefix import PrefixScorer, slate_eligibility
from unimm_tpu.models import vilbert


def make_shared_batch(rng, cfg, B=2, R=2, O=5, truncate=False):
    """Realistic gen slates: per (b, r) a shared context of length Lc, per
    option an answer of A tokens laid out as first copy + masked second copy
    (data/encoding.py encode_gen layout), labels on the second copy."""
    L, Rg = cfg.max_seq_len, cfg.max_regions
    tokens = np.zeros((B, R, O, L), np.int32)
    segments = np.zeros((B, R, O, L), np.int32)
    labels = np.full((B, R, O, L), -1, np.int32)
    ctx_end = np.zeros((B, R, O), np.int32)
    ans_len = np.zeros((B, R, O), np.int32)
    for b in range(B):
        for r in range(R):
            lc = int(rng.integers(6, L - 12)) if not truncate else L - 6
            ctx = rng.integers(1, cfg.vocab_size, lc).astype(np.int32)
            cseg = rng.integers(0, 2, lc).astype(np.int32)
            for o in range(O):
                a = int(rng.integers(1, 5))
                ans = rng.integers(1, cfg.vocab_size, a).astype(np.int32)
                tokens[b, r, o, :lc] = ctx
                segments[b, r, o, :lc] = cseg
                t1 = min(lc + a, L)                    # first copy end
                tokens[b, r, o, lc:t1] = ans[:t1 - lc]
                t2 = min(lc + 2 * a, L)                # second copy end
                tokens[b, r, o, t1:t2] = ans[:t2 - t1]
                segments[b, r, o, lc:t2] = cseg[-1] if lc else 0
                labels[b, r, o, t1:t2] = ans[:t2 - t1]
                ctx_end[b, r, o] = lc + a
                ans_len[b, r, o] = a
    return {
        "tokens": tokens, "segments": segments,
        "mode": np.ones((B, R, O), np.int32),
        "ctx_end": ctx_end, "ans_len": ans_len, "mlm_labels": labels,
        "image_feat": rng.normal(size=(B, Rg, cfg.v_feature_size))
        .astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": (np.arange(Rg) < Rg - 1).astype(np.float32)[None]
        .repeat(B, 0),
    }


@pytest.fixture(scope="module")
def params():
    return vilbert.init_params(jax.random.PRNGKey(0), TINY)


def _flat_scores(params, batch, **kw):
    ev = evaluator.RankingEvaluator(TINY, chunk_size=16, dtype=jnp.float32,
                                    need_lm=True, need_nsp=False,
                                    gen_prefix=False, **kw)
    return ev.score_flat(params, flatten_for_forward(
        batch, train=False, compact_images=True))


def test_eligibility(params):
    batch = make_shared_batch(np.random.default_rng(0), TINY)
    ok, lc, rows_max = slate_eligibility(batch)
    assert ok.all()
    np.testing.assert_array_equal(
        lc, (batch["ctx_end"] - batch["ans_len"]).reshape(-1, 5)[:, 0])
    # break one slate's shared context -> only that slate drops out
    batch["tokens"][0, 1, 3, 2] += 1
    ok2, _, _ = slate_eligibility(batch)
    assert not ok2[1] and ok2.sum() == ok.sum() - 1


@pytest.mark.parametrize("group", [2, 3, 16])
def test_prefix_matches_flat_fp32(params, group):
    batch = make_shared_batch(np.random.default_rng(1), TINY, B=2, R=3, O=6)
    ref = _flat_scores(params, batch)
    sc = PrefixScorer(TINY, dtype=jnp.float32, group=group)
    out, ok = sc.score(params, batch)
    assert ok.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    # ranking must be identical
    assert (np.argsort(-out["ll_sum"], axis=-1)
            == np.argsort(-ref["ll_sum"].reshape(-1, 6), axis=-1)).all()


def test_prefix_truncated_second_copy(params):
    """ctx_end + ans_len > L: the masked copy is clipped; rows and labels
    shrink accordingly and must still match the flat path."""
    batch = make_shared_batch(np.random.default_rng(2), TINY, B=1, R=2, O=4,
                              truncate=True)
    assert (batch["ctx_end"] + batch["ans_len"] > TINY.max_seq_len).any()
    ref = _flat_scores(params, batch)
    out, ok = PrefixScorer(TINY, dtype=jnp.float32).score(params, batch)
    assert ok.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_score_slates_with_fallback(params):
    """Mixed batch: ineligible slates (dis mode / broken context sharing)
    route through score_flat; assembled scores match the all-flat result."""
    batch = make_shared_batch(np.random.default_rng(3), TINY, B=2, R=2, O=5)
    batch["mode"][0, 0] = 0          # whole slate discriminative
    batch["ans_len"][0, 0] = 0
    batch["tokens"][1, 1, 2, 1] += 1  # context mismatch
    ref = _flat_scores(batch=batch, params=params)
    ev = evaluator.RankingEvaluator(TINY, chunk_size=16, dtype=jnp.float32,
                                    need_lm=True, need_nsp=False)
    assert ev._prefix is not None
    out = ev.score_slates(params, batch)
    ok, _, _ = slate_eligibility(batch)
    assert not ok.all() and ok.any()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k], ref[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)


def test_prefix_dp_sharded(params):
    """Single-process mesh: the dp-sharded prefix passes (group axis over
    dp, pure-XLA GSPMD partitioning) must match the unsharded scorer."""
    from unimm_tpu.parallel import mesh as pmesh

    batch = make_shared_batch(np.random.default_rng(5), TINY, B=2, R=3, O=6)
    ref, ok0 = PrefixScorer(TINY, dtype=jnp.float32).score(params, batch)
    mesh = pmesh.make_mesh(8, mp=1)
    sc = PrefixScorer(TINY, dtype=jnp.float32, group=4, mesh=mesh)
    assert sc._dp == 8
    out, ok = sc.score(params, batch)
    assert ok.all() and ok0.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k], ref[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)


def test_prefix_on_real_encoder_output(params):
    """Slates built by the actual encode_gen (mask_prob=0, as val_lm builds
    eval options) must be prefix-eligible and score identically."""
    rng = np.random.default_rng(4)
    B, R, O = 1, 2, 4
    arrs = {k: [] for k in ("tokens", "segments", "mode", "ctx_end",
                            "ans_len", "mlm_labels")}
    for _ in range(B * R):
        context = [list(rng.integers(5, TINY.vocab_size, rng.integers(2, 5)))
                   for _ in range(3)]
        opts = []
        for _ in range(O):
            ans = list(rng.integers(5, TINY.vocab_size, rng.integers(1, 4)))
            opts.append(encoding.encode_gen(
                context + [ans], 1, cls_id=1, sep_id=2, mask_id=3,
                max_seq_len=TINY.max_seq_len, mask_prob=0.0,
                rng=np.random.default_rng(0)))
        st = encoding.stack_sequences(opts)
        for k in arrs:
            arrs[k].append(st[k])
    batch = {k: np.stack(v).reshape((B, R, O) + v[0].shape[1:])
             for k, v in arrs.items()}
    Rg = TINY.max_regions
    batch.update({
        "image_feat": rng.normal(size=(B, Rg, TINY.v_feature_size))
        .astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
    })
    ok, _, _ = slate_eligibility(batch)
    assert ok.all()
    ref = _flat_scores(params, batch)
    out, _ = PrefixScorer(TINY, dtype=jnp.float32).score(params, batch)
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_bench_workload_slates_are_prefix_eligible():
    """bench.py's headline number depends on the canonical bench workload
    routing through the prefix scorer: if slate_eligibility ever stops
    accepting it (a workload or eligibility regression), the bench would
    silently measure the ~4x slower flat path instead."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.bench_workload import make_val_batch

    import dataclasses

    rng = np.random.default_rng(0)
    # the generator draws 58-191-token contexts: needs the real max_seq_len
    cfg = dataclasses.replace(TINY, max_seq_len=256)
    batch = make_val_batch(rng, cfg, B=2, R=3, O=8)
    ok, lc, rows_max = slate_eligibility(batch)
    assert ok.all(), ok
    assert (lc > 0).all() and (rows_max >= 1).all()

    # the realistic-growth series (bench.py's second series) must be
    # eligible too, and its extents must actually GROW across the rounds
    from scripts.bench_workload import realistic_ctx_range

    fn = realistic_ctx_range(cfg.max_seq_len)
    R = 10
    batch = make_val_batch(rng, cfg, B=2, R=R, O=8, ctx_range_fn=fn)
    ok, lc, _ = slate_eligibility(batch)
    assert ok.all(), ok
    lc = lc.reshape(2, R)
    assert (lc[:, 0] < 50).all() and (lc[:, -1] > 180).all(), lc
    for r in range(R):
        lo, hi = fn(r)
        assert 1 <= lo < hi <= cfg.max_seq_len - 18
        assert ((lc[:, r] >= lo) & (lc[:, r] < hi)).all(), (r, lc[:, r])


@pytest.mark.parametrize("seed", range(4))
def test_prefix_matches_flat_fuzz(params, seed):
    """Randomized slate sweep: tiny contexts (down to 2 tokens), 1-token
    answers, O=1 slates, and answer-row counts straddling the W bucket
    boundaries must all score exactly like the flat path (fp32)."""
    rng = np.random.default_rng(100 + seed)
    L = TINY.max_seq_len
    B = int(rng.integers(1, 3))
    R = int(rng.integers(1, 4))
    O = int(rng.integers(1, 9))
    Rg = TINY.max_regions
    tokens = np.zeros((B, R, O, L), np.int32)
    segments = np.zeros((B, R, O, L), np.int32)
    labels = np.full((B, R, O, L), -1, np.int32)
    ctx_end = np.zeros((B, R, O), np.int32)
    ans_len = np.zeros((B, R, O), np.int32)
    for b in range(B):
        for r in range(R):
            lc = int(rng.integers(2, L - 2))
            ctx = rng.integers(1, TINY.vocab_size, lc).astype(np.int32)
            cseg = rng.integers(0, 2, lc).astype(np.int32)
            for o in range(O):
                a = int(rng.integers(1, max(2, min(9, L - lc))))
                ans = rng.integers(1, TINY.vocab_size, a).astype(np.int32)
                tokens[b, r, o, :lc] = ctx
                segments[b, r, o, :lc] = cseg
                t1 = min(lc + a, L)
                tokens[b, r, o, lc:t1] = ans[:t1 - lc]
                t2 = min(lc + 2 * a, L)
                tokens[b, r, o, t1:t2] = ans[:t2 - t1]
                segments[b, r, o, lc:t2] = cseg[-1]
                labels[b, r, o, t1:t2] = ans[:t2 - t1]
                ctx_end[b, r, o] = lc + a
                ans_len[b, r, o] = a
    batch = {
        "tokens": tokens, "segments": segments,
        "mode": np.ones((B, R, O), np.int32),
        "ctx_end": ctx_end, "ans_len": ans_len, "mlm_labels": labels,
        "image_feat": rng.normal(size=(B, Rg, TINY.v_feature_size))
        .astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
    }
    ok, _, rows_max = slate_eligibility(batch)
    assert ok.all()
    ref = _flat_scores(params, batch)
    out, ok2 = PrefixScorer(TINY, dtype=jnp.float32,
                            group=int(rng.integers(1, 5))).score(params, batch)
    assert ok2.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=3e-4, atol=3e-5, err_msg=k)


def test_prefix_long_answers_widen_W(params):
    """Answers long enough that the answer-rows pass must widen past its
    16-row base bucket (W doubles to cover need) still match the flat path."""
    rng = np.random.default_rng(42)
    L = TINY.max_seq_len            # 32
    B, R, O, Rg = 1, 2, 3, TINY.max_regions
    tokens = np.zeros((B, R, O, L), np.int32)
    segments = np.zeros((B, R, O, L), np.int32)
    labels = np.full((B, R, O, L), -1, np.int32)
    ctx_end = np.zeros((B, R, O), np.int32)
    ans_len = np.zeros((B, R, O), np.int32)
    for r in range(R):
        lc = 4
        ctx = rng.integers(1, TINY.vocab_size, lc).astype(np.int32)
        for o in range(O):
            a = int(rng.integers(10, 14))       # 2a rows = 20-26 > 16
            ans = rng.integers(1, TINY.vocab_size, a).astype(np.int32)
            tokens[0, r, o, :lc] = ctx
            t1, t2 = lc + a, min(lc + 2 * a, L)
            tokens[0, r, o, lc:t1] = ans
            tokens[0, r, o, t1:t2] = ans[:t2 - t1]
            labels[0, r, o, t1:t2] = ans[:t2 - t1]
            ctx_end[0, r, o], ans_len[0, r, o] = t1, a
    batch = {
        "tokens": tokens, "segments": segments,
        "mode": np.ones((B, R, O), np.int32),
        "ctx_end": ctx_end, "ans_len": ans_len, "mlm_labels": labels,
        "image_feat": rng.normal(size=(B, Rg, TINY.v_feature_size))
        .astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
    }
    ok, _, rows_max = slate_eligibility(batch)
    assert ok.all() and rows_max.max() > 16
    ref = _flat_scores(params, batch)
    out, ok2 = PrefixScorer(TINY, dtype=jnp.float32).score(params, batch)
    assert ok2.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=3e-4, atol=3e-5, err_msg=k)
