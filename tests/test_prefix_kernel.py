"""Fused answer-attention kernel (ops/pallas_prefix.py) vs the flat oracle.

Same acceptance bar as tests/test_prefix.py: the prefix scorer under
``attention_impl='pallas_block'`` (kernel in interpret mode on CPU) must
reproduce the flat full-forward scores in fp32 and keep rank order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import TINY
from tests.test_prefix import _flat_scores, make_shared_batch
from unimm_tpu.eval.prefix import PrefixScorer
from unimm_tpu.models import vilbert
from unimm_tpu.ops import pallas_prefix

PBLK = TINY.replace(attention_impl="pallas_block")


@pytest.fixture(scope="module")
def params():
    return vilbert.init_params(jax.random.PRNGKey(0), TINY)


def test_pick_o_blk():
    assert pallas_prefix.pick_o_blk(100, 16) == 10   # Rw = 160
    assert pallas_prefix.pick_o_blk(100, 32) == 5
    assert pallas_prefix.pick_o_blk(100, 64) == 4
    assert pallas_prefix.pick_o_blk(100, 256) == 1
    assert pallas_prefix.pick_o_blk(6, 16) == 6      # whole slate fits
    assert pallas_prefix.pick_o_blk(7, 256) == 1     # prime O, wide rows


def test_block_rr_bias_structure():
    G, O, W, o_blk = 1, 4, 2, 2
    rng = np.random.default_rng(0)
    rr_open = jnp.asarray(rng.integers(0, 2, (G, O, W, W)).astype(bool))
    b = pallas_prefix.block_rr_bias(rr_open, o_blk)
    assert b.shape == (G, O // o_blk, o_blk * W, o_blk * W)
    b = np.asarray(b)
    for ob in range(O // o_blk):
        for oi in range(o_blk):
            for oj in range(o_blk):
                blk = b[0, ob, oi * W:(oi + 1) * W, oj * W:(oj + 1) * W]
                if oi != oj:                     # cross-option: always closed
                    assert (blk == -10000.0).all()
                else:
                    o = ob * o_blk + oi
                    want = np.where(np.asarray(rr_open)[0, o], 0.0, -10000.0)
                    np.testing.assert_array_equal(blk, want)


@pytest.mark.parametrize("group", [2, 16])
def test_kernel_matches_flat_fp32(params, group):
    batch = make_shared_batch(np.random.default_rng(1), TINY, B=2, R=3, O=6)
    ref = _flat_scores(params, batch)
    out, ok = PrefixScorer(PBLK, dtype=jnp.float32,
                           group=group).score(params, batch)
    assert ok.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    assert (np.argsort(-out["ll_sum"], axis=-1)
            == np.argsort(-ref["ll_sum"].reshape(-1, 6), axis=-1)).all()


def test_kernel_matches_xla_answer_path(params):
    """Direct XLA-vs-kernel equality of the answer pass (no flat detour):
    isolates the kernel from prefill/eligibility differences."""
    batch = make_shared_batch(np.random.default_rng(7), TINY, B=2, R=2, O=5)
    a, ok_a = PrefixScorer(TINY, dtype=jnp.float32).score(params, batch)
    b, ok_b = PrefixScorer(PBLK, dtype=jnp.float32).score(params, batch)
    assert ok_a.all() and ok_b.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(b[k], a[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_kernel_truncated_and_wide_rows(params):
    """Truncated second copies AND answers that widen W past 16 — both
    bucket edges through the kernel path."""
    batch = make_shared_batch(np.random.default_rng(2), TINY, B=1, R=2, O=4,
                              truncate=True)
    ref = _flat_scores(params, batch)
    out, ok = PrefixScorer(PBLK, dtype=jnp.float32).score(params, batch)
    assert ok.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.parametrize("seed", range(3))
def test_kernel_matches_flat_fuzz(params, seed):
    """Randomized slates (odd O, tiny contexts, W straddling buckets)."""
    from tests.test_prefix import test_prefix_matches_flat_fuzz  # noqa: F401
    rng = np.random.default_rng(200 + seed)
    L = TINY.max_seq_len
    B, R, O = int(rng.integers(1, 3)), int(rng.integers(1, 3)), \
        int(rng.integers(1, 8))
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
            for o in range(O):
                a = int(rng.integers(1, max(2, min(9, L - lc))))
                ans = rng.integers(1, TINY.vocab_size, a).astype(np.int32)
                tokens[b, r, o, :lc] = ctx
                t1, t2 = min(lc + a, L), min(lc + 2 * a, L)
                tokens[b, r, o, lc:t1] = ans[:t1 - lc]
                tokens[b, r, o, t1:t2] = ans[:t2 - t1]
                labels[b, r, o, t1:t2] = ans[:t2 - t1]
                ctx_end[b, r, o], ans_len[b, r, o] = lc + a, a
    batch = {
        "tokens": tokens, "segments": segments,
        "mode": np.ones((B, R, O), np.int32),
        "ctx_end": ctx_end, "ans_len": ans_len, "mlm_labels": labels,
        "image_feat": rng.normal(size=(B, Rg, TINY.v_feature_size))
        .astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
    }
    ref = _flat_scores(params, batch)
    out, ok = PrefixScorer(PBLK, dtype=jnp.float32,
                           group=int(rng.integers(1, 5))).score(params, batch)
    assert ok.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=3e-4, atol=3e-5, err_msg=k)


def test_kernel_dp_sharded(params):
    """Single-process mesh: the kernel is shard_mapped over dp (GSPMD has
    no partitioning rule for the custom call) and must match unsharded."""
    from unimm_tpu.parallel import mesh as pmesh

    batch = make_shared_batch(np.random.default_rng(5), TINY, B=2, R=3, O=6)
    ref, ok0 = PrefixScorer(PBLK, dtype=jnp.float32).score(params, batch)
    mesh = pmesh.make_mesh(8, mp=1)
    sc = PrefixScorer(PBLK, dtype=jnp.float32, group=4, mesh=mesh)
    out, ok = sc.score(params, batch)
    assert ok.all() and ok0.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k], ref[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)
