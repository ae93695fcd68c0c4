"""Packed answer-row layout (eval/prefix.py pack_option_rows +
_answer_impl_packed) vs the W-padded layout and the flat oracle.

The packed layout lays every option's 2*ans_len rows out contiguously in
row_block bins (row FLOPs track sum(2*ans_len) instead of O*W — the round-4
answer-pass lever). It must be bit-for-bit a relayout: scores equal to the
W-padded scorer to float rounding, on both the XLA and the fused-kernel
paths, including truncation and the giant-option fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import TINY
from tests.test_prefix import _flat_scores, make_shared_batch, params  # noqa: F401
from unimm_tpu.eval.prefix import PrefixScorer, pack_option_rows


def test_pack_option_rows_no_straddle():
    rng = np.random.default_rng(0)
    n = rng.integers(1, 17, (7, 100))
    rb = 32
    starts, P = pack_option_rows(n, rb, p_quantum=32)
    assert P % rb == 0
    ends = starts + n
    # no option crosses a row-block boundary; options disjoint and in order
    assert (starts // rb == (ends - 1) // rb).all()
    assert (starts[:, 1:] >= ends[:, :-1]).all()
    assert int(ends.max()) <= P
    # packing never does worse than the W-16 layout on these shapes
    assert P <= 100 * 16


def test_pack_option_rows_lcm_quantum():
    """P must be a multiple of BOTH rb (the kernel row grid asserts
    P % rb == 0) and p_quantum — i.e. of lcm(rb, p_quantum) — including
    when rb does not divide the quantum (e.g. row_block=96)."""
    rng = np.random.default_rng(1)
    n = rng.integers(1, 17, (3, 50))
    for rb, q in ((96, 256), (128, 256), (48, 64), (256, 96)):
        starts, P = pack_option_rows(n, rb, p_quantum=q)
        assert P % rb == 0 and P % q == 0, (rb, q, P)
        ends = starts + n
        assert (starts // rb == (ends - 1) // rb).all()
        assert int(ends.max()) <= P


def test_packed_matches_unpacked_xla(params):
    batch = make_shared_batch(np.random.default_rng(11), TINY, B=2, R=3, O=6)
    a, ok_a = PrefixScorer(TINY, dtype=jnp.float32,
                           packed=False).score(params, batch)
    b, ok_b = PrefixScorer(TINY, dtype=jnp.float32,
                           packed=True).score(params, batch)
    assert ok_a.all() and ok_b.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(b[k], a[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)


def test_packed_matches_flat_kernel_path(params):
    """Fused answer kernel consumes the packed block-diagonal bias
    unchanged (options never straddle a row block)."""
    cfg = TINY.replace(attention_impl="pallas_block")
    batch = make_shared_batch(np.random.default_rng(12), TINY, B=2, R=2, O=5)
    ref = _flat_scores(params, batch)
    out, ok = PrefixScorer(cfg, dtype=jnp.float32,
                           packed=True).score(params, batch)
    assert ok.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_packed_kernel_nondefault_row_block(params):
    """Explicit small ``row_block`` on the fused-kernel path: small blocks
    make options span several kernel grid steps per slate (the adaptive
    default picks >=64, fitting a whole tiny slate in one), exercising the
    blocked row->row bias across block boundaries
    (scripts/bench_rowblock_ab.py sweeps this on TPU)."""
    cfg = TINY.replace(attention_impl="pallas_block")
    batch = make_shared_batch(np.random.default_rng(15), TINY, B=2, R=2, O=6)
    ref = _flat_scores(params, batch)
    for rb in (8, 32):
        out, ok = PrefixScorer(cfg, dtype=jnp.float32, packed=True,
                               row_block=rb).score(params, batch)
        assert ok.all()
        for k in ("ll_sum", "ll_mean"):
            np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"rb={rb} {k}")


def test_adaptive_row_block_selection():
    """row_block=0 (default) picks the bin size per group from its context
    bucket: 64 below the Lcb=192/256 crossover measured on v5e, 256 above,
    escalating to 256 when an option does not fit a 64-row bin; an explicit
    row_block pins it (scripts/bench_rowblock_ab.py)."""
    sc = PrefixScorer(TINY, packed=True)
    assert sc._rb_for(64, 10) == 64
    assert sc._rb_for(192, 10) == 64
    assert sc._rb_for(224, 10) == 256
    assert sc._rb_for(256, 10) == 256
    assert sc._rb_for(128, 65) == 256    # giant option: escalate, not fall back
    fixed = PrefixScorer(TINY, packed=True, row_block=128)
    assert fixed._rb_for(256, 10) == 128


def test_unpacked_truncated_second_copy(params):
    """ctx_end + ans_len > L with packed=False: the W-padded layout (the
    giant-option fallback) keeps exact truncation semantics. The PACKED
    truncation case is tests/test_prefix.py::test_prefix_truncated_second_copy
    (packed is the default there)."""
    batch = make_shared_batch(np.random.default_rng(2), TINY, B=1, R=2,
                              O=4, truncate=True)
    assert (batch["ctx_end"] + batch["ans_len"] > TINY.max_seq_len).any()
    ref = _flat_scores(params, batch)
    out, ok = PrefixScorer(TINY, dtype=jnp.float32,
                           packed=False).score(params, batch)
    assert ok.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_giant_option_falls_back_to_w_layout(params):
    """An option needing more rows than row_block routes the whole batch
    through the W-padded layout (still correct, just unpacked)."""
    batch = make_shared_batch(np.random.default_rng(14), TINY, B=1, R=2, O=4)
    sc = PrefixScorer(TINY, dtype=jnp.float32, packed=True, row_block=4)
    ref = _flat_scores(params, batch)
    called = []
    grp_packed = sc._grp_fn_packed

    def spy(*a, **kw):
        called.append(1)
        return grp_packed(*a, **kw)

    sc._grp_fn_packed = spy
    out, ok = sc.score(params, batch)
    assert ok.all() and not called       # rows_max > 4 -> W layout
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k].reshape(-1), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_packed_dp_sharded(params):
    """Packed arrays are [G, P] group-leading; the dp-sharded scorer must
    match the unsharded packed scorer."""
    from unimm_tpu.parallel import mesh as pmesh

    batch = make_shared_batch(np.random.default_rng(15), TINY, B=2, R=3, O=6)
    ref, ok0 = PrefixScorer(TINY, dtype=jnp.float32,
                            packed=True).score(params, batch)
    mesh = pmesh.make_mesh(8, mp=1)
    sc = PrefixScorer(TINY, dtype=jnp.float32, group=4, mesh=mesh,
                      packed=True)
    out, ok = sc.score(params, batch)
    assert ok.all() and ok0.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k], ref[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)


def test_make_ffn_fused_matches_xla(params):
    """PrefixScorer._make_ffn: the fused Pallas FFN (cfg.fused_ffn under
    the kernel path) must equal the XLA ffn_block to float rounding, on
    3-D packed rows, 4-D W-layout rows, and fall back cleanly when the
    row count has no 8-aligned divisor."""
    cfg = TINY.replace(attention_impl="pallas_block")
    sc = PrefixScorer(cfg, dtype=jnp.float32)
    p_inter = params["bert"]["encoder"]["layer"]["0"]["intermediate"]
    p_out = params["bert"]["encoder"]["layer"]["0"]["output"]
    rng0 = None
    rng = np.random.default_rng(3)

    for shape, rows in (((2, 64, TINY.hidden_size), 64),
                        ((2, 3, 16, TINY.hidden_size), 48)):
        h = jnp.asarray(rng.normal(size=shape), jnp.float32)
        f_x = sc._make_ffn(False, rows, rng0, None, True)
        f_k = sc._make_ffn(True, rows, rng0, None, True)
        a = f_x(p_inter, p_out, h)
        b = f_k(p_inter, p_out, h)
        assert a.shape == b.shape == h.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)

    # rows with no divisor from the 8-aligned candidate set -> XLA fallback
    h = jnp.asarray(rng.normal(size=(2, 12, TINY.hidden_size)), jnp.float32)
    f = sc._make_ffn(True, 12, rng0, None, True)
    np.testing.assert_allclose(
        np.asarray(f(p_inter, p_out, h)),
        np.asarray(sc._make_ffn(False, 12, rng0, None, True)(
            p_inter, p_out, h)), rtol=2e-5, atol=2e-6)


def test_packed_dp_sharded_kernel_path(params):
    """dp-sharded packed scorer on the PRODUCTION kernel path (fused answer
    attention + fused FFN, shard_mapped over dp) must match the unsharded
    XLA packed scorer. Mirrors dryrun_multichip's prefix-kernel stage as a
    standing pytest regression."""
    from unimm_tpu.parallel import mesh as pmesh

    batch = make_shared_batch(np.random.default_rng(16), TINY, B=2, R=2, O=4)
    ref, ok0 = PrefixScorer(TINY, dtype=jnp.float32,
                            packed=True).score(params, batch)
    cfg = TINY.replace(attention_impl="pallas_block")
    mesh = pmesh.make_mesh(8, mp=1)
    sc = PrefixScorer(cfg, dtype=jnp.float32, group=4, mesh=mesh,
                      packed=True)
    out, ok = sc.score(params, batch)
    assert ok.all() and ok0.all()
    for k in ("ll_sum", "ll_mean"):
        np.testing.assert_allclose(out[k], ref[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)
