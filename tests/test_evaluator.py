"""Evaluator unit tests: compact vs expanded image staging equality, chunk
padding correctness, ensemble normalisation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import TINY
from unimm_tpu.data.dataset import flatten_for_forward
from unimm_tpu.eval import evaluator
from unimm_tpu.models import vilbert


def make_val_batch(rng, cfg, B=2, R=3, O=7):
    L, Rg = cfg.max_seq_len, cfg.max_regions
    labels = np.full((B, R, O, L), -1, np.int32)
    labels[..., 20:24] = rng.integers(0, cfg.vocab_size, (B, R, O, 4))
    return {
        "tokens": rng.integers(1, cfg.vocab_size, (B, R, O, L)).astype(np.int32),
        "segments": rng.integers(0, 2, (B, R, O, L)).astype(np.int32),
        "mode": np.ones((B, R, O), np.int32),
        "ctx_end": rng.integers(12, 25, (B, R, O)).astype(np.int32),
        "ans_len": rng.integers(2, 5, (B, R, O)).astype(np.int32),
        "mlm_labels": labels,
        "image_feat": rng.normal(size=(B, Rg, cfg.v_feature_size))
        .astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    params = vilbert.init_params(jax.random.PRNGKey(0), TINY)
    batch = make_val_batch(np.random.default_rng(0), TINY)
    return params, batch


def test_compact_equals_expanded(setup):
    params, batch = setup
    ev = evaluator.RankingEvaluator(TINY, chunk_size=16, dtype=jnp.float32)
    flat_c = flatten_for_forward(batch, train=False, compact_images=True)
    flat_e = flatten_for_forward(batch, train=False, compact_images=False)
    out_c = ev.score_flat(params, flat_c)
    out_e = ev.score_flat(params, flat_e)
    for k in out_c:
        np.testing.assert_allclose(out_c[k], out_e[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_chunk_size_invariance(setup):
    """Results must not depend on chunk size (padding correctness: N=42 with
    chunk 16 pads the last chunk by 6)."""
    params, batch = setup
    flat = flatten_for_forward(batch, train=False, compact_images=True)
    outs = []
    for chunk in (16, 21, 42, 64):
        # length_buckets off: different chunk sizes then bucket sequences
        # at different padded lengths, which changes XLA reduction order by
        # a float-rounding epsilon (bucket exactness has its own tests)
        ev = evaluator.RankingEvaluator(TINY, chunk_size=chunk,
                                        dtype=jnp.float32,
                                        length_buckets=False)
        outs.append(ev.score_flat(params, flat))
    for o in outs[1:]:
        for k in o:
            np.testing.assert_allclose(o[k], outs[0][k], rtol=1e-5,
                                       atol=1e-6)


def test_minmax_per_slate():
    rng = np.random.default_rng(1)
    s = rng.normal(size=(2, 3, 10))
    n = evaluator.minmax_per_slate(s)
    assert n.min() >= 0 and n.max() <= 1
    np.testing.assert_allclose(n.max(axis=-1), 1.0)
    np.testing.assert_allclose(n.min(axis=-1), 0.0)
    # order preserved
    assert (np.argsort(s, -1) == np.argsort(n, -1)).all()


def test_sharded_eval_on_mesh(setup):
    """dp-sharded eval chunks on the virtual 8-device mesh must match the
    single-device results (multi-chip serving path)."""
    from unimm_tpu.parallel import mesh as pmesh

    params, batch = setup
    mesh = pmesh.make_mesh(8, mp=1)
    flat = flatten_for_forward(batch, train=False, compact_images=True)
    ev_m = evaluator.RankingEvaluator(TINY, chunk_size=16, dtype=jnp.float32,
                                      mesh=mesh)
    ev_s = evaluator.RankingEvaluator(TINY, chunk_size=16, dtype=jnp.float32)
    out_m = ev_m.score_flat(params, flat)
    out_s = ev_s.score_flat(params, flat)
    for k in out_m:
        np.testing.assert_allclose(out_m[k], out_s[k], rtol=1e-5, atol=1e-6)


def test_label_bucket_selection(setup):
    params, batch = setup
    ev = evaluator.RankingEvaluator(TINY, chunk_size=8, need_nsp=False)
    flat = flatten_for_forward(batch, train=False, compact_images=True)
    # the fixture writes 4 labels per sequence -> smallest bucket (8)
    assert ev._label_bucket(flat) == 8
    many = dict(flat)
    labels = np.array(flat["mlm_labels"], copy=True)
    labels[0, 1:20] = 5
    many["mlm_labels"] = labels
    assert ev._label_bucket(many) == 32
    none = dict(flat)
    none["mlm_labels"] = np.full_like(labels, -1)
    assert ev._label_bucket(none) == 8


def test_label_budget_invariance(setup):
    """Scores must not depend on the label-position budget as long as it
    covers every real label (the evaluator picks the bucket dynamically)."""
    from unimm_tpu.models import unimm

    params, batch = setup
    flat = flatten_for_forward(batch, train=False, compact_images=False)
    fb = {k: jnp.asarray(v) for k, v in flat.items()}
    lo = unimm.forward_eval(params, TINY, fb, dtype=jnp.float32,
                            need_nsp=False, max_label_positions=8)
    hi = unimm.forward_eval(params, TINY, fb, dtype=jnp.float32,
                            need_nsp=False, max_label_positions=128)
    np.testing.assert_allclose(np.asarray(lo["lm_nll_sum"]),
                               np.asarray(hi["lm_nll_sum"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lo["lm_nll_mean"]),
                               np.asarray(hi["lm_nll_mean"]),
                               rtol=1e-5, atol=1e-5)


def test_length_buckets_exact(setup):
    """Sorted length-bucketed scoring == unbucketed scoring, element for
    element: sequences are sliced to the smallest covering bucket and the
    score vectors restored to input order."""
    params, _ = setup
    rng = np.random.default_rng(7)
    B, R, O = 2, 3, 7
    L = TINY.max_seq_len
    batch = make_val_batch(rng, TINY, B, R, O)
    # half the sequences short (extent <= L/2), half long, shuffled —
    # labels inside each sequence's answer span like real data
    ctx = np.where(rng.random((B, R, O)) < 0.5,
                   rng.integers(8, 12, (B, R, O)),
                   rng.integers(20, 28, (B, R, O))).astype(np.int32)
    ans = rng.integers(2, 4, (B, R, O)).astype(np.int32)
    labels = np.full((B, R, O, L), -1, np.int32)
    for idx in np.ndindex(B, R, O):
        s, e = int(ctx[idx] - ans[idx]), int(ctx[idx])
        labels[idx][s:e] = rng.integers(0, TINY.vocab_size, e - s)
    batch.update(ctx_end=ctx, ans_len=ans, mlm_labels=labels)
    flat = flatten_for_forward(batch, train=False, compact_images=True)

    kw = dict(chunk_size=8, dtype=jnp.float32)
    out_b = evaluator.RankingEvaluator(TINY, length_buckets=True,
                                       **kw).score_flat(params, flat)
    out_p = evaluator.RankingEvaluator(TINY, length_buckets=False,
                                       **kw).score_flat(params, flat)
    assert out_b.keys() == out_p.keys()
    for k in out_b:
        np.testing.assert_allclose(out_b[k], out_p[k], rtol=2e-5, atol=2e-5,
                                   err_msg=k)


def test_length_buckets_exact_dis_expanded(setup):
    """Same equality on the discriminative path with EXPANDED image staging
    (image rows must be permuted together with the sequences)."""
    params, _ = setup
    rng = np.random.default_rng(9)
    batch = make_val_batch(rng, TINY)
    batch["mode"] = np.zeros_like(batch["mode"])
    batch["ctx_end"] = np.where(rng.random(batch["ctx_end"].shape) < 0.5,
                                rng.integers(6, 12, batch["ctx_end"].shape),
                                rng.integers(20, 30, batch["ctx_end"].shape)
                                ).astype(np.int32)
    batch["mlm_labels"][:] = -1
    flat = flatten_for_forward(batch, train=False, compact_images=False)
    kw = dict(chunk_size=8, dtype=jnp.float32, need_lm=False)
    out_b = evaluator.RankingEvaluator(TINY, length_buckets=True,
                                       **kw).score_flat(params, flat)
    out_p = evaluator.RankingEvaluator(TINY, length_buckets=False,
                                       **kw).score_flat(params, flat)
    np.testing.assert_allclose(out_b["nsp_prob"], out_p["nsp_prob"],
                               rtol=2e-5, atol=2e-5)


def test_async_equals_sync(setup):
    """score_flat_async / score_slates_async (the one-batch-in-flight
    pipelined forms used by evaluate_split) must reproduce the sync results
    exactly — including the flat fallback for prefix-ineligible slates that
    dispatches inside finalize."""
    params, batch = setup
    ev = evaluator.RankingEvaluator(TINY, chunk_size=16, dtype=jnp.float32)
    flat = flatten_for_forward(batch, train=False, compact_images=True)
    fin = ev.score_flat_async(params, flat)
    sync = ev.score_flat(params, flat)
    pipe = fin()
    for k in sync:
        np.testing.assert_array_equal(sync[k], pipe[k], err_msg=k)

    from tests.test_prefix import make_shared_batch

    mixed = make_shared_batch(np.random.default_rng(11), TINY)
    mixed["mode"][0, 0] = 0            # one dis-mode slate -> ineligible,
    mixed["ans_len"][0, 0] = 0         # exercises the finalize-time fallback
    evp = evaluator.RankingEvaluator(TINY, chunk_size=16, dtype=jnp.float32,
                                     need_lm=True, need_nsp=False,
                                     prefix_group=2)
    assert evp._prefix is not None
    sync = evp.score_slates(params, mixed)
    pipe = evp.score_slates_async(params, mixed)()
    for k in sync:
        np.testing.assert_array_equal(sync[k], pipe[k], err_msg=k)


def test_evaluate_split_pipelined(setup):
    """The production evaluate_split loop (batch i+1 dispatched before batch
    i is finalized) is deterministic and consumes every batch in order."""
    params, _ = setup
    rng = np.random.default_rng(13)
    batches = []
    for i in range(3):
        b = make_val_batch(rng, TINY)
        B, R, O = b["tokens"].shape[:3]
        b["gt_option_inds"] = rng.integers(0, O, (B, R)).astype(np.int32)
        b["image_id"] = np.arange(i * B, i * B + B, dtype=np.int64)
        b["round_id"] = np.ones((B,), np.int32)
        b["gt_relevance"] = rng.random((B, O)).astype(np.float32)
        batches.append(b)
    kw = dict(mode="ll_sum", chunk_size=16, dtype=jnp.float32,
              progress_every=0, log=lambda *a: None)
    m1 = evaluator.evaluate_split(params, TINY, list(batches), **kw)
    m2 = evaluator.evaluate_split(params, TINY, list(batches), **kw)
    assert m1 == m2
    assert all(np.isfinite(v) for v in m1.values())
    # rank observations: one per (dialog, round) per batch
    ranks = []
    evaluator.evaluate_split(params, TINY, list(batches), ranks_out=ranks,
                             **kw)
    assert len(ranks) == sum(b["tokens"].shape[0] * b["tokens"].shape[1]
                             for b in batches)
    # deeper pipelining (-eval_pipeline): identical metrics and rank order
    # at any in-flight depth, including depth > number of batches
    for depth in (2, 5):
        ranks_d = []
        md = evaluator.evaluate_split(params, TINY, list(batches),
                                      ranks_out=ranks_d,
                                      pipeline_depth=depth, **kw)
        assert md == m1, depth
        assert ranks_d == ranks, depth
    # coalesced serving (-eval_coalesce): batches merged into one dispatch
    # give identical metrics and rank entries, incl. a tail smaller than
    # the coalesce factor and a 'valid' mask on one member
    batches[1]["valid"] = np.ones(batches[1]["tokens"].shape[0], bool)
    ranks_c = []
    mc = evaluator.evaluate_split(params, TINY, list(batches),
                                  ranks_out=ranks_c, coalesce=2, **kw)
    ranks_1 = []
    m1v = evaluator.evaluate_split(params, TINY, list(batches),
                                   ranks_out=ranks_1, coalesce=1, **kw)
    assert mc.keys() == m1v.keys()
    for k in mc:   # ndcg sums per-example values in a different grouping
        assert abs(mc[k] - m1v[k]) < 1e-6, (k, mc[k], m1v[k])
    assert ranks_c == ranks_1


def test_prefix_knobs_plumb_through():
    """-gen_prefix/-prefix_group reach the scorer: gen_prefix=False builds
    no PrefixScorer; prefix_group sets the dispatch group size."""
    import jax.numpy as jnp

    from tests.test_model import TINY
    from unimm_tpu.eval.evaluator import RankingEvaluator

    ev = RankingEvaluator(TINY, chunk_size=8, dtype=jnp.float32,
                          need_lm=True, need_nsp=False, gen_prefix=False)
    assert ev._prefix is None
    ev2 = RankingEvaluator(TINY, chunk_size=8, dtype=jnp.float32,
                           need_lm=True, need_nsp=False, prefix_group=5)
    assert ev2._prefix is not None and ev2._prefix.group == 5
    assert ev2._prefix.packed                 # packed layout is the default
    ev3 = RankingEvaluator(TINY, chunk_size=8, dtype=jnp.float32,
                           need_lm=True, need_nsp=False, prefix_packed=False)
    assert ev3._prefix is not None and not ev3._prefix.packed
