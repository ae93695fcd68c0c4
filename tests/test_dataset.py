"""Dataset behaviour tests on the synthetic fixture tree."""

import numpy as np
import pytest

from tests import fixtures
from unimm_tpu.data import dataset as D


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("visdial")
    paths, tok, reader = fixtures.write_fixture_tree(str(root))
    params = fixtures.default_params(paths)
    return params, tok, reader


def test_train_item_shapes_and_invariants(world):
    params, tok, reader = world
    ds = D.VisdialDataset(params, tok, reader)
    ds.split = "train"
    assert len(ds) == 6
    item = ds[0]
    R, S, L = 10, 1 + params["num_negative_samples"], params["max_seq_len"]
    assert item["tokens"].shape == (R, S, L)
    assert item["next_sentence_label"].shape == (R, S)
    # positive first, negatives after (dataloader_visdial.py:234,264)
    assert (item["next_sentence_label"][:, 0] == 0).all()
    assert (item["next_sentence_label"][:, 1:] == 1).all()
    # negatives in gen mode carry unlikelihood weights on the masked answer
    # copy (context MLM weights stay positive, data_utils.py:183-186,221-225);
    # positives never have negative weights anywhere
    w = item["lm_weight"]
    assert (w[:, 0] >= 0).all()
    mode, ctx_end, ans_len = item["mode"], item["ctx_end"], item["ans_len"]
    for r in range(R):
        for s in range(1, S):
            if mode[r, s] == 1:
                lo = int(ctx_end[r, s])
                hi = min(lo + int(ans_len[r, s]), L)
                assert (w[r, s, lo:hi] == -params["neg_token_weight"]).all()
    # image fields
    assert item["image_feat"].shape == (params["max_regions"], 64)
    assert item["image_label"][0] == 0
    # sequences stay within budget: ctx_end+ans_len can exceed L only via
    # the reference's truncation path
    assert (item["ctx_end"] > 0).all()


def test_train_determinism_and_epoch_variation(world):
    params, tok, reader = world
    ds = D.VisdialDataset(params, tok, reader)
    ds2 = D.VisdialDataset(params, tok, reader)
    i1, i2 = ds[1], ds2[1]
    for k in i1:
        np.testing.assert_array_equal(np.asarray(i1[k]), np.asarray(i2[k]), k)
    ds2.set_epoch(1)
    diff = any(not np.array_equal(np.asarray(ds[1][k]), np.asarray(ds2[1][k]))
               for k in ("tokens", "mode"))
    assert diff


def test_val_item(world):
    params, tok, reader = world
    ds = D.VisdialDataset(params, tok, reader)
    ds.split = "val"
    item = ds[0]
    R, O, L = 10, params["num_options"], params["max_seq_len"]
    assert item["tokens"].shape == (R, O, L)
    assert (item["gt_option_inds"] == 0).all()
    assert item["gt_relevance"].shape == (O,)
    # val_dis=1 -> all discriminative, no labels corrupted (mask_prob=0)
    assert (item["mode"] == 0).all()
    assert (item["mlm_labels"] == -1).all()
    # gen mode for val_dis=0: labels present on the answer copy
    params2 = dict(params, val_dis=0)
    ds2 = D.VisdialDataset(params2, tok, reader)
    ds2.split = "val"
    item2 = ds2[0]
    assert (item2["mode"] == 1).all()
    assert (item2["mlm_labels"] != -1).any()
    assert (item2["ans_len"] > 0).all()


def test_test_item(world):
    params, tok, reader = world
    ds = D.VisdialDataset(dict(params, num_options=100), tok, reader)
    ds.split = "test"
    item = ds[0]
    assert item["tokens"].shape == (1, 100, params["max_seq_len"])
    assert int(item["round_id"]) == 10


def test_dense_dataset(world):
    params, tok, reader = world
    ds = D.VisdialDatasetDense(dict(params, num_options=100), tok, reader)
    item = ds[0]
    assert item["tokens"].shape[1] == 100
    nsp = item["next_sentence_label"][0]
    assert (nsp == 0).sum() == 1
    assert int(nsp[int(item["gt_option"])]) == 0
    assert item["gt_relevance"].shape == (100,)
    # relevance==0 options in gen mode get unlikelihood weights
    if int(item["mode"][0, 0]) == 1:
        rel0 = np.nonzero(item["gt_relevance"] == 0)[0]
        w = item["lm_weight"][0]
        assert (w[rel0] <= 0).all()


def test_collate_and_flatten(world):
    params, tok, reader = world
    ds = D.VisdialDataset(params, tok, reader)
    batch = D.collate([ds[0], ds[1]])
    B, R, S = batch["tokens"].shape[:3]
    assert (B, R, S) == (2, 10, 3)
    flat = D.flatten_for_forward(batch, sample_size=16,
                                 rng=np.random.default_rng(0))
    assert flat["tokens"].shape == (16, params["max_seq_len"])
    assert flat["image_feat"].shape == (16, params["max_regions"], 64)
    assert flat["next_sentence_label"].shape == (16,)
    # no subsample path keeps everything
    flat_all = D.flatten_for_forward(batch)
    assert flat_all["tokens"].shape[0] == B * R * S


def test_neg_fallback_counter(world):
    """A tiny max_seq_len forces the negative-sampling truncation fallback
    (dataloader_visdial.py:178-183 quirk) and the stats counter records it."""
    params, tok, reader = world
    ds = D.VisdialDataset(dict(params, max_seq_len=20), tok, reader)
    ds.split = "train"
    assert ds.stats["neg_truncation_fallbacks"] == 0
    for i in range(len(ds)):
        ds[i]
    assert ds.stats["neg_truncation_fallbacks"] > 0

    # ... and a roomy budget never triggers it
    ds2 = D.VisdialDataset(dict(params, max_seq_len=256), tok, reader)
    ds2.split = "train"
    for i in range(len(ds2)):
        ds2[i]
    assert ds2.stats["neg_truncation_fallbacks"] == 0


def test_length_bucket_morsels_partition_and_norm():
    """Morsels partition all sequences, slice per-token arrays to covering
    buckets, leave sep_indices untouched, and carry the group-level
    lm_norm = total label-token count / k."""
    import numpy as np

    from unimm_tpu.data.dataset import length_bucket_morsels

    L, R, k, n = 64, 5, 3, 12

    def make_flat(seed):
        r = np.random.default_rng(seed)
        ctx = r.integers(6, 60, n).astype(np.int32)
        ans = r.integers(2, 4, n).astype(np.int32)
        labels = np.full((n, L), -1, np.int32)
        for i in range(n):
            s_, e_ = int(ctx[i] - ans[i]), int(ctx[i])
            labels[i, s_:e_] = r.integers(0, 50, e_ - s_)
        return {
            "tokens": r.integers(1, 50, (n, L)).astype(np.int32),
            "segments": r.integers(0, 2, (n, L)).astype(np.int32),
            "positions": np.tile(np.arange(L, dtype=np.int32), (n, 1)),
            "sep_indices": r.integers(0, L, (n, 25)).astype(np.int32),
            "mode": r.integers(0, 2, n).astype(np.int32),
            "ctx_end": ctx, "ans_len": ans, "mlm_labels": labels,
            "lm_weight": (labels != -1).astype(np.float32),
            "next_sentence_label": r.integers(0, 2, n).astype(np.int32),
            "image_feat": r.normal(size=(n, R, 8)).astype(np.float32),
            "image_loc": r.normal(size=(n, R, 5)).astype(np.float32),
            "image_mask": np.ones((n, R), np.float32),
        }

    flats = [make_flat(s) for s in range(k)]
    total_labels = sum(float((f["lm_weight"] != 0).sum()) for f in flats)
    morsels = length_bucket_morsels(flats, L, k)
    assert len(morsels) == k

    # every original sequence appears exactly once (match by token prefix;
    # morsels have different sliced lengths by design), with its own image
    orig_rows = {tuple(t[:8]) for f in flats for t in f["tokens"]}
    orig_imgs = {tuple(t[:8]): f["image_feat"][i].tobytes()
                 for f in flats for i, t in enumerate(f["tokens"])}
    got_rows = [tuple(t[:8]) for m in morsels for t in m["tokens"]]
    assert len(got_rows) == k * n and set(got_rows) == orig_rows

    for m in morsels:
        Lb = m["tokens"].shape[1]
        assert Lb % (L // 4) == 0 and Lb <= L
        assert m["sep_indices"].shape == (len(m["tokens"]), 25)  # not cut
        assert m["positions"].shape[1] == Lb
        lab_pos = (m["mlm_labels"] != -1) * np.arange(1, Lb + 1)
        assert lab_pos.max() <= Lb
        ext = np.where(m["mode"] == 0, m["ctx_end"],
                       m["ctx_end"] + m["ans_len"])
        assert np.clip(ext, 1, L).max() <= Lb
        np.testing.assert_allclose(float(m["lm_norm"]), total_labels / k)
        for i, t in enumerate(m["tokens"]):
            assert orig_imgs[tuple(t[:8])] == m["image_feat"][i].tobytes()

    Ls = [m["tokens"].shape[1] for m in morsels]
    assert Ls == sorted(Ls)   # morsels ascend (sorted by extent)

    # compact inputs are rejected (data-dependent shapes)
    import pytest
    bad = dict(flats[0])
    bad["img_index"] = np.zeros(n, np.int32)
    with pytest.raises(AssertionError):
        length_bucket_morsels([bad] * k, L, k)
