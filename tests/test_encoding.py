"""Bit-level parity tests of the host encoders against the REFERENCE
implementation, imported from /root/reference at test time (it only needs
torch+numpy). On the deterministic path (mask_prob=0, used by every eval
script) all channels must match exactly, and the reference's host-built
[L, L] masks must equal our device-built masks from the 3-int descriptor."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip(
    "utils.data_utils",
    reason="reference checkout not available")  # noqa: E402  (reference oracle)

from unimm_tpu.data import encoding  # noqa: E402
from unimm_tpu.ops import masks  # noqa: E402

CLS, SEP, MASK = 101, 103, 102
VOCAB = 30522


def rand_dialog(rng, n_utt, max_words=8, long_words=None):
    return [[int(rng.integers(1000, 29000))
             for _ in range(int(rng.integers(1, long_words or max_words)))]
            for _ in range(n_utt)]


CASES = [
    (3, 0, 8, 64),    # small dialog, start_segment 0
    (5, 1, 8, 64),
    (1, 1, 4, 32),    # single utterance
    (7, 0, 10, 64),   # likely truncated at 64
    (21, 1, 10, 256), # full-scale dialog
    (9, 0, 30, 128),  # long utterances -> truncation
]


@pytest.mark.parametrize("n_utt,start_seg,max_words,max_len", CASES)
@pytest.mark.parametrize("is_neg,weight", [(0, 1.0), (1, 2.5)])
def test_gen_parity_deterministic(n_utt, start_seg, max_words, max_len,
                                  is_neg, weight):
    rng = np.random.default_rng(hash((n_utt, max_len, is_neg)) % 2**31)
    utts = rand_dialog(rng, n_utt, max_words)

    (r_tok, r_seg, r_pos, r_sep, r_lab, r_w, r_att, r_co) = ref.encode_input_gen(
        [list(u) for u in utts], start_seg, CLS, SEP, MASK,
        max_seq_len=max_len, mask_prob=0, is_negtive=is_neg, weight=weight,
        vocab_size=VOCAB)

    got = encoding.encode_gen(utts, start_seg, CLS, SEP, MASK,
                              max_seq_len=max_len, mask_prob=0,
                              is_negative=bool(is_neg), weight=weight,
                              vocab_size=VOCAB,
                              rng=np.random.default_rng(0))

    np.testing.assert_array_equal(got.tokens, r_tok[0].numpy())
    np.testing.assert_array_equal(got.segments, r_seg[0].numpy())
    np.testing.assert_array_equal(got.positions, r_pos[0].numpy())
    np.testing.assert_array_equal(got.sep_indices, r_sep[0].numpy())
    np.testing.assert_array_equal(got.mlm_labels, r_lab[0].numpy())
    np.testing.assert_allclose(got.lm_weight, r_w[0].numpy())

    # device-built masks from the descriptor == reference host-built masks
    dev_att = np.asarray(masks.text_attention_mask(
        got.mode, got.ctx_end, got.ans_len, max_len)).astype(np.int64)
    np.testing.assert_array_equal(dev_att, r_att[0].numpy())
    dev_co = np.asarray(masks.co_text_mask(
        got.mode, got.ctx_end, got.ans_len, max_len)).astype(np.int64)
    np.testing.assert_array_equal(dev_co, r_co[0].numpy())
    # device-built positions == shipped positions
    np.testing.assert_array_equal(
        np.asarray(masks.position_ids(got.mode, got.ctx_end, got.ans_len,
                                      max_len)), got.positions)


@pytest.mark.parametrize("n_utt,start_seg,max_words,max_len", CASES)
@pytest.mark.parametrize("is_neg,weight", [(0, 1.0), (1, 2.5)])
def test_dis_parity_deterministic(n_utt, start_seg, max_words, max_len,
                                  is_neg, weight):
    rng = np.random.default_rng(hash((n_utt, max_len, is_neg, 7)) % 2**31)
    utts = rand_dialog(rng, n_utt, max_words)

    (r_tok, r_seg, r_pos, r_sep, r_lab, r_w, r_att, r_co) = ref.encode_input_dis(
        [list(u) for u in utts], start_seg, CLS, SEP, MASK,
        max_seq_len=max_len, mask_prob=0, is_negtive=is_neg, weight=weight,
        vocab_size=VOCAB)

    got = encoding.encode_dis(utts, start_seg, CLS, SEP, MASK,
                              max_seq_len=max_len, mask_prob=0,
                              is_negative=bool(is_neg), weight=weight,
                              vocab_size=VOCAB,
                              rng=np.random.default_rng(0))

    np.testing.assert_array_equal(got.tokens, r_tok[0].numpy())
    np.testing.assert_array_equal(got.segments, r_seg[0].numpy())
    np.testing.assert_array_equal(got.positions, r_pos[0].numpy())
    np.testing.assert_array_equal(got.sep_indices, r_sep[0].numpy())
    np.testing.assert_array_equal(got.mlm_labels, r_lab[0].numpy())
    np.testing.assert_allclose(got.lm_weight, r_w[0].numpy())

    dev_att = np.asarray(masks.text_attention_mask(
        got.mode, got.ctx_end, got.ans_len, max_len)).astype(np.int64)
    np.testing.assert_array_equal(dev_att, r_att[0].numpy())
    dev_co = np.asarray(masks.co_text_mask(
        got.mode, got.ctx_end, got.ans_len, max_len)).astype(np.int64)
    np.testing.assert_array_equal(dev_co, r_co[0].numpy())


def test_gen_corruption_statistics():
    """With mask_prob>0: context labels appear at flagged positions, flagged
    tokens become 90% [MASK] / 10% random, second copy is always [MASK]."""
    rng = np.random.default_rng(0)
    n_mask = n_rand = n_ctx_lab = 0
    trials = 200
    for t in range(trials):
        utts = rand_dialog(rng, 5, 8)
        got = encoding.encode_gen(utts, 1, CLS, SEP, MASK, max_seq_len=128,
                                  mask_prob=0.3, vocab_size=VOCAB, rng=rng)
        second = slice(got.ctx_end, min(got.ctx_end + got.ans_len, 128))
        assert (got.tokens[second] == MASK).all()
        ctx_lab = (got.mlm_labels[: got.ctx_end] != -1)
        n_ctx_lab += ctx_lab.sum()
        ctx_tokens = got.tokens[: got.ctx_end][ctx_lab]
        n_mask += (ctx_tokens == MASK).sum()
        n_rand += (ctx_tokens != MASK).sum()
    assert n_ctx_lab > 500
    frac_rand = n_rand / (n_mask + n_rand)
    assert 0.06 < frac_rand < 0.14, frac_rand   # expect ~0.10


def test_weights_negative_sign():
    rng = np.random.default_rng(1)
    utts = rand_dialog(rng, 3, 6)
    got = encoding.encode_gen(utts, 1, CLS, SEP, MASK, max_seq_len=64,
                              mask_prob=0, is_negative=True, weight=3.0,
                              vocab_size=VOCAB, rng=rng)
    second = slice(got.ctx_end, got.ctx_end + got.ans_len)
    assert (got.lm_weight[second] == -3.0).all()
    assert (got.lm_weight[: got.ctx_end] == 0).all()


def test_encode_image_parity_semantics():
    rng = np.random.default_rng(2)
    n_box, F, C = 30, 64, 16
    feats = rng.normal(size=(n_box, F)).astype(np.float32)
    boxes = rng.normal(size=(n_box, 5)).astype(np.float32)
    cls_prob = rng.dirichlet(np.ones(C), n_box).astype(np.float32)

    img = encoding.encode_image(feats, n_box, boxes, cls_prob, max_regions=37,
                                mask_prob=0.15, rng=rng)
    assert img.features.shape == (37, F)
    assert img.image_label[0] == 0                      # <IMG> excluded
    assert (img.image_label == 1).sum() >= 1            # >=1 predicted
    assert (img.image_mask[:n_box] == 1).all()
    assert (img.image_mask[n_box:] == 0).all()
    assert (img.image_label[n_box:] != 1).sum() >= 6    # padding mostly ignored
    # mask_prob=0: only the forced region predicted, features untouched
    img0 = encoding.encode_image(feats, n_box, boxes, cls_prob,
                                 max_regions=37, mask_prob=0,
                                 rng=np.random.default_rng(3))
    assert (img0.image_label == 1).sum() == 1
    np.testing.assert_array_equal(img0.features[:n_box], feats)


def test_prune_rounds():
    ctx = [[1], [2], [3], [4], [5], [6], [7]]   # caption + 3 QA rounds
    out, seg = encoding.prune_rounds(list(ctx), 2)
    assert out == [[4], [5], [6], [7]] and seg == 0
    out, seg = encoding.prune_rounds(list(ctx), 11)
    assert out == ctx and seg == 1
