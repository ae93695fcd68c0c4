"""Golden tests for the descriptor-based mask builders.

The expected masks are built here by an INDEPENDENT step-by-step construction
that follows the reference host-side assignment sequence
(/root/reference/utils/data_utils.py: gen :149-210, dis :300-354) literally,
with numpy. The vectorised device builders in unimm_tpu/ops/masks.py must
match it bit-for-bit on every descriptor combination.
"""

import numpy as np
import pytest

from unimm_tpu.ops import masks


def ref_gen_mask(L1, A, max_len):
    """Reference generative mask via the literal assignment sequence."""
    seq = np.arange(max_len)
    causal = seq[None, :] < seq[:, None]        # strictly lower-triangular
    causal2 = seq[None, :] <= seq[:, None]      # inclusive
    m = (seq[None, :] == seq[:, None]).astype(np.int64)  # identity init
    m[0, : L1 + A] = 1
    m[1 : L1 - A, 1 : L1 - A] = 1
    m[L1 - A : L1, 1:L1] = causal2[L1 - A : L1, 1:L1]
    if L1 + A <= max_len:
        m[L1 : L1 + A, 1:L1] = causal[L1 - A : L1, 1:L1]
        m[L1 + A :, :] = 0
    else:
        m[L1:max_len, 1:L1] = causal[L1 - A : max_len - A, 1:L1]
    return m.astype(bool)


def ref_dis_mask(L, max_len):
    m = np.zeros((max_len, max_len), dtype=np.int64)
    m[:L, :L] = 1
    return m.astype(bool)


def ref_gen_co(L1, A, max_len):
    c = np.zeros(max_len, dtype=np.int64)
    c[1 : L1 - A] = 1
    return c.astype(bool)


def ref_dis_co(L, max_len):
    c = np.zeros(max_len, dtype=np.int64)
    c[:L] = 1
    return c.astype(bool)


def ref_gen_positions(L1, A, max_len):
    # context+first copy get 0..L1-1; second copy repeats [L1-A, L1)
    # (data_utils.py:194,227), truncated to max_len then zero-padded.
    ids = list(range(L1)) + list(range(L1 - A, L1))
    ids = ids[:max_len]
    return np.array(ids + [0] * (max_len - len(ids)), dtype=np.int32)


GEN_CASES = [
    # (L1, A): L1 = context + first answer copy + SEP; A = answer+SEP length
    (10, 3, 32),
    (12, 1, 32),     # 1-token answer + SEP? A = ans_len+1 = 2 min; A=1 = lone SEP
    (29, 4, 32),     # untruncated, exactly fits: L1+A > max -> truncated branch
    (30, 4, 32),     # truncated
    (31, 2, 32),     # heavily truncated
    (28, 4, 32),     # L1+A == max exactly (boundary: fits)
    (5, 4, 32),      # context of a single utterance
    (250, 6, 256),   # full-size: fits exactly
    (252, 6, 256),   # full-size truncated
    (100, 30, 256),  # long answer
    (40, 5, 32),     # context alone exceeds max (L1 > max_len)
    (33, 5, 32),     # L1 just past max
    (300, 10, 256),  # full-size context overflow
]


@pytest.mark.parametrize("L1,A,max_len", GEN_CASES)
def test_gen_text_mask(L1, A, max_len):
    got = np.asarray(masks.text_attention_mask(1, L1, A, max_len))
    np.testing.assert_array_equal(got, ref_gen_mask(L1, A, max_len))


@pytest.mark.parametrize("L", [1, 2, 17, 31, 32, 256])
def test_dis_text_mask(L):
    max_len = max(32, L)
    got = np.asarray(masks.text_attention_mask(0, L, 0, max_len))
    np.testing.assert_array_equal(got, ref_dis_mask(L, max_len))


@pytest.mark.parametrize("L1,A,max_len", GEN_CASES)
def test_gen_co_mask(L1, A, max_len):
    got = np.asarray(masks.co_text_mask(1, L1, A, max_len))
    np.testing.assert_array_equal(got, ref_gen_co(L1, A, max_len))


@pytest.mark.parametrize("L", [1, 17, 32])
def test_dis_co_mask(L):
    got = np.asarray(masks.co_text_mask(0, L, 0, 32))
    np.testing.assert_array_equal(got, ref_dis_co(L, 32))


@pytest.mark.parametrize("L1,A,max_len", GEN_CASES)
def test_gen_positions(L1, A, max_len):
    got = np.asarray(masks.position_ids(1, L1, A, max_len))
    np.testing.assert_array_equal(got, ref_gen_positions(L1, A, max_len))


def test_dis_positions():
    got = np.asarray(masks.position_ids(0, 10, 0, 16))
    exp = np.array(list(range(10)) + [0] * 6, dtype=np.int32)
    np.testing.assert_array_equal(got, exp)


def test_batched_mixed_modes():
    """Vectorised over a batch mixing dis and gen descriptors."""
    mode = np.array([0, 1, 1, 0])
    ctx_end = np.array([20, 15, 30, 5])
    ans_len = np.array([0, 4, 6, 0])
    got = np.asarray(masks.text_attention_mask(mode, ctx_end, ans_len, 32))
    assert got.shape == (4, 32, 32)
    np.testing.assert_array_equal(got[0], ref_dis_mask(20, 32))
    np.testing.assert_array_equal(got[1], ref_gen_mask(15, 4, 32))
    np.testing.assert_array_equal(got[2], ref_gen_mask(30, 6, 32))
    np.testing.assert_array_equal(got[3], ref_dis_mask(5, 32))


def test_additive_bias_values():
    b = np.asarray(masks.text_self_bias(0, 2, 0, 4))
    assert b.shape == (1, 4, 4)
    assert b[0, 0, 0] == 0.0
    assert b[0, 0, 3] == masks.NEG_INF
    co = np.asarray(masks.co_attention_bias(1, 10, 3, 16))
    assert co.shape == (1, 1, 16)
    assert co[0, 0, 0] == masks.NEG_INF   # [CLS] hidden from image in gen mode
    assert co[0, 0, 1] == 0.0
    assert co[0, 0, 7] == masks.NEG_INF   # first answer copy hidden


def test_gen_answer_hiding_semantics():
    """The masked second copy at position i must see context + TRUE answer
    tokens strictly before i (the autoregressive-MLM property), and the image
    stream must never see any answer token."""
    L1, A, max_len = 20, 5, 32
    m = np.asarray(masks.text_attention_mask(1, L1, A, max_len))
    # masked-copy row for answer token k attends first-copy tokens < k only
    for k in range(A):
        row = L1 + k
        virt = L1 - A + k
        # sees all context and first-copy positions j with 1 <= j < virt
        assert m[row, 1:virt].all()
        assert not m[row, virt:L1].any()
        # does not see other masked-copy tokens (except itself)
        self_col = np.zeros(max_len, bool); self_col[row] = True
        assert not (m[row, L1:] & ~self_col[L1:]).any()
    co = np.asarray(masks.co_text_mask(1, L1, A, max_len))
    assert not co[L1 - A:].any()
