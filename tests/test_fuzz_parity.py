"""Randomised fuzz parity: many random dialog shapes against the reference
encoders (deterministic path), and LMDB readers across page sizes and edge
layouts."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip(
    "utils.data_utils", reason="reference checkout not available")

from unimm_tpu.data import encoding  # noqa: E402
from unimm_tpu.ops import masks  # noqa: E402

CLS, SEP, MASK = 101, 103, 102


def test_fuzz_encode_parity_100_dialogs():
    rng = np.random.default_rng(1234)
    for trial in range(100):
        n_utt = int(rng.integers(1, 22))
        max_len = int(rng.choice([32, 64, 96, 128, 256]))
        start_seg = int(rng.integers(0, 2))
        is_neg = int(rng.integers(0, 2))
        utts = [[int(rng.integers(1000, 29000))
                 for _ in range(int(rng.integers(1, 14)))]
                for _ in range(n_utt)]
        use_gen = bool(rng.integers(0, 2))

        if use_gen:
            r = ref.encode_input_gen([list(u) for u in utts], start_seg, CLS,
                                     SEP, MASK, max_seq_len=max_len,
                                     mask_prob=0, is_negtive=is_neg, weight=1)
            got = encoding.encode_gen(utts, start_seg, CLS, SEP, MASK,
                                      max_seq_len=max_len, mask_prob=0,
                                      is_negative=bool(is_neg), weight=1,
                                      rng=np.random.default_rng(0))
        else:
            r = ref.encode_input_dis([list(u) for u in utts], start_seg, CLS,
                                     SEP, MASK, max_seq_len=max_len,
                                     mask_prob=0, is_negtive=is_neg, weight=1)
            got = encoding.encode_dis(utts, start_seg, CLS, SEP, MASK,
                                      max_seq_len=max_len, mask_prob=0,
                                      is_negative=bool(is_neg), weight=1,
                                      rng=np.random.default_rng(0))
        (r_tok, r_seg, r_pos, r_sep, r_lab, r_w, r_att, r_co) = r
        ctx = (trial, n_utt, max_len, use_gen, is_neg)
        np.testing.assert_array_equal(got.tokens, r_tok[0].numpy(), str(ctx))
        np.testing.assert_array_equal(got.segments, r_seg[0].numpy(), str(ctx))
        np.testing.assert_array_equal(got.positions, r_pos[0].numpy(),
                                      str(ctx))
        np.testing.assert_array_equal(got.mlm_labels, r_lab[0].numpy(),
                                      str(ctx))
        np.testing.assert_allclose(got.lm_weight, r_w[0].numpy(),
                                   err_msg=str(ctx))
        dev_att = np.asarray(masks.text_attention_mask(
            got.mode, got.ctx_end, got.ans_len, max_len)).astype(np.int64)
        np.testing.assert_array_equal(dev_att, r_att[0].numpy(), str(ctx))
        dev_co = np.asarray(masks.co_text_mask(
            got.mode, got.ctx_end, got.ans_len, max_len)).astype(np.int64)
        np.testing.assert_array_equal(dev_co, r_co[0].numpy(), str(ctx))


@pytest.mark.parametrize("psize", [4096, 8192, 16384])
def test_lmdb_fuzz_page_sizes(tmp_path, psize):
    from unimm_tpu.native import lmdb as nlmdb
    from unimm_tpu.native.lmdb_format import Writer

    rng = np.random.default_rng(psize)
    items = []
    # shared-prefix keys, boundary-size values, empties
    for i in range(120):
        key = (b"prefix_" + str(i % 10).encode() + b"_" +
               str(i).zfill(4).encode())
        size = int(rng.choice([0, 1, 100, psize // 2 - 40, psize // 2,
                               psize * 2, 30000]))
        items.append((key, rng.bytes(size)))
    path = str(tmp_path / f"db{psize}.lmdb")
    Writer(psize=psize).write(path, items)

    for backend in ("python", "native"):
        try:
            db = (nlmdb._PythonDB(path) if backend == "python"
                  else nlmdb._NativeDB(path))
        except RuntimeError:
            pytest.skip("no C++ toolchain")
        expected = dict(items)
        assert db.entries == len(expected)
        for k, v in expected.items():
            assert db.get(k) == v, (backend, psize, k)
        assert db.get(b"prefix_") is None
        assert dict(db.items()) == expected
        db.close()


def test_lmdb_single_and_empty(tmp_path):
    from unimm_tpu.native import lmdb as nlmdb
    from unimm_tpu.native.lmdb_format import Writer

    p1 = str(tmp_path / "one.lmdb")
    Writer().write(p1, [(b"k", b"v")])
    db = nlmdb.open(p1)
    assert db.get(b"k") == b"v" and db.get(b"j") is None

    p0 = str(tmp_path / "zero.lmdb")
    Writer().write(p0, [])
    db0 = nlmdb.open(p0)
    assert db0.get(b"k") is None
    assert list(db0.items()) == []
