"""LMDB format tests: writer fixtures read back by BOTH the pure-Python and
the native C++ readers (two independent implementations cross-validated),
including overflow values, multi-level trees, and the full
LmdbFeatureReader -> dataset pipeline."""

import os
import pickle

import numpy as np
import pytest

from unimm_tpu.native import lmdb as nlmdb
from unimm_tpu.native.lmdb_format import Reader, Writer


def make_items(rng, n=300, big_every=17):
    items = []
    for i in range(n):
        key = f"key_{i:06d}".encode()
        if i % big_every == 0:
            value = rng.bytes(int(rng.integers(5000, 60000)))   # overflow
        else:
            value = rng.bytes(int(rng.integers(1, 800)))
        items.append((key, value))
    return items


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    items = make_items(rng)
    path = str(tmp_path_factory.mktemp("db") / "test.lmdb")
    Writer().write(path, items)
    return path, dict(items)


def _check_reader(db, expected):
    assert db.entries == len(expected)
    rng = np.random.default_rng(1)
    keys = list(expected)
    for k in rng.choice(len(keys), 50, replace=False):
        key = keys[int(k)]
        assert db.get(key) == expected[key], key
    assert db.get(b"missing_key") is None
    assert db.get(b"") is None
    got = dict(db.items())
    assert got == expected


def test_python_reader(db_path):
    path, expected = db_path
    db = nlmdb._PythonDB(path)
    _check_reader(db, expected)
    db.close()


def test_native_reader(db_path):
    path, expected = db_path
    try:
        db = nlmdb._NativeDB(path)
    except RuntimeError:
        pytest.skip("no C++ toolchain")
    _check_reader(db, expected)
    db.close()


def test_backends_agree_bytewise(db_path):
    path, expected = db_path
    py = nlmdb._PythonDB(path)
    try:
        nat = nlmdb._NativeDB(path)
    except RuntimeError:
        pytest.skip("no C++ toolchain")
    for key in list(expected)[:100]:
        assert py.get(key) == nat.get(key)
    py.close()
    nat.close()


def test_single_page_db(tmp_path):
    path = str(tmp_path / "small.lmdb")
    items = [(b"a", b"1"), (b"b", b"2"), (b"zz", b"3" * 100)]
    Writer().write(path, items)
    db = nlmdb.open(path)
    assert db.get(b"a") == b"1"
    assert db.get(b"zz") == b"3" * 100
    assert db.get(b"c") is None


def test_feature_reader_pipeline(tmp_path):
    """End-to-end: reference-schema LMDB (pickled records + 'keys' entry) ->
    LmdbFeatureReader -> processed region features."""
    from tests.fixtures import make_feature_records
    from unimm_tpu.data.features import LmdbFeatureReader, process_record

    rng = np.random.default_rng(2)
    image_ids = [101, 202, 303]
    records = make_feature_records(rng, image_ids, feat_dim=64, n_classes=32,
                                   b64=True)
    items = [(b"keys", pickle.dumps([str(i).encode() for i in image_ids]))]
    for i, rec in records.items():
        items.append((str(i).encode(), pickle.dumps(rec)))
    path = str(tmp_path / "feats.lmdb")
    Writer().write(path, items)

    reader = LmdbFeatureReader(path)
    assert reader.keys() == [str(i).encode() for i in image_ids]
    feats, n, loc, loc_ori, cls_prob = reader[202]
    expected = process_record(records[202])
    np.testing.assert_array_equal(feats, expected[0])
    assert n == expected[1]
    np.testing.assert_array_equal(loc, expected[2])
    np.testing.assert_array_equal(cls_prob, expected[4])


def test_short_and_corrupt_files(tmp_path):
    """Truncated/garbage files fail cleanly (ValueError / None), never
    crash or read out of bounds."""
    short = tmp_path / "short.mdb"
    short.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError):
        nlmdb._PythonDB(str(short))
    try:
        with pytest.raises(ValueError):
            nlmdb._NativeDB(str(short))
    except RuntimeError:
        pass
    # valid magic but absurd psize field: must not be used as an offset
    import struct
    from unimm_tpu.native.lmdb_format import MAGIC, PAGEHDRSZ, VERSION
    evil = bytearray(16384)
    struct.pack_into("<QHHHH", evil, 0, 0, 0, 0x08, PAGEHDRSZ, 4096)
    struct.pack_into("<II", evil, PAGEHDRSZ, MAGIC, VERSION)
    struct.pack_into("<I", evil, PAGEHDRSZ + 24, 16384 - 100)  # psize field
    # empty tree root in MAIN_DBI (db1 root at meta+8+16+48+40)
    struct.pack_into("<Q", evil, PAGEHDRSZ + 8 + 16 + 48 + 40,
                     0xFFFFFFFFFFFFFFFF)
    p = tmp_path / "evil.mdb"
    p.write_bytes(bytes(evil))
    db = nlmdb._PythonDB(str(p))     # meta0 accepted, offset not trusted
    assert db.get(b"x") is None


def test_npz_to_lmdb_roundtrip(tmp_path):
    """npz -> reference-format LMDB -> reader: records parse identically
    (both converter directions compose)."""
    import pickle

    from unimm_tpu.data.features import (LmdbFeatureReader,
                                         convert_npz_to_lmdb)

    rng = np.random.default_rng(11)
    arrays = {}
    for i in (101, 202):
        n = int(rng.integers(5, 12))
        arrays[f"{i}_features"] = rng.normal(size=(n, 32)).astype(np.float32)
        arrays[f"{i}_boxes"] = (rng.random((n, 4)) * 100).astype(np.float32)
        arrays[f"{i}_cls_prob"] = rng.random((n, 7)).astype(np.float32)
        arrays[f"{i}_hw"] = np.asarray([480, 640], np.int32)
    npz_path = str(tmp_path / "f.npz")
    np.savez_compressed(npz_path, **arrays)

    lmdb_path = str(tmp_path / "f.lmdb")
    convert_npz_to_lmdb(npz_path, lmdb_path)

    reader = LmdbFeatureReader(lmdb_path)
    assert reader.keys() == [b"101", b"202"]
    for i in (101, 202):
        out = reader[i]
        # process_record output: (features, num_boxes+1, locations,
        # locations_ori, cls_prob) — validate against the raw arrays
        raw = pickle.loads(reader.db.get(str(i).encode()))
        assert raw["image_id"] == i
        dec = np.frombuffer(
            __import__("base64").b64decode(raw["features"]),
            np.float32).reshape(arrays[f"{i}_features"].shape)
        np.testing.assert_array_equal(dec, arrays[f"{i}_features"])
        assert out[0].shape[0] == arrays[f"{i}_features"].shape[0] + 1
