"""Pure-python LMDB format tests (SURVEY S4, VERDICT r2 item 5):
round-trip through the from-scratch writer/reader, format-level
invariants (meta layout, page types, overflow runs), the dataset-level
image/label analog, and the distributed shard reader."""

import os
import struct

import numpy as np
import pytest

from openocr_spark.sources import lmdb_format as L


def _records(n, vlen=40, seed=0):
    rng = np.random.RandomState(seed)
    return [
        (b"key-%06d" % i, bytes(rng.randint(0, 256, size=vlen, dtype=np.uint8)))
        for i in range(n)
    ]


def test_roundtrip_small(tmp_path):
    recs = _records(10)
    L.write_lmdb(str(tmp_path / "env"), recs)
    got = list(L.LmdbReader(str(tmp_path / "env")).items())
    assert got == sorted(recs)


def test_roundtrip_multi_leaf_and_branch(tmp_path):
    """Enough records to force multiple leaf pages and a branch level."""
    recs = _records(500, vlen=60)
    L.write_lmdb(str(tmp_path / "env"), recs)
    r = L.LmdbReader(str(tmp_path / "env"))
    assert r.entries == 500
    assert list(r.items()) == sorted(recs)
    # point lookups descend the branch correctly
    for k, v in recs[::97]:
        assert r.get(k) == v
    assert r.get(b"zzz-missing") is None


def test_roundtrip_two_branch_levels(tmp_path):
    """~4000 small records -> dozens of leaves -> >1 branch page ->
    a second branch level above them."""
    recs = _records(4000, vlen=24)
    L.write_lmdb(str(tmp_path / "env"), recs)
    r = L.LmdbReader(str(tmp_path / "env"))
    assert list(r.items()) == sorted(recs)
    assert r.get(recs[1234][0]) == recs[1234][1]


def test_overflow_values(tmp_path):
    """Values past the in-page node limit go to overflow page runs."""
    big = [(b"big-%03d" % i, bytes([i % 256]) * (5000 + i)) for i in range(5)]
    small = _records(20)
    L.write_lmdb(str(tmp_path / "env"), big + small)
    r = L.LmdbReader(str(tmp_path / "env"))
    assert list(r.items()) == sorted(big + small)
    for k, v in big:
        assert r.get(k) == v


def test_meta_page_format():
    """The emitted file honors the public layout: magic/version in both
    meta pages, page size recorded in the free-db pad slot, reader picks
    the larger txnid."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        L.write_lmdb(d, _records(3))
        raw = open(os.path.join(d, "data.mdb"), "rb").read()
        for slot in (0, 1):
            off = slot * L.PSIZE + L.PAGEHDRSZ
            magic, version = struct.unpack_from("<II", raw, off)
            assert magic == 0xBEEFC0DE and version == 1
            psize = struct.unpack_from("<I", raw, off + 24)[0]
            assert psize == 4096
        # meta 0 is the pristine env (txnid 0, invalid root)
        txn0 = struct.unpack_from("<Q", raw, 0 * L.PSIZE + L.PAGEHDRSZ + 24 + 96 + 8)[0]
        txn1 = struct.unpack_from("<Q", raw, 1 * L.PSIZE + L.PAGEHDRSZ + 24 + 96 + 8)[0]
        assert (txn0, txn1) == (0, 1)


def test_empty_environment(tmp_path):
    L.write_lmdb(str(tmp_path / "env"), [])
    r = L.LmdbReader(str(tmp_path / "env"))
    assert r.entries == 0
    assert list(r.items()) == []
    assert r.get(b"anything") is None


def test_key_size_limits(tmp_path):
    with pytest.raises(ValueError):
        L.write_lmdb(str(tmp_path / "env"), [(b"", b"v")])
    with pytest.raises(ValueError):
        L.write_lmdb(str(tmp_path / "env2"), [(b"k" * 512, b"v")])
    L.write_lmdb(str(tmp_path / "env3"), [(b"k" * 511, b"v")])
    assert L.LmdbReader(str(tmp_path / "env3")).get(b"k" * 511) == b"v"


def test_dataset_analog_roundtrip(tmp_path):
    """image-%09d / label-%09d / num-samples keying, like
    create_lmdb_dataset.py writes and lmdb_dataset.py reads."""
    samples = [(b"IMGBYTES%d" % i * 10, f"label {i}") for i in range(25)]
    L.write_lmdb_dataset(str(tmp_path / "shard0"), samples)
    got = L.read_lmdb_dataset_records(str(tmp_path / "shard0"))
    assert [(i, img, lab) for i, img, lab in got] == [
        (i + 1, s[0], s[1]) for i, s in enumerate(samples)
    ]
    r = L.LmdbReader(str(tmp_path / "shard0"))
    assert r.get(b"num-samples") == b"25"


def test_distributed_shard_reader(spark, tmp_path):
    """Hierarchical shard walk + per-shard executor decode — the
    LMDBDataSet analog over two shards."""
    s0 = [(b"a" * 50, "zero"), (b"b" * 50, "one")]
    s1 = [(b"c" * 50, "two")]
    L.write_lmdb_dataset(str(tmp_path / "root" / "sh0"), s0)
    L.write_lmdb_dataset(str(tmp_path / "root" / "nested" / "sh1"), s1)
    out = L.read_lmdb_dataset(spark, str(tmp_path / "root"))
    rows = sorted(
        (os.path.basename(r.shard), r.idx, bytes(r.image), r.label)
        for r in out.collect()
    )
    assert rows == [
        ("sh0", 1, b"a" * 50, "zero"),
        ("sh0", 2, b"b" * 50, "one"),
        ("sh1", 1, b"c" * 50, "two"),
    ]
