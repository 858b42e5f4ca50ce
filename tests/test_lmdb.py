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


def test_text_lmdb_dataset_reader(spark, tmp_path):
    """TextLMDBDataSet analog (text_lmdb_dataset.py key scheme:
    label-%09d + num-samples, NO image keys)."""
    recs = [(b"label-%09d" % (i + 1), f"line {i}".encode()) for i in range(4)]
    recs.append((b"num-samples", b"4"))
    L.write_lmdb(str(tmp_path / "root" / "sh0"), recs)
    out = L.read_text_lmdb_dataset(spark, str(tmp_path / "root"))
    rows = sorted((r.idx, r.label) for r in out.collect())
    assert rows == [(1, "line 0"), (2, "line 1"), (3, "line 2"), (4, "line 3")]


# --- interop with REAL liblmdb (ADVICE r3 item 3): the reader/writer
# were previously validated only against each other; these tests break
# that circularity with the C library on both directions -------------

GOLDEN_ENV = os.path.join(os.path.dirname(__file__), "golden", "lmdb_golden")


def _golden_records():
    """The records tests/golden/lmdb_golden/data.mdb holds — the file
    was produced ONCE by real liblmdb (mdb_load 0.9.x, classic btree,
    4096-byte pages; tree depth 2, 1 branch + 10 leaf + 2 overflow
    pages) from this exact self-describing generator:
      key-0000..key-0799 -> md5(key) * (1 + i % 3)   (16/32/48 bytes)
      big-value-key      -> bytes(range(256)) * 24   (6144 B, overflow)
    """
    import hashlib

    recs = {
        b"key-%04d" % i: hashlib.md5(b"key-%04d" % i).digest() * (1 + i % 3)
        for i in range(800)
    }
    recs[b"big-value-key"] = bytes(range(256)) * 24
    return recs


def test_reader_decodes_real_liblmdb_golden():
    """The from-scratch reader must decode a data.mdb written by the C
    library — meta pages, branch descent, leaf nodes, overflow run —
    not just files from the sibling writer."""
    r = L.LmdbReader(GOLDEN_ENV)
    want = _golden_records()
    assert r.entries == len(want) == 801
    assert dict(r.items()) == want
    assert r.get(b"key-0555") == want[b"key-0555"]
    assert r.get(b"big-value-key") == want[b"big-value-key"]
    assert r.get(b"missing") is None


def test_real_mdb_dump_reads_our_writer(tmp_path):
    """Real liblmdb (mdb_dump) must accept the from-scratch writer's
    output byte-for-byte — the reverse interop direction. Skipped when
    the C tools aren't on PATH."""
    import shutil
    import subprocess

    if shutil.which("mdb_dump") is None:
        pytest.skip("liblmdb tools not available")
    recs = _records(300, vlen=48, seed=5) + [(b"big", bytes(range(256)) * 20)]
    env = str(tmp_path / "env")
    L.write_lmdb(env, recs)
    out = subprocess.run(
        ["mdb_dump", env], capture_output=True, text=True, check=True
    ).stdout.splitlines()
    i = out.index("HEADER=END") + 1
    pairs = []
    while out[i] != "DATA=END":
        pairs.append(
            (bytes.fromhex(out[i].strip()), bytes.fromhex(out[i + 1].strip()))
        )
        i += 2
    assert dict(pairs) == dict(recs)
    assert len(pairs) == len(recs)


# --- incremental commits (lmdb_append: the create_lmdb_dataset.py
# writeCache-every-1000 pattern; VERDICT r3 missing-item 4) ----------


def test_append_adds_and_updates(tmp_path):
    env = str(tmp_path / "env")
    L.write_lmdb(env, [(b"a", b"1"), (b"b", b"2")])
    L.lmdb_append(env, [(b"c", b"3"), (b"b", b"2x")])  # new key + update
    r = L.LmdbReader(env)
    assert dict(r.items()) == {b"a": b"1", b"b": b"2x", b"c": b"3"}
    assert r.entries == 3
    assert r.txnid == 2  # fresh env commits txn 1; append is txn 2
    assert r.get(b"b") == b"2x"


def test_append_many_batches_with_overflow(tmp_path):
    """Several commits, each a valid checkpoint; big values take the
    overflow path inside an append transaction too."""
    env = str(tmp_path / "env")
    L.write_lmdb(env, _records(50, seed=1))
    want = dict(_records(50, seed=1))
    for batch in range(4):
        recs = [(b"batch%d-%03d" % (batch, i), bytes([batch]) * (100 + i))
                for i in range(100)]
        recs.append((b"huge-%d" % batch, bytes([batch]) * 9000))
        L.lmdb_append(env, recs)
        want.update(recs)
        r = L.LmdbReader(env)
        assert dict(r.items()) == want  # every commit readable in full
    assert L.LmdbReader(env).txnid == 5


def test_append_crash_before_meta_keeps_old_txn(tmp_path):
    """Copy-on-write durability: pages appended but the meta slot NOT
    yet published (simulated by truncating the file back around the
    meta write) leave the previous transaction fully readable."""
    env = str(tmp_path / "env")
    L.write_lmdb(env, [(b"k%d" % i, b"v%d" % i) for i in range(30)])
    before = open(tmp_path / "env" / "data.mdb", "rb").read()
    L.lmdb_append(env, [(b"new", b"val")])
    after = open(tmp_path / "env" / "data.mdb", "rb").read()
    # simulate the crash: new pages on disk, meta slots still the OLD
    # ones (the publish is the last fsync'd step)
    crashed = before[: 2 * 4096] + after[2 * 4096 :]
    crash_env = tmp_path / "crash"
    crash_env.mkdir()
    (crash_env / "data.mdb").write_bytes(crashed)
    r = L.LmdbReader(str(crash_env))
    assert r.get(b"new") is None
    assert dict(r.items()) == {b"k%d" % i: b"v%d" % i for i in range(30)}


def test_real_liblmdb_reads_appended_env(tmp_path):
    """mdb_stat/mdb_dump (the C library) must accept a multi-
    transaction environment produced by write_lmdb + lmdb_append."""
    import shutil
    import subprocess

    if shutil.which("mdb_dump") is None:
        pytest.skip("liblmdb tools not available")
    env = str(tmp_path / "env")
    L.write_lmdb(env, _records(40, seed=2))
    L.lmdb_append(env, [(b"zz-extra", b"tail"), (b"big", b"\xab" * 6000)])
    want = dict(_records(40, seed=2))
    want.update({b"zz-extra": b"tail", b"big": b"\xab" * 6000})
    out = subprocess.run(
        ["mdb_dump", env], capture_output=True, text=True, check=True
    ).stdout.splitlines()
    i = out.index("HEADER=END") + 1
    pairs = {}
    while out[i] != "DATA=END":
        pairs[bytes.fromhex(out[i].strip())] = bytes.fromhex(out[i + 1].strip())
        i += 2
    assert pairs == want


def test_append_reclaims_pages_bounded_file(tmp_path):
    """N append cycles over a fixed-size payload keep the file size
    BOUNDED (VERDICT r4 next-round #6): each commit reuses the pages
    the live meta no longer reaches instead of appending a fresh tree,
    and records what it freed in a real FREE-db entry."""
    env = str(tmp_path / "env")
    recs = {f"key-{i:04d}".encode(): (b"v%04d" % i) * 40 for i in range(200)}
    L.write_lmdb(env, recs)
    sizes = []
    for cycle in range(12):
        upd = {
            f"key-{i:04d}".encode(): (b"c%02d|" % cycle) + (b"x" * 156)
            for i in range(200)
        }
        L.lmdb_append(env, upd)
        sizes.append(os.path.getsize(os.path.join(env, "data.mdb")))
    # steady state after the first two cycles: ~2 trees ping-ponging
    assert sizes[-1] == sizes[2], sizes
    # contents correct after all that reuse
    r = L.LmdbReader(env)
    got = dict(r.items())
    assert len(got) == 200
    assert got[b"key-0007"].startswith(b"c11|")
    # the freelist is real: the latest commit recorded what it freed,
    # and nothing in it is reachable from the live meta
    fl = r.freelist()
    assert r.txnid in fl and len(fl[r.txnid]) > 0
    assert not (set(fl[r.txnid]) & r.reachable_pages())


def test_real_liblmdb_reads_reclaimed_env(tmp_path):
    """mdb_dump must accept an environment whose pages have been
    recycled through many commits (scattered tree + real FREE db)."""
    import shutil
    import subprocess

    if shutil.which("mdb_dump") is None:
        pytest.skip("mdb_dump not installed")
    env = str(tmp_path / "env")
    L.write_lmdb(env, {b"a": b"1", b"big": b"z" * 9000})
    for cycle in range(6):
        L.lmdb_append(
            env,
            {b"a": b"cycle-%d" % cycle, b"big": bytes([cycle]) * 9000,
             b"k%d" % (cycle % 3): b"v" * 100},
        )
    out = subprocess.run(
        ["mdb_dump", "-p", env], capture_output=True, text=True, check=True
    )
    assert "cycle-5" in out.stdout


def test_reader_corruption_terminates_cleanly(tmp_path):
    """Bit-flipped data.mdb files must either read consistently or
    raise a clean exception — never spin in a B+tree pointer cycle.
    (Reader walks carry visited-set / depth guards for this.)"""
    recs = [(b"key-%04d" % i, b"v" * (i % 257)) for i in range(300)]
    env = str(tmp_path / "env")
    L.write_lmdb(env, recs)
    with open(os.path.join(env, "data.mdb"), "rb") as f:
        good = bytearray(f.read())
    rng = np.random.RandomState(99)
    for trial in range(200):
        data = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(0, len(data))] ^= 1 << rng.randint(0, 8)
        with open(os.path.join(env, "data.mdb"), "wb") as f:
            f.write(data)
        try:
            r = L.LmdbReader(env)
            list(r.items())
            r.get(b"key-0123")
            r.freelist()
            r.reachable_pages()
        except Exception:
            continue  # loud failure is within contract
