"""Source reader tests (S1/S5/S6 analogs) + token decode."""

from pyspark.sql import functions as F

from openocr_spark.functions.exprs import token_decode
from openocr_spark.sources.readers import (
    read_binary_files,
    read_tsv_labels,
    union_suites,
    with_ratio_bucket,
)


def test_read_tsv_labels(spark, tmp_path):
    p = tmp_path / "labels.tsv"
    p.write_text("img/a.jpg\thello\nimg/b.jpg\tworld w\n")
    df = read_tsv_labels(spark, str(p))
    rows = {r["path"]: r["label"] for r in df.collect()}
    assert rows == {"img/a.jpg": "hello", "img/b.jpg": "world w"}
    sampled = read_tsv_labels(spark, str(p), sample_ratio=0.5, seed=1)
    assert sampled.count() <= 2


def test_read_binary_files_sorted(spark, tmp_path):
    (tmp_path / "b.bin").write_bytes(b"22")
    (tmp_path / "a.bin").write_bytes(b"1")
    df = read_binary_files(spark, str(tmp_path) + "/*.bin")
    rows = df.select("path", "length").collect()
    assert [r["path"].split("/")[-1] for r in rows] == ["a.bin", "b.bin"]
    assert [r["length"] for r in rows] == [1, 2]


def test_with_ratio_bucket_clips(spark):
    df = spark.createDataFrame(
        [(320, 32), (64, 64), (1000, 10), (10, 100)], ["width", "height"]
    )
    got = [r["ratio_bucket"] for r in with_ratio_bucket(df).collect()]
    assert got == [10, 1, 12, 1]  # 12 = max_ratio cap, 0.1 -> floor 1


def test_with_ratio_bucket_matches_reference_rounding(spark):
    """gen_ratio = max(1, round(w/h)) with PYTHON round semantics
    (half-to-even) — the rule as the reference executes it on the
    RecTVResizeRatio eval path (resize.py:252) and, under its own
    bounds, the RatioDataSet training path (np.around): w/h = 2.5
    buckets to 2, not 3 — HALF_UP F.round would diverge on every
    even+0.5 ratio. (RatioRecTVReisze's round branch is DEAD code —
    infer_rec.py:134's trailing comma makes self.ceil always truthy;
    ceil mode below models that path as it actually runs.) The Spark
    column expression must agree with the reference line evaluated in
    Python across randomized dims, plus the exact tie points."""
    dims = [(80, 32), (112, 32), (144, 32), (45, 18), (5, 2), (7, 2), (3, 2)]
    rng = __import__("numpy").random.default_rng(79)
    dims += [(int(rng.integers(1, 400)), int(rng.integers(1, 64))) for _ in range(40)]
    df = spark.createDataFrame(dims, ["width", "height"])
    got = {
        (r["width"], r["height"]): r["ratio_bucket"]
        for r in with_ratio_bucket(df, max_ratio=12).collect()
    }
    for w, h in dims:
        expect = min(max(1, round(float(w) / float(h))), 12)
        assert got[(w, h)] == expect, (w, h, got[(w, h)], expect)
    # ceil mode: int(w/h) + 1 (infer_rec.py:151)
    got_ceil = {
        (r["width"], r["height"]): r["ratio_bucket"]
        for r in with_ratio_bucket(df, max_ratio=12, ceil=True).collect()
    }
    for w, h in dims:
        expect = min(int(float(w) / float(h)) + 1, 12)
        assert got_ceil[(w, h)] == expect, (w, h, got_ceil[(w, h)], expect)


def test_union_suites(spark):
    a = spark.createDataFrame([(1,)], ["x"])
    b = spark.createDataFrame([(2,)], ["x"])
    out = union_suites([("s1", a), ("s2", b)])
    assert {(r["suite"], r["x"]) for r in out.collect()} == {("s1", 1), ("s2", 2)}


def test_webdataset_reader(spark, tmp_path):
    import io
    import tarfile

    from openocr_spark.sources.readers import read_webdataset, webdataset_samples

    def make_shard(path, samples):
        with tarfile.open(path, "w") as tf:
            for key, members in samples.items():
                for ext, data in members.items():
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))

    make_shard(
        tmp_path / "shard-000.tar",
        {"s0": {"bin": b"\x01\x02", "txt": b"hello"},
         "s1": {"bin": b"\x03", "txt": b"world"}},
    )
    make_shard(tmp_path / "shard-001.tar", {"s2": {"bin": b"\x04", "txt": b"third"}})

    members = read_webdataset(spark, str(tmp_path) + "/shard-*.tar")
    assert members.count() == 6
    samples = webdataset_samples(members).collect()
    assert len(samples) == 3
    by_key = {r["key"]: r["members"] for r in samples}
    assert bytes(by_key["s0"]["txt"]) == b"hello"
    assert bytes(by_key["s1"]["bin"]) == b"\x03"
    assert bytes(by_key["s2"]["txt"]) == b"third"


def test_webdataset_compound_extensions(spark, tmp_path):
    """The WebDataset convention splits member names at the FIRST dot
    after the last '/': '0001.input.png' and '0001.gt.txt' are ONE
    sample keyed '0001' with exts 'input.png'/'gt.txt'; a dotless
    member is its own key, and directory prefixes stay in the key."""
    import io
    import tarfile

    from openocr_spark.sources.readers import (
        read_webdataset,
        webdataset_samples,
    )

    with tarfile.open(tmp_path / "shard-c.tar", "w") as tf:
        for name, data in [
            ("0001.input.png", b"\x01"),
            ("0001.gt.txt", b"label-1"),
            ("sub/0002.input.png", b"\x02"),
            ("sub/0002.gt.txt", b"label-2"),
            ("README", b"readme"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    members = read_webdataset(spark, str(tmp_path) + "/shard-c.tar")
    samples = webdataset_samples(members).collect()
    by_key = {r["key"]: r["members"] for r in samples}
    assert set(by_key) == {"0001", "sub/0002", "README"}
    assert bytes(by_key["0001"]["gt.txt"]) == b"label-1"
    assert bytes(by_key["sub/0002"]["input.png"]) == b"\x02"
    assert bytes(by_key["README"][""]) == b"readme"


def test_token_decode(spark):
    vocab = {1: "h", 2: "i", 3: "!"}
    df = spark.createDataFrame([([1, 2, 9, 3],)], "ids array<int>")
    got = df.select(token_decode(F.col("ids"), vocab).alias("s")).collect()[0]["s"]
    assert got == "hi!"
