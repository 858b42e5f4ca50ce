"""Model-artifact cache semantics (SURVEY S11 / infer_det.py:36-116):
path-as-given, cache hit, source-chain fallback with copy-into-cache,
sha256 content addressing with corrupt-cache eviction, and executor
shipment via addFile."""

import os

import pytest

from openocr_spark.sources import artifacts as A


@pytest.fixture(autouse=True)
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(A, "CACHE_DIR", tmp_path / "cache")
    monkeypatch.setattr(A, "SOURCES", [])
    yield


def _mk(p, data=b"WEIGHTS"):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(data)
    return str(p)


def test_as_given_path_wins(tmp_path):
    f = _mk(tmp_path / "model.bin")
    assert A.resolve_artifact(f) == f


def test_source_fallback_order_and_cache_copy(tmp_path):
    calls = []

    def failing(name):
        calls.append("primary")
        raise OSError("primary down")

    good = _mk(tmp_path / "src" / "m.bin", b"GOOD")

    def working(name):
        calls.append("fallback")
        return good

    A.register_source("primary", failing)
    A.register_source("fallback", working)
    out = A.resolve_artifact("m.bin")
    assert calls == ["primary", "fallback"]
    assert out == str(A.CACHE_DIR / "m.bin")
    assert open(out, "rb").read() == b"GOOD"
    # second resolve: cache hit, no source calls
    calls.clear()
    assert A.resolve_artifact("m.bin") == out
    assert calls == []


def test_sha256_pin_rejects_wrong_bytes(tmp_path):
    bad = _mk(tmp_path / "src" / "m.bin", b"EVIL")
    A.register_source("only", lambda name: bad)
    with pytest.raises(RuntimeError, match="hash mismatch|not found"):
        A.resolve_artifact("m.bin", sha256="0" * 64)


def test_corrupt_cache_evicted_and_refetched(tmp_path):
    good = _mk(tmp_path / "src" / "m.bin", b"GOOD")
    want = A.sha256_of(good)
    A.register_source("only", lambda name: good)
    # poison the cache
    _mk(A.CACHE_DIR / "m.bin", b"CORRUPT")
    out = A.resolve_artifact("m.bin", sha256=want)
    assert open(out, "rb").read() == b"GOOD"


def test_no_source_error_names_everything(tmp_path):
    with pytest.raises(RuntimeError, match="tried as-given path, cache"):
        A.resolve_artifact("missing.bin")


def test_ship_artifact_reaches_executors(spark, tmp_path):
    f = _mk(tmp_path / "table.bin", b"LUT" * 100)
    base = A.ship_artifact(spark, f)
    from pyspark import SparkFiles

    def read_len(it):
        import pandas as pd

        with open(SparkFiles.get(base), "rb") as fh:
            n = len(fh.read())
        for pdf in it:
            yield pd.DataFrame({"n": [n] * len(pdf)})

    df = spark.range(4).repartition(4).mapInPandas(read_len, schema="n long")
    assert {r.n for r in df.collect()} == {300}


def test_subdirectory_artifact_names(tmp_path):
    """Names with subdirectories must create the cache parent chain
    (review finding: copy2 into a missing parent failed every source)."""
    good = _mk(tmp_path / "src" / "det" / "model.onnx", b"ONNX")
    A.register_source("hub", lambda name: good)
    out = A.resolve_artifact("det/model.onnx")
    assert out == str(A.CACHE_DIR / "det" / "model.onnx")
    assert open(out, "rb").read() == b"ONNX"


def test_dotted_names_do_not_alias(tmp_path):
    """'./' prefix strips, but leading dots of real names survive
    (lstrip('./') would alias '.cache-v2/x' onto 'cache-v2/x')."""
    a = _mk(tmp_path / "src" / "a", b"A")
    A.register_source("hub", lambda name: {".hidden.bin": a}[name])
    out = A.resolve_artifact("./.hidden.bin")
    assert out == str(A.CACHE_DIR / ".hidden.bin")
