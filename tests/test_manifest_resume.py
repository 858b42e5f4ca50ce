"""Kill/resume test (SURVEY §5.2): run k of n buckets, 'die', re-run,
assert exactly-once output equal to a single uninterrupted run — the
north rule's 'resumable from checkpoint with per-partition lineage +
metrics'."""

import pytest
from pyspark.sql import functions as F

from openocr_spark import schemas
from openocr_spark.fixtures import gen_documents_pdf
from openocr_spark.operators.extract import extract
from openocr_spark.operators.manifest import (
    pending_buckets,
    read_extractions,
    read_manifest,
    run_with_manifest,
)

N_DOCS = 24
N_BUCKETS = 4


@pytest.fixture(scope="module")
def docs(spark):
    pdf = gen_documents_pdf(N_DOCS)
    return spark.createDataFrame(pdf.to_dict("records"), schema=schemas.DOCUMENTS)


def _spans_map(df):
    return {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in (x.asDict(recursive=True) for x in df.collect())
    }


def test_kill_and_resume_exactly_once(spark, docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("resume")
    out, mf = str(base / "out"), str(base / "manifest")

    # phase 1: process 2 buckets then "die"
    first = run_with_manifest(docs, out, mf, n_buckets=N_BUCKETS, max_buckets=2)
    assert len(first) == 2
    assert sorted(pending_buckets(spark, mf, N_BUCKETS)) == sorted(
        set(range(N_BUCKETS)) - set(first)
    )

    # phase 2: resume — only remaining buckets run
    second = run_with_manifest(docs, out, mf, n_buckets=N_BUCKETS, run_id="run-1")
    assert sorted(first + second) == list(range(N_BUCKETS))

    # exactly-once: resumed output equals one uninterrupted extract()
    got = _spans_map(read_extractions(spark, out).select("doc_id", "spans"))
    want = _spans_map(extract(docs))
    assert got == want

    # third run is a no-op
    assert run_with_manifest(docs, out, mf, n_buckets=N_BUCKETS) == []


def test_manifest_metrics_recorded(spark, docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("mf2")
    out, mf = str(base / "out"), str(base / "manifest")
    run_with_manifest(docs, out, mf, n_buckets=2, run_id="r")
    m = read_manifest(spark, mf)
    rows = m.collect()
    assert {r["partition_id"] for r in rows} == {"0", "1"}
    assert all(r["status"] == "done" for r in rows)
    assert sum(r["docs"] for r in rows) == N_DOCS
    assert all(r["spans_per_sec"] > 0 for r in rows)
    assert all(r["finished_at"] is not None for r in rows)


def test_rerun_of_done_bucket_is_idempotent(spark, docs, tmp_path_factory):
    """Simulate a bucket retry after a torn write: overwrite-by-partition
    must replace, not duplicate."""
    base = tmp_path_factory.mktemp("mf3")
    out, mf = str(base / "out"), str(base / "manifest")
    run_with_manifest(docs, out, mf, n_buckets=2)
    # force-rerun bucket 0 with an empty manifest dir view
    run_with_manifest(docs, out, str(base / "mf_other"), n_buckets=2, max_buckets=1)
    got = read_extractions(spark, out)
    assert got.count() == N_DOCS
    assert got.select("doc_id").distinct().count() == N_DOCS


def test_resume_rejects_changed_bucketing(spark, tmp_path):
    """Bucket b under n_buckets=4 holds different docs than bucket b
    under n_buckets=8 — resuming across a bucketing change would mix
    partitionings (duplicated + missing docs). The manifest records
    the modulus in lineage and resume fails loud on mismatch."""
    import pytest

    from openocr_spark.fixtures import documents_df
    from openocr_spark.operators.manifest import (
        pending_buckets,
        run_with_manifest,
    )

    docs = documents_df(spark, 24)
    out = str(tmp_path / "out")
    mf = str(tmp_path / "manifest")
    run_with_manifest(docs, out, mf, n_buckets=4, max_buckets=2)
    # same modulus: resume proceeds (2 buckets remain)
    assert len(pending_buckets(spark, mf, 4)) == 2
    # changed modulus: loud failure, not silent mixing
    with pytest.raises(ValueError, match="different bucketing"):
        pending_buckets(spark, mf, 8)
