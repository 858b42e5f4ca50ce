"""Streaming tests: micro-batched extraction equals the batch pipeline
(batch/stream parity by construction); streaming resume picks up only
new files; watermarked windowed aggregation over an event stream."""

import pytest
from pyspark.sql import functions as F

from openocr_spark import schemas
from openocr_spark.fixtures import gen_documents_pdf
from openocr_spark.operators.extract import extract
from openocr_spark.streaming.jobs import (
    extract_stream,
    read_documents_stream,
    windowed_event_counts,
)


def _spans_map(df):
    return {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in (x.asDict(recursive=True) for x in df.collect())
    }


def test_stream_extract_parity_and_resume(spark, tmp_path):
    pdf = gen_documents_pdf(16)
    docs = spark.createDataFrame(pdf.to_dict("records"), schema=schemas.DOCUMENTS)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drop first 8 docs as files, run availableNow
    first = docs.filter(F.col("doc_id") < "doc-00000008")
    first.repartition(2).write.mode("append").parquet(in_dir)
    q = extract_stream(read_documents_stream(spark, in_dir), out_dir, ckpt)
    q.awaitTermination(120)
    got1 = _spans_map(spark.read.parquet(out_dir).select("doc_id", "spans"))
    assert set(got1) == {r for r in pdf.doc_id if r < "doc-00000008"}

    # drop the rest; resumed stream processes ONLY the new files
    docs.filter(F.col("doc_id") >= "doc-00000008").repartition(2).write.mode(
        "append"
    ).parquet(in_dir)
    q = extract_stream(read_documents_stream(spark, in_dir), out_dir, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    got = _spans_map(out.select("doc_id", "spans"))
    # parity with the batch pipeline over the full corpus
    assert got == _spans_map(extract(docs))
    # exactly-once: no doc extracted twice
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_batch_write_replay_is_idempotent(spark, tmp_path):
    """Crash-replay semantics (ADVICE r1): if the driver dies after the
    parquet commit but before the offset-log checkpoint, Spark re-runs
    the SAME micro-batch with the SAME batch_id. The dynamic-partition-
    overwrite write must leave the output identical, not doubled."""
    from openocr_spark.streaming.jobs import write_extract_batch

    pdf = gen_documents_pdf(8)
    docs = spark.createDataFrame(pdf.to_dict("records"), schema=schemas.DOCUMENTS)
    out_dir = str(tmp_path / "out")
    b0 = docs.filter(F.col("doc_id") < "doc-00000004")
    b1 = docs.filter(F.col("doc_id") >= "doc-00000004")

    write_extract_batch(b0, 0, out_dir)
    write_extract_batch(b1, 1, out_dir)
    before = _spans_map(spark.read.parquet(out_dir).select("doc_id", "spans"))
    # replay batch 1 (the post-commit / pre-checkpoint crash scenario)
    write_extract_batch(b1, 1, out_dir)
    out = spark.read.parquet(out_dir)
    after = _spans_map(out.select("doc_id", "spans"))
    assert after == before
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0
    # other batches' partitions untouched
    assert out.filter("batch_id = 0").count() == 4


def test_stateful_stream_match_merge(spark, tmp_path):
    """applyInPandasWithState merge: slices arriving in TWO micro-batches
    per key, out of order, merged by suffix/prefix overlap on is_last."""
    from openocr_spark.streaming.jobs import merge_text_slices_stream

    in_dir = str(tmp_path / "slices")
    schema = "media_ref string, slice_idx int, text string, is_last boolean"
    # batch 1: partial slices (out of order)
    spark.createDataFrame(
        [("m1", 1, "world peace", False), ("m1", 0, "hello wor", False),
         ("m2", 0, "abc", False)],
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    # batch 2: finals
    spark.createDataFrame(
        [("m1", 2, "peace now", True), ("m2", 1, "cde", True)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(in_dir)
    )
    q = (
        merge_text_slices_stream(stream)
        .writeStream.format("memory")
        .queryName("merged_slices")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["media_ref"]: (r["merged"], r["n_slices"])
        for r in spark.sql("select * from merged_slices").collect()
    }
    assert got["m1"] == ("hello world peace now", 3)
    # reference stream_match semantics: 'abc'[:-1] + 'cde'[1:] with no
    # suffix/prefix overlap between 'ab' and 'de'
    assert got["m2"] == ("abde", 2)


def test_dedup_stream_across_microbatches(spark, tmp_path):
    """Exact-dedup state spans micro-batches: a duplicate text arriving
    in a LATER batch is dropped; distinct texts all survive."""
    from openocr_spark.streaming.jobs import dedup_stream

    in_dir = str(tmp_path / "docs")
    schema = "doc_id string, text string"
    spark.createDataFrame(
        [("d1", "alpha beta"), ("d2", "gamma delta")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(
        [("d3", "alpha beta"), ("d4", "epsilon zeta")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(in_dir)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_docs").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]
    # the duplicate kept is the FIRST arrival
    kept = {r["text"]: r["doc_id"] for r in rows}
    assert kept["alpha beta"] == "d1"


def test_dedup_stream_watermarked_same_content_different_ts(spark, tmp_path):
    """Watermarked dedup keys state on the FINGERPRINT alone: the same
    content arriving later with a different event time (within the
    watermark) is still dropped."""
    from openocr_spark.streaming.jobs import dedup_stream

    import datetime as dt

    in_dir = str(tmp_path / "docs")
    schema = "doc_id string, text string, ts timestamp"

    def t(m):
        return dt.datetime(2024, 1, 1, 10, m)

    spark.createDataFrame(
        [("d1", "alpha beta", t(0))], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(
        [("d2", "alpha beta", t(5)), ("d3", "gamma", t(6))], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        dedup_stream(stream, watermark_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_wm").collect()
    assert sorted(r["text"] for r in rows) == ["alpha beta", "gamma"]
    assert {r["doc_id"] for r in rows} == {"d1", "d3"}


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    rows = [
        ("2024-01-01 00:01:00", "click", 1.0),
        ("2024-01-01 00:04:00", "click", 2.0),
        ("2024-01-01 00:11:00", "view", 5.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    df.write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(in_dir)
    )
    agg = windowed_event_counts(stream, window="10 minutes", watermark="20 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from winagg").collect()
    }
    assert res[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert res[("2024-01-01 00:10:00", "view")] == (1, 5.0)


def test_near_dup_candidates_stream_matches_batch_lsh(spark, tmp_path):
    """Streaming MinHash-LSH candidates: (a) a near-dup pair split
    ACROSS micro-batches is still caught (per-bucket state), (b) the
    distinct streaming pair set equals the batch
    dedup.lsh_candidate_pairs set on the union corpus — the band hash
    scheme is bit-identical by construction."""
    from openocr_spark.operators import dedup
    from openocr_spark.streaming.jobs import near_dup_candidates_stream

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch1 = [
        ("d1", base),
        ("d2", "one two three four five six seven eight nine ten"),
    ]
    batch2 = [
        ("d3", base + " extra"),              # near-dup of d1, later batch
        ("d4", "completely different words nothing shared here at all"),
    ]
    in_dir = str(tmp_path / "docs")
    schema = "doc_id string, text string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        near_dup_candidates_stream(stream)
        .writeStream.format("memory")
        .queryName("near_dup_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.id_a, r.id_b)
        for r in spark.sql("select * from near_dup_cands").collect()
    }
    assert ("d1", "d3") in got

    batch_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(
            spark.createDataFrame(batch1 + batch2, schema), "doc_id", "text"
        ).collect()
    }
    assert got == batch_pairs


def test_near_dup_bucket_fn_timeout_evicts_state():
    """Review finding: a timed-out bucket must be REMOVED, not
    re-armed — re-updating on hasTimedOut would grow state without
    bound and re-fire every idle bucket each interval."""
    import pandas as pd

    from openocr_spark.streaming.jobs import _near_dup_bucket_fn

    class FakeState:
        def __init__(self, ids):
            self.exists = True
            self.hasTimedOut = True
            self.get = (ids,)
            self.removed = False
            self.updated = None
            self.timeout_set = False

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_set = True

    fn = _near_dup_bucket_fn(max_bucket=64, timeout_ms=1000)
    st = FakeState(["a", "b"])
    out = list(fn((0, "key"), iter([]), st))
    assert st.removed and st.updated is None and not st.timeout_set
    assert sum(len(df) for df in out) == 0

    # normal path: pairs emitted, state updated, timer armed
    st2 = FakeState([])
    st2.hasTimedOut = False
    st2.exists = True
    st2.get = (["a"],)
    out2 = list(fn((3, "key"), iter([pd.DataFrame({"id": ["b"]})]), st2))
    rows = pd.concat(out2)
    assert [tuple(r) for r in rows.values] == [("a", "b", 3)]
    assert st2.updated == (["a", "b"],) and st2.timeout_set and not st2.removed


def test_near_dup_bucket_fn_caps_state():
    """max_bucket bounds per-bucket state: the 65th id still pairs with
    the 64 seen ones but is NOT remembered."""
    import pandas as pd

    from openocr_spark.streaming.jobs import _near_dup_bucket_fn

    class St:
        exists = True
        hasTimedOut = False

        def __init__(self, ids):
            self.get = (ids,)
            self.updated = None

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            pass

    fn = _near_dup_bucket_fn(max_bucket=3, timeout_ms=None)
    st = St(["a", "b", "c"])
    out = pd.concat(list(fn((0, "k"), iter([pd.DataFrame({"id": ["z"]})]), st)))
    assert len(out) == 3  # z pairs with a, b, c
    assert st.updated == (["a", "b", "c"],)  # z not remembered (cap)
