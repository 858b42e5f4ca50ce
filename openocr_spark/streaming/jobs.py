"""Structured Streaming jobs.

The reference's stream-shaped structures (SURVEY §2.9): the det→rec
producer/consumer queue (ST1, infer_e2e_parallel.py:27-122) becomes
micro-batched foreachBatch extraction — each micro-batch runs the exact
batch pipeline, so batch/stream parity is by construction; checkpointing
is Spark's offset log + our manifest table.

Also a watermarked event-time windowed aggregation (the streaming analog
of the throughput metrics A9) for late-data handling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from openocr_spark import schemas
from openocr_spark.config import DEFAULT_CONFIG, ExtractConfig
from openocr_spark.operators.extract import extract


def read_documents_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of interleaved documents (new parquet files in
    input_dir are micro-batches — the cloud-storage drop-folder pattern)."""
    return (
        spark.readStream.schema(schemas.DOCUMENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def write_extract_batch(
    batch_df: DataFrame,
    batch_id: int,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> None:
    """Idempotent per-micro-batch write: dynamic partition overwrite on
    batch_id. Replaying the same (batch_df, batch_id) — Spark's replay
    unit after a crash between the parquet commit and the offset-log
    checkpoint — overwrites only the batch's own partition, leaving
    every other batch's partition untouched."""
    out = extract(batch_df, cfg=cfg).withColumn("batch_id", F.lit(batch_id))
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
    )


def extract_stream(
    docs_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    available_now: bool = True,
) -> StreamingQuery:
    """Micro-batched extraction: foreachBatch runs the batch pipeline on
    each increment. Exactly-once via the streaming checkpoint (offset
    log) + an idempotent write: output is partitioned by batch_id and
    written with dynamic partition overwrite, so a micro-batch replayed
    after a post-commit/pre-checkpoint crash REPLACES its own partition
    instead of appending duplicates (a plain append would double the
    rows of the replayed batch — foreachBatch is only exactly-once when
    the batch write itself is idempotent on batch_id)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        write_extract_batch(batch_df, batch_id, output_dir, cfg)

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_text_slices_stream(
    slices_stream: DataFrame,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    the reference's stream_match sliding-window text merge
    (rec_metric.py:6-28, SURVEY §2.9 ST2) over an unbounded stream of
    recognition slices (media_ref, slice_idx, text). Per-key state holds
    (next expected idx, merged text); slices may arrive across
    micro-batches; a key emits its merged text when the stream signals
    the final slice (is_last) or the state times out.

    Input schema: media_ref string, slice_idx int, text string,
                  is_last boolean
    Output: media_ref string, merged string, n_slices int

    timeout_ms=None uses NoTimeout (keys emit only on is_last; required
    for availableNow jobs to terminate — with ProcessingTimeTimeout the
    query stays alive waiting to fire timeouts). Set a timeout for
    continuous deployments where lost final slices must flush.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from openocr_spark.functions.text import stream_merge

    out_schema = "media_ref string, merged string, n_slices int"
    state_schema = "pending array<string>, idxs array<int>, done boolean"

    def fn(key, pdfs, state):
        media_ref = key[0]
        if state.hasTimedOut:
            (pending, idxs, _done) = state.get
            order = sorted(range(len(idxs)), key=lambda i: idxs[i])
            merged = stream_merge([pending[i] for i in order])
            state.remove()
            yield pd.DataFrame(
                [{"media_ref": media_ref, "merged": merged, "n_slices": len(idxs)}]
            )
            return
        pending: list[str] = []
        idxs: list[int] = []
        done = False
        if state.exists:
            (pending, idxs, done) = state.get
            pending, idxs = list(pending), list(idxs)
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                pending.append(row["text"])
                idxs.append(int(row["slice_idx"]))
                done = done or bool(row["is_last"])
        if done:
            order = sorted(range(len(idxs)), key=lambda i: idxs[i])
            merged = stream_merge([pending[i] for i in order])
            state.remove()
            yield pd.DataFrame(
                [{"media_ref": media_ref, "merged": merged, "n_slices": len(idxs)}]
            )
        else:
            state.update((pending, idxs, done))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(
                {"media_ref": [], "merged": [], "n_slices": []}
            ).astype({"media_ref": str, "merged": str, "n_slices": "int32"})

    return (
        slices_stream.groupBy("media_ref")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def dedup_stream(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: content-fingerprint each document and
    keep the first arrival across micro-batches (Spark keeps the seen-
    fingerprint set in state). With an event-time watermark the state
    is BOUNDED — fingerprints older than the watermark are evicted, so
    this runs forever on an unbounded corpus; without one, state grows
    with the distinct count (use only for bounded backfills). The
    streaming face of dedup.exact_dedup_stats."""
    from pyspark.sql import functions as F  # noqa: F811

    # md5(NULL) is NULL and dropDuplicates groups nulls as equal — two
    # distinct null-text docs (media-only) would collapse to one. Key
    # such docs by their own id instead: unique, so they always pass.
    fp = docs_stream.withColumn(
        "fingerprint",
        F.coalesce(
            F.md5(F.col(text_col)),
            F.concat(F.lit("null-text:"), F.col("doc_id").cast("string")),
        ),
    )
    if watermark_col is not None:
        # dropDuplicatesWithinWatermark keys state on the FINGERPRINT
        # alone and evicts entries older than the watermark — the
        # documented semantics. (dropDuplicates(['fingerprint', ts])
        # would key on the pair, letting same-content docs with
        # different timestamps both through.)
        return fp.withWatermark(
            watermark_col, watermark
        ).dropDuplicatesWithinWatermark(["fingerprint"])
    return fp.dropDuplicates(["fingerprint"])


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event-time stream
    (late rows beyond the watermark are dropped; state is bounded)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def minhash_bands_expr(sh_col):
    """Per-ROW MinHash band keys as a pure column expression (no
    explode/groupBy) over an ALREADY-PROJECTED shingle-array column:
    h_s = array_min over the shingles of md5(shingle + seed) — the same
    values (and, since r7, the same array_min formulation)
    dedup.minhash_signatures computes (min over a set is order-free),
    and the band grouping comes from the SHARED
    dedup.band_structs helper, so streaming and batch band keys are
    bit-identical by construction. Pass a named column (project
    shingle_array once in a prior select) — inlining the shingle
    expression here would re-tokenize each row once per hash function
    (higher-order functions sit outside whole-stage codegen CSE).
    Docs with no shingles yield null."""
    from openocr_spark.operators.dedup import N_MINHASHES, band_structs

    mins = [
        F.array_min(
            F.transform(sh_col, lambda s, _i=i: F.md5(F.concat(s, F.lit(f"#{_i}"))))
        )
        for i in range(N_MINHASHES)
    ]
    return F.when(F.size(sh_col) > 0, band_structs(mins))


def _near_dup_bucket_fn(max_bucket: int, timeout_ms: int | None):
    """Per-bucket state transition for near_dup_candidates_stream —
    module-level so the timeout/eviction semantics are unit-testable
    against a fake GroupState."""

    def _empty():
        return pd.DataFrame({"id_a": [], "id_b": [], "band_idx": []}).astype(
            {"id_a": str, "id_b": str, "band_idx": "int32"}
        )

    def fn(key, pdfs, state):
        band_idx = int(key[0])
        if state.hasTimedOut:
            # idle-bucket eviction: REMOVE the state and emit nothing —
            # re-updating here would re-arm the timer forever and state
            # would grow without bound (same guard as dedup_stream's)
            state.remove()
            yield _empty()
            return
        seen: list[str] = list(state.get[0]) if state.exists else []
        rows = []
        for pdf in pdfs:
            for new_id in pdf["id"].astype(str):
                if new_id in seen:
                    continue
                for old in seen:
                    a, b = sorted((old, new_id))
                    rows.append({"id_a": a, "id_b": b, "band_idx": band_idx})
                if len(seen) < max_bucket:
                    seen.append(new_id)
        state.update((seen,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield (
            pd.DataFrame(rows, columns=["id_a", "id_b", "band_idx"])
            if rows
            else _empty()
        )

    return fn


def near_dup_candidates_stream(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 64,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup CANDIDATE detection — the
    streaming face of dedup.lsh_candidate_pairs: each arriving document
    is banded with the identical hash scheme as the batch operator and
    matched, via per-bucket state, against every document previously
    seen in any shared band — including documents from EARLIER
    micro-batches (the case plain per-batch joins cannot catch).

    Output: (id_a, id_b, band_idx) with id_a < id_b, emitted the moment
    the second member arrives. Downstream, the batch verify
    (dedup.jaccard_verify_pairs) confirms candidates exactly.

    State is BOUNDED: each bucket keeps at most `max_bucket` doc ids
    (a hotter bucket stops accumulating — the same quadratic-surface
    guard as the batch stop-shingle cap; at web scale also set
    `timeout_ms` so idle buckets evict, trading recall across long time
    gaps for O(active buckets) state)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from openocr_spark.operators.dedup import shingle_array

    banded = (
        docs_stream.select(
            F.col(id_col).alias("id"),
            shingle_array(F.col(text_col)).alias("_sh"),  # tokenized ONCE
        )
        .select("id", minhash_bands_expr(F.col("_sh")).alias("bs"))
        .filter(F.col("bs").isNotNull())
        .select("id", F.explode("bs").alias("b"))
        .select("id", "b.band_idx", "b.band_key")
    )

    out_schema = "id_a string, id_b string, band_idx int"
    state_schema = "ids array<string>"
    fn = _near_dup_bucket_fn(max_bucket, timeout_ms)

    return banded.groupBy("band_idx", "band_key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
