"""Input validation for the documents table.

The pipeline's ordering contract requires offsets to be unique within a
document (the reference's offsets are byte positions, strictly
increasing). Duplicate offsets would make `order` assignment
nondeterministic across engines (array_sort ties break on later struct
fields). At ingest time, run `offset_violations` as a cheap audit or
`repair_offsets` to rewrite span offsets by array position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def offset_violations(documents: DataFrame) -> DataFrame:
    """Docs whose spans have duplicate or descending offsets."""
    offs = F.transform(F.col("spans"), lambda s: s["offset"])
    sorted_ok = F.col("_offs") == F.array_sort(F.col("_offs"))
    distinct_ok = F.size(F.array_distinct(F.col("_offs"))) == F.size(F.col("_offs"))
    return (
        documents.withColumn("_offs", offs)
        .filter(~(sorted_ok & distinct_ok))
        .select("doc_id")
    )


def missing_payloads(documents: DataFrame, media_payloads: DataFrame) -> DataFrame:
    """Media refs the payload table does NOT cover — run this audit
    before the joined-payload extraction: the pipeline's payload join
    is inner (a media span without its payload row cannot be decoded),
    so uncovered refs would silently vanish from the output spans.
    One anti-join on media_ref; at Iceberg scale it prunes to the same
    buckets the extraction reads.

    Returns (doc_id, media_ref) of uncovered spans; empty = safe."""
    refs = (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    return refs.join(
        media_payloads.select("media_ref"), "media_ref", "left_anti"
    )


def repair_offsets(documents: DataFrame) -> DataFrame:
    """Rewrite offsets to the span's array position (stable, unique) —
    use when upstream offsets are untrusted."""
    fixed = F.transform(
        F.col("spans"),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return documents.select("doc_id", fixed.alias("spans"))
