"""Iceberg table specs for production deployment.

This sandbox has no Iceberg runtime jar, so tests run on the parquet
stand-ins (sinks.py / manifest.py); the DDL below is what the same
pipeline binds to on a real cluster — every operator in this repo reads
and writes through plain DataFrame APIs, so only the table format
changes.

-- canonical input (BASELINE.json input_hint), bucketed for storage-
-- partitioned joins against media payloads and for manifest-pruned scans
CREATE TABLE docs.documents (
  doc_id    string,
  spans     array<struct<kind:string, text:string,
                         media_ref:string, offset:int>>
) USING iceberg
PARTITIONED BY (bucket(1024, doc_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash');

CREATE TABLE docs.media_payloads (
  media_ref string, width int, height int,
  score_map binary,
  regions array<struct<points:array<array<int>>, ignore:boolean,
                       gt_text:string, logits:binary, logits_t:int>>
) USING iceberg
PARTITIONED BY (bucket(1024, media_ref));

CREATE TABLE docs.extractions (
  doc_id string,
  spans  array<struct<kind:string, text:string,
                      media_ref:string, order:int>>
) USING iceberg
PARTITIONED BY (bucket(1024, doc_id));

CREATE TABLE docs.manifest (
  partition_id string, run_id string, status string,
  started_at timestamp, finished_at timestamp,
  docs bigint, spans bigint, spans_per_sec double, lineage string
) USING iceberg;

Notes:
  - documents ⋈ media_payloads on media_ref with matching bucket specs
    → storage-partitioned join, no payload shuffle
    (spark.sql.sources.v2.bucketing.enabled=true);
  - resume: `pending = all buckets ANTI JOIN manifest WHERE status='done'`
    prunes input partitions via Iceberg partition pruning before any scan;
  - overwrite-by-partition writes (INSERT OVERWRITE ... PARTITION) keep
    bucket reruns idempotent, matching manifest.py's directory semantics.
"""
