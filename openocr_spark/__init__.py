"""openocr_spark — a PySpark-native document-content extraction engine.

Re-creates the query/data-processing capabilities of Topdu/OpenOCR
(two-stage detect-then-recognize OCR + OpenDoc layout-parse/route/assemble)
as an idiomatic Spark dataflow over tables of interleaved text+media
documents. Built from scratch; the reference at /root/reference is cited
for *semantics* only (file:line in docstrings), never copied.

Layout:
  config      — pipeline thresholds (mirrors reference YAML defaults)
  schemas     — canonical StructTypes for every stage
  session     — tuned SparkSession builder
  fixtures    — deterministic synthetic corpora (interleaved docs, media payloads)
  oracle      — independent single-node pandas/numpy reference implementation
  kernels/    — numpy kernel space (detection, CTC recognition, media decode)
  operators/  — DataFrame operators (extract pipeline, boilerplate, dedup,
                similarity, text stats, metrics, manifest/resume)
  functions/  — scalar text functions (normalization, truncation, OTSL)
  sources/    — table layouts, sinks (system_results.txt format), manifest
  streaming/  — Structured Streaming wrappers (foreachBatch micro-batching)
"""

__version__ = "0.1.0"
