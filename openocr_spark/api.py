"""User-facing façade mirroring the reference's task dispatch
(openocr.py:105-191: OpenOCR(task=...) → ocr / det / rec / doc), so a
reference user can switch with the same mental model:

    from openocr_spark.api import OpenExtractor
    ox = OpenExtractor(spark)               # task dispatch à la OpenOCR
    extractions = ox.ocr(documents)         # --task ocr  (det+rec e2e)
    detail      = ox.det_rec_detail(refs)   # --task det/rec detail rows
    parsed      = ox.doc(layout_blocks)     # --task doc  (layout parse)
    markdown    = ox.doc_markdown(layout_blocks)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openocr_spark.config import DEFAULT_CONFIG, ExtractConfig


class OpenExtractor:
    def __init__(self, spark: SparkSession, cfg: ExtractConfig = DEFAULT_CONFIG):
        self.spark = spark
        self.cfg = cfg
        # ship the package to workers (the --py-files mechanism) so the
        # kernels deserialize regardless of driver cwd
        from openocr_spark.session import package_zip

        try:
            spark.sparkContext.addPyFile(package_zip())
        except Exception:
            pass

    # --task ocr: end-to-end extraction over interleaved documents
    def ocr(
        self, documents: DataFrame, media_payloads: DataFrame | None = None
    ) -> DataFrame:
        from openocr_spark.operators.extract import extract

        return extract(documents, media_payloads, self.cfg)

    # --task det/rec: per-region detail rows (system_results shape)
    def det_rec_detail(self, media_refs: DataFrame) -> DataFrame:
        from openocr_spark.operators.metrics import extract_detail

        return extract_detail(media_refs, self.cfg)

    # --task doc: layout parse → route → recognize → assemble
    def doc(self, layout_blocks: DataFrame) -> DataFrame:
        from openocr_spark.operators.doc_parse import doc_parse, doc_spans

        return doc_spans(doc_parse(layout_blocks))

    def doc_markdown(self, layout_blocks: DataFrame) -> DataFrame:
        from openocr_spark.operators.doc_parse import doc_parse
        from openocr_spark.operators.layout import assemble_markdown

        return assemble_markdown(doc_parse(layout_blocks))

    # eval harnesses (tools/eval_det.py / eval_rec_all_*.py analogs)
    def eval_det(self, pred: DataFrame, gt: DataFrame) -> DataFrame:
        from openocr_spark.operators.metrics import det_metric

        return det_metric(pred, gt)

    def eval_rec_suites(self, pairs: DataFrame) -> DataFrame:
        from openocr_spark.operators.eval_harness import rec_suite_report

        return rec_suite_report(pairs)
