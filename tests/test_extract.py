"""End-to-end span-sequence equality: distributed pipeline vs the
independent single-node oracle, on a corpus that includes the
media-heavy skew tail. The per-row invariant is exactly the north rule:
(kind, text, media_ref, order) per document."""

import pandas as pd
import pytest

from openocr_spark import schemas
from openocr_spark.fixtures import (
    documents_df,
    gen_documents_pdf,
    gen_media_payloads_pdf,
    media_refs_of,
)
from openocr_spark.operators.extract import explode_spans, extract
from openocr_spark.oracle import extract_oracle

N_DOCS = 40  # includes doc idx 7 (skew doc, 150 extra media spans)


def _spans_map(rows):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]
        ]
        for r in rows
    }


@pytest.fixture(scope="module")
def docs_pdf():
    return gen_documents_pdf(N_DOCS)


@pytest.fixture(scope="module")
def expected(docs_pdf):
    return _spans_map(extract_oracle(docs_pdf).to_dict("records"))


def _docs_df(spark, docs_pdf):
    return spark.createDataFrame(docs_pdf.to_dict("records"), schema=schemas.DOCUMENTS)


def test_extract_matches_oracle_synthesized_payloads(spark, docs_pdf, expected):
    docs = _docs_df(spark, docs_pdf)
    got = _spans_map([r.asDict(recursive=True) for r in extract(docs).collect()])
    assert got == expected


def test_extract_matches_oracle_joined_payloads(spark, docs_pdf, expected):
    docs = _docs_df(spark, docs_pdf)
    payloads_pdf = gen_media_payloads_pdf(media_refs_of(docs_pdf))
    payloads = spark.createDataFrame(
        payloads_pdf.to_dict("records"), schema=schemas.MEDIA_PAYLOADS
    )
    got = _spans_map(
        [r.asDict(recursive=True) for r in extract(docs, payloads).collect()]
    )
    assert got == expected


def test_extract_joined_with_ratio_sort_matches(spark, docs_pdf, expected):
    from openocr_spark.config import ExtractConfig

    docs = _docs_df(spark, docs_pdf)
    payloads_pdf = gen_media_payloads_pdf(media_refs_of(docs_pdf))
    payloads = spark.createDataFrame(
        payloads_pdf.to_dict("records"), schema=schemas.MEDIA_PAYLOADS
    )
    cfg = ExtractConfig(ratio_sort=True)
    got = _spans_map(
        [r.asDict(recursive=True) for r in extract(docs, payloads, cfg).collect()]
    )
    assert got == expected


def test_distributed_generator_matches_single_node(spark, docs_pdf):
    dist = documents_df(spark, N_DOCS, partitions=4)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in (x.asDict(recursive=True) for x in dist.collect())
    }
    want = {
        row["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
        for _, row in docs_pdf.iterrows()
    }
    assert got == want


def test_skew_doc_present_and_media_heavy(docs_pdf):
    skew = docs_pdf[docs_pdf.doc_id == "doc-00000007"].iloc[0]
    n_media = sum(1 for s in skew["spans"] if s["kind"] == "media")
    assert n_media >= 150


def test_explode_spans_shape(spark, docs_pdf):
    docs = _docs_df(spark, docs_pdf)
    flat = explode_spans(docs)
    assert flat.columns == ["doc_id", "span_idx", "kind", "text", "media_ref", "offset"]
    assert flat.count() == int(docs_pdf["spans"].map(len).sum())


def test_rec_head_config_selects_decode(spark):
    """cfg.rec_head is the build_post_process analog: the same corpus
    extracted under a different head produces a deterministic,
    different recognition output; unknown names fail loudly."""
    import pytest

    from openocr_spark.config import ExtractConfig
    from openocr_spark.fixtures import documents_df
    from openocr_spark.operators.extract import extract

    docs = documents_df(spark, 8)

    def media_texts(cfg):
        rows = [x.asDict(recursive=True) for x in extract(docs, cfg=cfg).collect()]
        return {
            r["doc_id"]: tuple(
                s["text"] for s in r["spans"] if s["kind"] == "media"
            )
            for r in rows
        }

    ctc = media_texts(ExtractConfig())
    abinet = media_texts(ExtractConfig(rec_head="abinet"))
    assert set(ctc) == set(abinet)
    # same logits under a different vocabulary interpretation: decodes
    # differ somewhere (CTC dedups repeats + blank=0; abinet breaks at 0)
    assert ctc != abinet
    # deterministic
    assert abinet == media_texts(ExtractConfig(rec_head="abinet"))
    with pytest.raises(Exception, match="unknown rec_head"):
        media_texts(ExtractConfig(rec_head="nope"))


def test_uint8_payload_roundtrip_bitexact(spark):
    """The uint8 score-map storage is LOSSLESS: every generator level
    sits on the k/255 float32 grid, so encode(round ×255) → decode
    (÷255 in float32) reproduces the synthesized map bit-for-bit —
    the joined and synthesized payload paths stay exactly equal, not
    just threshold-equal."""
    import numpy as np

    from openocr_spark.fixtures import payload_for_media_ref, payload_row
    from openocr_spark.operators.extract import _prob_from_buffer

    for i in range(20):
        ref = f"media://u8check/{i}"
        want = payload_for_media_ref(ref)["score_map"]
        row = payload_row(ref)
        got = _prob_from_buffer(row["score_map"], row["height"], row["width"])
        assert got.dtype == np.float32
        assert np.array_equal(got, want), ref
        # and it really is the narrow format
        assert len(row["score_map"]) == row["height"] * row["width"]


def test_float32_payload_tables_still_decode(spark):
    """Back-compat: an existing float32 payload table (old format) is
    sniffed by buffer length and decodes identically."""
    import numpy as np

    from openocr_spark.fixtures import payload_for_media_ref
    from openocr_spark.operators.extract import _prob_from_buffer

    p = payload_for_media_ref("media://f32check/0")
    buf = p["score_map"].tobytes()
    got = _prob_from_buffer(buf, p["height"], p["width"])
    assert np.array_equal(got, p["score_map"])


def test_float16_logits_roundtrip_bitexact(spark):
    """Logits storage drops to float16 when lossless (the generator's
    levels are all f16-representable); decode reproduces the float32
    array bit-for-bit and sniffing is anchored on the class count (a
    byte-length heuristic alone would misread f16 as half-width f32)."""
    import numpy as np

    from openocr_spark.config import NUM_CLASSES
    from openocr_spark.fixtures import payload_for_media_ref, payload_row
    from openocr_spark.operators.extract import _logits_from_buffer

    for i in range(10):
        ref = f"media://f16check/{i}"
        p = payload_for_media_ref(ref)
        row = payload_row(ref)
        for want, got_r in zip(p["regions"], row["regions"]):
            t = int(want["logits"].shape[0])
            assert len(got_r["logits"]) == t * NUM_CLASSES * 2  # narrow
            got = _logits_from_buffer(got_r["logits"], t)
            assert got.dtype == np.float32
            assert np.array_equal(got, want["logits"])
    # float32 fallback path still decodes
    lg = np.full((3, NUM_CLASSES), 0.1, dtype=np.float32)  # 0.1 not f16-exact
    buf = lg.tobytes()
    assert np.array_equal(_logits_from_buffer(buf, 3), lg)
