#!/usr/bin/env python
"""End-to-end demo: everything a Topdu/OpenOCR user runs today, on this
engine — one script, local data, ~1 minute.

  1. detection + recognition + e2e extraction (infer_det/rec/e2e) over
     an interleaved corpus, with ordered span output
  2. document parse → markdown (infer_doc / to_markdown)
  3. evaluation: ICDAR det metric, AP, rec acc/NED, long-text metric
     (eval_det, eval_rec_all*, rec_metric_long)
  4. training-data pipeline: dedup (exact → LSH → transitive clusters),
     similarity search (brute + trained IVF), quality/lang/token stats,
     PII scrub, DBNet training targets
  5. checkpoint/resume manifest + golden system_results.txt sink

Usage: python scripts/demo_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import functions as F

    from openocr_spark.session import get_spark

    spark = get_spark("openocr-spark-demo", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs_flat = spark.read.parquet(f"{sf}/documents.parquet")

    # 1 ── extraction (the flagship): interleave → detect/recognize → spans
    from openocr_spark.operators.extract import extract
    from openocr_spark.operators.ingest import interleave

    docs = interleave(docs_flat)
    spans = extract(docs, persist_spans=True)
    n_docs = spans.count()
    n_spans = spans.select(F.sum(F.size("spans"))).first()[0]
    print(f"[extract]   {n_docs} docs -> {n_spans} ordered spans")

    # 2 ── doc parse → markdown
    from openocr_spark.fixtures import layout_blocks_df
    from openocr_spark.operators.doc_parse import doc_parse, doc_spans
    from openocr_spark.operators.layout import assemble_markdown

    ids = docs_flat.select(F.col("doc_id").cast("string").alias("doc_id")).limit(50)
    parsed = doc_parse(layout_blocks_df(ids))
    md = assemble_markdown(parsed)
    sample = md.orderBy("doc_id").first()
    print(f"[doc]       {doc_spans(parsed).count()} docs parsed; markdown sample:")
    print("            " + sample["markdown"][:120].replace("\n", " | "))

    # 3 ── evaluation metrics
    from openocr_spark.operators.longtext import rec_metric_long
    from openocr_spark.operators.metrics import (
        det_ap, det_metric, extract_detail, gt_regions, rec_metric,
    )

    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )
    detail = extract_detail(refs)
    gt = gt_regions(refs)
    dm = det_metric(detail.select("media_ref", "points"),
                    gt.select("media_ref", "points", "ignore")).first()
    print(f"[eval det]  precision={dm['precision']} recall={dm['recall']} hmean={dm['hmean']}")
    ap = det_ap(
        detail.select("media_ref", F.col("region_idx").cast("long").alias("det_idx"),
                      "points", F.col("det_score").alias("conf")),
        gt.select("media_ref", "points", "ignore"),
    )
    print(f"[eval ap]   mean per-media AP = "
          f"{ap.agg(F.round(F.avg('ap'), 4)).first()[0]}")
    pairs = detail.filter((F.col("rec_score") >= 0.5) & F.col("gt_text").isNotNull()) \
                  .select(F.col("transcription").alias("pred"), F.col("gt_text").alias("gt"))
    rm = rec_metric(pairs).first()
    print(f"[eval rec]  acc={rm['acc']} 1-NED={rm['one_minus_ned']} (n={rm['all_num']})")
    rl = rec_metric_long(docs_flat).first()
    print(f"[eval long] slice+merge acc={rl['acc']} 1-NED={rl['one_minus_ned']}")

    # 4 ── training-data pipeline
    from openocr_spark.operators import dedup, similarity, textstats

    fp = dedup.exact_dedup_stats(docs_flat, "doc_id", "text")
    lsh = dedup.lsh_candidate_pairs(docs_flat, "doc_id", "text")
    clusters = dedup.dedup_components(lsh.select("id_a", "id_b"))
    print(f"[dedup]     {fp.filter('n_copies > 1').count()} exact-dup groups; "
          f"{lsh.count()} LSH candidate pairs -> "
          f"{clusters.select('canonical_id').distinct().count()} transitive clusters")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").select("embedding").first()[0]]
    exact = similarity.cosine_topk(emb, qv, k=5)
    approx = similarity.cosine_topk_ivf_trained(emb, qv, k=5, nprobe=5)
    overlap = len({r.vec_id for r in exact.collect()} & {r.vec_id for r in approx.collect()})
    print(f"[ann]       top-5 IVF/brute overlap {overlap}/5")
    stats = textstats.with_text_stats(docs_flat).agg(
        F.round(F.avg("quality_score"), 3), F.sum("token_count")).first()
    print(f"[stats]     avg quality {stats[0]}, total tokens {stats[1]}")

    # 4a ── corpus-size-tuned banded LSH near-dup (the scale path):
    # plant 2% ~0.999-cosine copies, derive (bands, bits) from count()
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + F.lit(10**9)).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x * (F.lit(1.0) + F.sin(
                F.col("vec_id").cast("double") + i.cast("double")) * F.lit(0.001)),
        ).alias("embedding"))
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted).localCheckpoint(eager=True)
    bands, bits = similarity.tuned_lsh_params(corpus.count(), 0.9, 0.9)
    found = similarity.near_dup_pairs_lsh_tuned(corpus, 0.9, recall=0.9).count()
    n_planted = planted.count()
    print(f"[lsh-tuned] bands={bands} bits={bits} from n={corpus.count()}; "
          f"found {found}/{n_planted} planted ~1.0-cosine pairs")

    # 4b ── per-architecture decode heads over one fixture region
    import numpy as np

    from openocr_spark.fixtures import payload_for_media_ref
    from openocr_spark.kernels import decode_heads as H
    from openocr_spark.kernels.recognition import ctc_greedy_decode

    ref0 = detail.select("media_ref").first()[0]
    lg = np.asarray(payload_for_media_ref(ref0)["regions"][0]["logits"])
    heads = {
        "ctc": ctc_greedy_decode(lg), "abinet": H.abinet_decode(lg),
        "smtr": H.smtr_decode(lg), "lister": H.lister_decode(lg),
        "visionlan": H.visionlan_decode(lg), "mgp": H.mgp_char_decode(lg),
    }
    print("[heads]     " + "  ".join(
        f"{k}={t!r}@{c:.2f}" for k, (t, c) in heads.items()))

    # 4b2 ── from-scratch codecs: a progressive JPEG inside a PDF page
    # decodes through the distributed 1→N explode (media_decode →
    # jpeg_format SOF2 → pdf_format /DCTDecode). The progressive
    # ENCODER lives test-side only (it exists to validate the decoder);
    # a deployment shipping just the package skips this leg instead of
    # crashing (ADVICE r4 item 5).
    import sys as _sys

    _sys.path.insert(0, os.path.join(ROOT, "tests"))
    try:
        from jpeg_arith_ref_encoder import encode_jpeg_arith
        from jpeg_ref_encoder import encode_jpeg_progressive
    except ImportError:
        encode_jpeg_progressive = encode_jpeg_arith = None
        print("[codecs]    tests/ tree not shipped — skipping the "
              "progressive-JPEG-in-PDF demo leg")

    if encode_jpeg_progressive is not None:
        from openocr_spark.kernels.media_decode import (
            decode_media,
            extract_features,
        )
        from openocr_spark.kernels.pdf_format import encode_pdf

        img = (np.indices((16, 24)).sum(axis=0) * 5 % 256).astype(np.uint8)
        pdf = encode_pdf([img, encode_jpeg_progressive(img, qtable=[1] * 64)])
        mdf = spark.createDataFrame(
            [("demo", "doc.pdf", bytearray(pdf))],
            "doc_id string, media_ref string, content binary")
        pages = {
            r.page_no: r
            for r in extract_features(decode_media(mdf)).collect()
        }
        drift = abs(pages[0].mean_px - pages[1].mean_px)
        print(f"[codecs]    PDF(Flate + progressive-JPEG pages) -> "
              f"{len(pages)} pages, luma drift {drift:.3f}")
        # the QM coder: arithmetic-coded (SOF9) decodes bit-identical
        # to the Huffman encoding of the same quantized planes
        from jpeg_ref_encoder import encode_jpeg as _enc_huff
        from openocr_spark.kernels.jpeg_format import decode_jpeg as _dj

        same = bool(
            (_dj(encode_jpeg_arith(img, qtable=[1] * 64))
             == _dj(_enc_huff(img, qtable=[1] * 64))).all()
        )
        print(f"[codecs]    arithmetic (SOF9) == Huffman decode: {same}")

        # hierarchical (Annex J): lossy DCT base + lossless correction
        # frame reconstructs the source bit-exactly
        from jpeg_hier_ref_encoder import encode_jpeg_hierarchical

        hexact = bool((_dj(encode_jpeg_hierarchical(
            img, [{"kind": "dct"}, {"kind": "lossless"}]
        )) == img).all())
        print(f"[codecs]    hierarchical DHP pyramid bit-exact: {hexact}")

        # G4-fax TIFF and lossless WebP round-trip bit-exact too
        from tiff_ref_encoder import write_tiff
        from webp_ref_encoder import encode_vp8l
        from openocr_spark.kernels.tiff_format import decode_tiff
        from openocr_spark.kernels.webp_format import decode_webp

        ink = img > 128
        g4ok = bool((decode_tiff(write_tiff(
            [{"pixels": ink, "compression": 4}]
        ))[0] == np.where(ink, 0, 255)).all())
        rgb = np.stack([img] * 3, axis=2)
        webp_ok = bool((decode_webp(encode_vp8l(
            rgb, subtract_green=True, lz77=True, cache_bits=6
        )) == rgb).all())
        print(f"[codecs]    G4-fax TIFF bit-exact: {g4ok}; "
              f"VP8L WebP bit-exact: {webp_ok}")

    # 4c ── LMDB round-trip through the pure-python format
    from openocr_spark.sources import lmdb_format as L

    with tempfile.TemporaryDirectory() as tmp:
        L.write_lmdb_dataset(f"{tmp}/shard0", [(b"imgbytes" * 8, "hello"),
                                               (b"x" * 6000, "overflow")])
        back = L.read_lmdb_dataset(spark, tmp).orderBy("idx").collect()
        print(f"[lmdb]      wrote+read {len(back)} samples "
              f"(labels: {[r.label for r in back]}, "
              f"sizes: {[len(r.image) for r in back]})")

    # 4d ── audio/video multimodal legs (WAV stats + MJPEG frame-sample)
    try:
        # tests/ already on sys.path from the codec leg above
        from riff_ref_writer import avi_mjpeg_bytes, wav_bytes

        from openocr_spark.operators.multimodal import (
            audio_stats,
            video_frame_sample,
        )

        rng = np.random.default_rng(12)
        tone = np.sin(np.arange(1600)[:, None] / 5.0)
        av_df = spark.createDataFrame(
            [
                ("clip0", bytearray(avi_mjpeg_bytes(
                    [rng.integers(0, 256, (16, 24)).astype(np.uint8)
                     for _ in range(4)]))),
            ],
            "media_ref string, payload binary",
        )
        wav_df = spark.createDataFrame(
            [("tone0", bytearray(wav_bytes(tone, 8000)))],
            "media_ref string, payload binary",
        )
        a = audio_stats(wav_df).first()
        v = video_frame_sample(av_df, every_n=2).collect()
        print(
            f"[av]        wav {a.duration_ms} ms rms={a.rms}; "
            f"avi sampled frames: {sorted(r.frame_idx for r in v)}"
        )
    except ImportError:
        print("[av]        tests/ tree not shipped — skipping the "
              "audio/video leg (riff_ref_writer is test-side)")

    # 5 ── manifest resume + golden sink
    from openocr_spark.operators.manifest import run_with_manifest
    from openocr_spark.sources.sinks import write_system_results

    with tempfile.TemporaryDirectory() as tmp:
        out, mf = f"{tmp}/out", f"{tmp}/manifest"
        done = run_with_manifest(docs.limit(40), out, mf, n_buckets=4)
        again = run_with_manifest(docs.limit(40), out, mf, n_buckets=4)
        print(f"[resume]    first run processed buckets {sorted(done)}; rerun: {again} (all skipped)")
        sysr = f"{tmp}/system_results.txt"
        write_system_results(detail.limit(20), sysr)
        head = spark.read.text(sysr).first()[0]
        print("[sink]      system_results.txt head: " + head[:100])

    spark.stop()
    print("demo complete.")


if __name__ == "__main__":
    main()
