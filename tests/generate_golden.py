"""Generate the frozen golden files (FIXTURES.md F-E) from the
single-node oracle. Run once and commit the outputs; tests then diff
both the oracle (semantic drift guard) and the Spark pipeline against
these files.

    python tests/generate_golden.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from openocr_spark.config import DEFAULT_CONFIG  # noqa: E402
from openocr_spark.fixtures import gen_documents_pdf, media_refs_of  # noqa: E402
from openocr_spark.oracle import extract_oracle, media_detail  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
N_DOCS = 24  # includes skew doc idx 7
N_MEDIA = 20


def golden_extractions() -> list[dict]:
    pdf = extract_oracle(gen_documents_pdf(N_DOCS))
    return [
        {"doc_id": r["doc_id"], "spans": r["spans"]}
        for r in pdf.sort_values("doc_id").to_dict("records")
    ]


def golden_media_refs() -> list[str]:
    return sorted(media_refs_of(gen_documents_pdf(N_DOCS)))[:N_MEDIA]


def golden_system_results() -> list[str]:
    lines = []
    for ref in golden_media_refs():
        payload = [
            {
                "transcription": d["transcription"],
                "points": d["points"],
                "score": round(d["rec_score"], 6),
            }
            for d in media_detail(ref, DEFAULT_CONFIG)
        ]
        lines.append(f"{ref}\t{json.dumps(payload, separators=(',', ':'))}")
    return lines


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(os.path.join(GOLDEN_DIR, "extractions.jsonl"), "w") as f:
        for row in golden_extractions():
            f.write(json.dumps(row, separators=(",", ":")) + "\n")
    with open(os.path.join(GOLDEN_DIR, "system_results.txt"), "w") as f:
        f.write("\n".join(golden_system_results()) + "\n")
    print(f"golden files written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
