"""Scalar text functions re-creating the reference's normalization /
truncation / decode semantics (SURVEY.md §2.8). Pure-python kernels live
in `text.py` / `otsl.py` (unit-tested directly); Spark exposure is via
the pandas_udf wrappers in `udfs.py` and, where possible, plain column
expressions in `exprs.py` (preferred: JVM-side)."""

from openocr_spark.functions.exprs import (  # noqa: F401
    clean_special_tokens,
    formula_dollars,
    ignore_space,
    normalize_alnum,
    normalized_levenshtein,
)
from openocr_spark.functions.text import (  # noqa: F401
    pred_reverse,
    stream_match,
    truncate_repeated_tail,
    truncate_repetitive_content,
)
