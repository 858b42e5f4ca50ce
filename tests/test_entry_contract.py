"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 AND its oracle_sql() through DuckDB, then compare
row count + column names + order-insensitive values exactly.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    _, s_canon = _canon(s_cols, s_rows)
    _, d_canon = _canon(d_cols, d_rows)
    mism = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} mismatched rows, first: {mism[:3]}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.schema.simpleString().startswith("struct<doc_id:string,spans:array")


def test_oracle_marker_mismatch_regenerates(tmp_path, monkeypatch):
    """Review finding: a stale directory with a MISMATCHED marker at
    ORACLE_DIR must be replaced, not silently served (the old rename
    fallback assumed any existing dir was a concurrent writer's copy
    of the same tables)."""
    import json
    import os as _os

    from openocr_spark import fixture_oracle as FO

    fake_dir = str(tmp_path / "oracle")
    _os.makedirs(fake_dir)
    with open(f"{fake_dir}/marker.json", "w") as f:
        json.dump({"version": FO.VERSION, "sf_dir": "/some/other/sf"}, f)
    with open(f"{fake_dir}/det_gt.parquet", "w") as f:
        f.write("stale bytes, not even parquet")
    monkeypatch.setattr(FO, "ORACLE_DIR", fake_dir)
    out = FO.ensure("/root/testdata/sf0.001")
    assert out == fake_dir
    got = json.load(open(f"{fake_dir}/marker.json"))
    assert got == {"version": FO.VERSION, "sf_dir": "/root/testdata/sf0.001"}
    import pandas as pd

    assert len(pd.read_parquet(f"{fake_dir}/extract_spans.parquet")) > 0
