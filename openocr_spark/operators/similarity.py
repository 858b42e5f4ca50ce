"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path prunes
candidates to a partition (IVF-style cell = the `label` bucket here, or
sign-LSH buckets) before scoring. Dot products use built-in
zip_with/aggregate — JVM-side, no Python.

At 100 TB: broadcast the query set, bucket the corpus by cell id
(Iceberg bucket partitioning), score only matching cells; the brute
force variant exists for recall evaluation on samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.
    One full scan + a distributed top-k (TakeOrderedAndProject). Ranking
    uses the rounded similarity with id tiebreak so results are
    engine-deterministic."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.col(vec_col).cast("array<double>")
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(vec, q), 6).alias("cos_sim"),
    )
    # orderBy+limit plans as a distributed TakeOrderedAndProject: each
    # partition keeps its local top-k, the driver merges k·P rows. A
    # global row_number window would instead shuffle EVERY scored row to
    # one partition (no WindowGroupLimit is inserted for rank-filter
    # windows on this Spark version) — a single-node sort at 100 TB.
    top = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
    # ranking the k survivors is a k-row window — trivially single-node
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def cosine_topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    query_label: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style pruned ANN: score only the query's cell (partition
    pruning — at scale the cell is an Iceberg partition, so the scan
    reads one cell, not the corpus)."""
    return cosine_topk(
        emb.filter(F.col(cell_col) == query_label), query_vec, k, id_col, vec_col
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a cell (bucketed self-join:
    the join key prunes the quadratic surface to cell-local)."""
    vec = F.col(vec_col).cast("array<double>")
    base = emb.select(
        F.col(cell_col).alias("cell"), F.col(id_col).alias("id"), vec.alias("v")
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "cell")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
