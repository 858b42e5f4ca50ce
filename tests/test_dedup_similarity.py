"""Unit tests for the dedup / similarity scale guards added in round 2:
hot-shingle cap (VERDICT r1 finding 2), near-dup pairs with known
non-empty output (finding 3), distributed top-k semantics (finding 1).
"""

import math

from pyspark.sql import functions as F

from openocr_spark.operators import dedup, similarity


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A stop-shingle shared by every doc must NOT produce O(n²) pairs
    once the df cap is active. 40 docs all containing the same 3-gram
    plus unique tails: uncapped → C(40,2)=780 candidate pairs from the
    stop shingle alone; capped at max_df=10 → 0 pairs."""
    rows = [(f"d{i:03d}", f"the quick fox tail{i}a tail{i}b tail{i}c") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    capped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0, max_df=10)
    assert capped.count() == 0
    uncapped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0, max_df=10_000)
    assert uncapped.count() == 40 * 39 // 2


def test_ngram_jaccard_cap_keeps_real_dups(spark):
    """Near-identical docs still pair up under the cap: the overlapping
    content shingles have low df."""
    rows = [
        ("a", "alpha beta gamma delta epsilon zeta"),
        ("b", "alpha beta gamma delta epsilon eta"),
        ("c", "one two three four five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.3, max_df=50)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert ("a", "b") in pairs
    # |A∩B| = 3 shared shingles, |A|=|B|=4 → J = 3/5
    assert math.isclose(pairs[("a", "b")], 0.6, abs_tol=1e-6)
    assert len(pairs) == 1


def test_dedup_components_transitive_chain(spark):
    """A~B and B~C collapse to one canonical even though A,C never
    paired; disjoint components stay separate."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    out = {r.id: r.canonical_id for r in dedup.dedup_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_dedup_components_converges_on_ring(spark):
    """Worst-case diameter: a ring of 8 nodes needs several propagation
    rounds; the loop must converge to the global min everywhere."""
    n = 8
    pairs = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "id_a long, id_b long"
    )
    out = {r.id: r.canonical_id for r in dedup.dedup_components(pairs).collect()}
    assert out == {i: 0 for i in range(n)}


def test_deduplicate_corpus_end_to_end(spark):
    """LSH → verify → components → verdicts on a constructed corpus:
    two exact near-dups collapse to the lower id; a doc that shares a
    few shingles but fails the Jaccard verify survives; singletons are
    their own canonical."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " extra"),                # near-dup of 1 (J >= 0.5)
        (3, base.replace("alpha beta gamma delta epsilon ", "") +
            " one two three four five six seven eight"),  # weak overlap
        (4, "completely different words nothing shared here at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: (r.canonical_id, r.keep)
           for r in dedup.deduplicate_corpus(df, "doc_id", "text", 0.5).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)   # dropped as duplicate of 1
    assert out[3] == (3, True)    # candidate maybe, but verify fails
    assert out[4] == (4, True)


def test_near_dup_pairs_known_pairs(spark):
    """Constructed cell with one near-identical pair and one orthogonal
    vector: exactly the near pair survives the threshold."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.1], 0),
        (2, [1.0, 0.05, 0.0, 0.1], 0),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),    # same cell, orthogonal
        (4, [1.0, 0.0, 0.0, 0.1], 1),    # identical to 1 but other cell
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = similarity.near_dup_pairs(df, threshold=0.9)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1, 2)}


def test_near_dup_pairs_nonempty_on_driver_table(spark):
    """The driver-contract query must be non-vacuous at sf0.01
    (VERDICT r1: 0-row oracle checks prove nothing)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = similarity.near_dup_pairs(emb, threshold=0.3).count()
    assert n > 0


def test_ivf_trained_recall_at_10(spark):
    """Trained-centroid IVF with nprobe=5 must reach recall@10 ≥ 0.9 vs
    the exact brute force on the sf0.01 fixture (VERDICT r1 item 7).
    The fixture embeddings are near-isotropic — the hard case — so this
    pins the honest multi-probe operating point."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row[0]]
    exact = {r.vec_id for r in similarity.cosine_topk(emb, qv, k=10).collect()}
    approx = {
        r.vec_id
        for r in similarity.cosine_topk_ivf_trained(emb, qv, k=10, nprobe=5).collect()
    }
    assert len(exact & approx) / 10 >= 0.9


def test_ivf_cell_assignment_partitions_corpus(spark):
    """Every vector lands in exactly one of the k cells; no cell is
    empty on the fixture (the quantizer is trained on this sample)."""
    from openocr_spark.operators.ivf_centroids import CENTROIDS

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cells = emb.select(
        similarity.ivf_cell(F.col("embedding").cast("array<double>")).alias("c")
    )
    counts = {r.c: r.n for r in cells.groupBy("c").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(len(CENTROIDS)))
    assert sum(counts.values()) == emb.count()


def test_quantized_rerank_matches_exact(spark):
    """int8 scan + exact rerank: on the fixture the rerank-50 buffer
    absorbs all quantization reordering, so the final top-10 equals the
    exact brute force."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row[0]]
    exact = [(r.vec_id, r.cos_sim) for r in
             similarity.cosine_topk(emb, qv, k=10).orderBy("rank").collect()]
    quant = [(r.vec_id, r.cos_sim) for r in
             similarity.cosine_topk_quantized(emb, qv, k=10).orderBy("rank").collect()]
    assert quant == exact


def test_quantized_rerank_plan_is_two_distributed_topks(spark):
    from openocr_spark import plans
    from openocr_spark.queries import SPARK_Q

    df = SPARK_Q["ann_quantized"](spark, "/root/testdata/sf0.01")
    plan = plans.physical_plan(df)
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_cosine_topk_values_match_bruteforce(spark):
    """TakeOrderedAndProject top-k returns the same set/order as a full
    sort."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row[0]]
    topk = similarity.cosine_topk(emb, qv, k=10).orderBy("rank").collect()
    assert len(topk) == 10
    assert [r.rank for r in topk] == list(range(1, 11))
    # rank 1 is the query vector itself (cos=1.0)
    assert topk[0].vec_id == 0
    assert abs(topk[0].cos_sim - 1.0) < 1e-6
    # descending similarity with id tiebreak
    sims = [(-r.cos_sim, r.vec_id) for r in topk]
    assert sims == sorted(sims)


def test_jaccard_verify_pairs_matches_global_join(spark):
    """VERDICT r2 item 1: the candidate-restricted verify must produce
    the SAME jaccard values as the global inverted-index self-join for
    the pairs it is given (the stop-shingle universe stays global)."""
    rows = [
        ("a", "alpha beta gamma delta epsilon zeta"),
        ("b", "alpha beta gamma delta epsilon eta"),
        ("c", "alpha beta gamma theta iota kappa"),
        ("d", "one two three four five six"),
        ("e", "one two three four five seven"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    glob = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.0, max_df=50
        ).collect()
    }
    pairs = spark.createDataFrame(
        [("a", "b"), ("d", "e")], "id_a string, id_b string"
    )
    restricted = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_verify_pairs(
            df, pairs, "doc_id", "text", threshold=0.0, max_df=50
        ).collect()
    }
    assert set(restricted) == {("a", "b"), ("d", "e")}
    for k, v in restricted.items():
        assert math.isclose(v, glob[k], abs_tol=1e-9)


def test_jaccard_verify_cost_scales_with_candidates(spark):
    """The verify join's quadratic surface must scale with |candidates|,
    not |corpus|: with 100 docs of which 50 are mutually above-threshold
    near-dups, a 1-pair candidate set must restrict the shingle relation
    to the 2 candidate docs before any self-join. Asserted two ways:
    (a) output rows = candidate pairs only (the global join would emit
    C(50,2)+1 pairs), (b) the physical plan contains no join wider than
    the candidate-doc shingle relation (checked via the row count of the
    narrowed relation the join is built from)."""
    # 50 near-identical docs (every pair above threshold) + 50 unique
    dups = [(f"x{i:02d}", f"shared one two three four five tag{i}") for i in range(50)]
    uniq = [(f"u{i:02d}", f"unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e") for i in range(50)]
    df = spark.createDataFrame(dups + uniq, "doc_id string, text string")
    cand = spark.createDataFrame([("x00", "x01")], "id_a string, id_b string")
    out = dedup.jaccard_verify_pairs(
        df, cand, "doc_id", "text", threshold=0.1, max_df=200
    )
    rows = out.collect()
    assert len(rows) == 1 and (rows[0].id_a, rows[0].id_b) == ("x00", "x01")
    # the global join on the same corpus would score >1000 pairs
    glob_n = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.1, max_df=200
    ).count()
    assert glob_n >= 50 * 49 // 2


def test_dedup_components_deep_rounds_no_plan_blowup(spark):
    """ADVICE r2 + regression guard: dedup_components is checkpoint-
    based — per-round lineage truncation keeps the Catalyst plan
    constant-size (the r2 persist-based loop referenced the previous
    round twice, doubling the plan tree per round; a ring of 16 —
    ~9 rounds — OOM'd the driver in plan-string generation). Storage is
    ContextCleaner/GC-managed, never a session-lifetime CacheManager
    entry: clearing the SQL cache must not invalidate the result."""
    n = 16
    pairs = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "id_a long, id_b long"
    )
    out = dedup.dedup_components(pairs)
    got = {r.id: r.canonical_id for r in out.collect()}
    assert got == {i: 0 for i in range(n)}
    spark.catalog.clearCache()
    assert out.count() == n


def test_deduplicate_corpus_uses_candidate_restricted_verify(spark):
    """End-to-end: deduplicate_corpus's verify path goes through
    jaccard_verify_pairs (verdicts unchanged vs the r2 global-verify
    semantics on a corpus with real dups and uniques)."""
    rows = (
        [("a1", "alpha beta gamma delta epsilon zeta"),
         ("a2", "alpha beta gamma delta epsilon zeta"),
         ("b1", "one two three four five six"),
         ("b2", "one two three four five six")]
        + [(f"u{i}", f"lone{i}a lone{i}b lone{i}c lone{i}d lone{i}e") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.id: (r.canonical_id, r.keep)
           for r in dedup.deduplicate_corpus(df, "doc_id", "text").collect()}
    assert out["a1"] == ("a1", True) and out["a2"] == ("a1", False)
    assert out["b1"] == ("b1", True) and out["b2"] == ("b1", False)
    assert all(out[f"u{i}"] == (f"u{i}", True) for i in range(10))


def test_quantized_coarse_scan_excludes_float_column(spark):
    """VERDICT r2 item 2: with a materialized code table, stage 1's
    parquet scan must read ONLY (vec_id, codes) — the float embedding
    column appears in exactly one scan (the rerank float fetch), and
    the code-table scan's ReadSchema excludes it."""
    from openocr_spark import plans
    from openocr_spark.queries import SPARK_Q

    df = SPARK_Q["ann_quantized"](spark, "/root/testdata/sf0.01")
    plan = plans.physical_plan(df)
    # find the code-table scan: it must exist and not read 'embedding'
    import re
    scans = re.findall(r"ReadSchema: [^\n]*", plan)
    code_scans = [s for s in scans if "codes" in s]
    assert code_scans, plan
    assert all("embedding" not in s for s in code_scans), code_scans
    # codes stored narrow: tinyint elements
    codes_path = similarity.ensure_i8_codes(spark, "/root/testdata/sf0.01")
    codes = spark.read.parquet(codes_path)
    assert dict(codes.dtypes)["codes"] == "array<tinyint>"


def test_quantized_precomputed_codes_match_inline(spark):
    """Materialized-code path returns exactly the inline-code results."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row[0]]
    inline = [(r.vec_id, r.cos_sim, r.rank) for r in
              similarity.cosine_topk_quantized(emb, qv, k=10).orderBy("rank").collect()]
    codes = similarity.with_i8_codes(emb)
    pre = [(r.vec_id, r.cos_sim, r.rank) for r in
           similarity.cosine_topk_quantized(emb, qv, k=10, codes=codes)
           .orderBy("rank").collect()]
    assert pre == inline


def _union_find_components(n_nodes, edge_list):
    """Driver-side union-find ground truth for the CC property tests."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node id of the component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_star_components_equal_hash_min_on_random_graphs(spark):
    """VERDICT r2 item 8: large-star/small-star must produce exactly the
    same (id, canonical_id) mapping as hash-min label propagation —
    checked against a driver-side union-find on random graphs with
    mixed topology (chains force depth, cliques force density)."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        # an adversarial long path (diameter ~ 14)
        edges += [(100 + i, 100 + i + 1) for i in range(14)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        truth = _union_find_components(200, edges)
        seen = {x for e in edges for x in e}
        want = {x: truth[x] for x in seen}
        star = {r.id: r.canonical_id
                for r in dedup.dedup_components_star(df).collect()}
        hmin = {r.id: r.canonical_id
                for r in dedup.dedup_components(df, max_iters=40).collect()}
        assert star == want, f"seed {seed}: star mismatch"
        assert hmin == want, f"seed {seed}: hash-min mismatch"


def test_star_components_logarithmic_rounds_on_long_path(spark):
    """A 100-node path needs ~50 hash-min rounds but must converge in
    O(log n) star rounds — max_iters=12 would fail a linear algorithm."""
    edges = [(i, i + 1) for i in range(100)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.id: r.canonical_id
           for r in dedup.dedup_components_star(df, max_iters=12).collect()}
    assert out == {i: 0 for i in range(101)}


def test_star_components_self_loop_only_node(spark):
    """A node whose only pair is (x, x) stays its own canonical."""
    df = spark.createDataFrame(
        [(5, 5), (1, 2)], "id_a long, id_b long"
    )
    out = {r.id: r.canonical_id
           for r in dedup.dedup_components_star(df).collect()}
    assert out == {5: 5, 1: 1, 2: 1}


def test_near_dup_sign_bits_subbucketing(spark):
    """The sign-LSH scale knob: sign_bits>0 sub-buckets each cell, so
    the output is a SUBSET of the exact within-cell pairs, identical
    pairs (cos=1) always survive (identical vectors share every sign),
    and the quadratic join surface shrinks."""
    rows = []
    rng_rows = 80
    import random

    rng = random.Random(11)
    for i in range(rng_rows):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, v, 0))  # ONE dense cell — the pathological case
    rows.append((1000, rows[0][1], 0))  # exact duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    exact = {(r.id_a, r.id_b) for r in
             similarity.near_dup_pairs(df, threshold=0.5).collect()}
    sub = {(r.id_a, r.id_b) for r in
           similarity.near_dup_pairs(df, threshold=0.5, sign_bits=3).collect()}
    assert sub <= exact
    assert (0, 1000) in sub  # identical vectors never separate
    # the bucketing actually splits the cell (join surface shrank)
    buckets = df.select(
        similarity.sign_bucket(F.col("embedding"), 3).alias("b")
    ).groupBy("b").count().collect()
    assert len(buckets) > 1
    assert max(r["count"] for r in buckets) < rng_rows + 1


def test_near_dup_lsh_banded_recall(spark):
    """Banded sign-LSH + exact verify: on a constructed set of 30
    high-cosine pairs (v, v+tiny noise) among 200 random vectors, the
    banded variant must (a) emit only true >=threshold pairs (exact
    verify — no false positives), (b) recover >=80% of them (theory:
    ~0.95 at c~0.99, bits=4, bands=4)."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(200):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(16)]))
    for j in range(30):
        base = rows[j][1]
        rows.append((1000 + j, [x + rng.uniform(-0.01, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b): r.cos_sim for r in
           similarity.near_dup_pairs_lsh(df, threshold=0.95).collect()}
    want = {(j, 1000 + j) for j in range(30)}
    # no false positives: every emitted pair really has cos >= 0.95
    assert all(v >= 0.95 for v in got.values())
    hit = len(want & set(got))
    assert hit >= 24, f"recall {hit}/30"


def test_sign_bucket_wide_vectors_not_all_zero(spark):
    """Review finding: with >64-dim embeddings the old zip_with
    null-padded the hyperplane and sent EVERY vector to bucket 0 —
    silently disabling the LSH. Wide vectors must spread."""
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(128)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    buckets = df.select(
        similarity.sign_bucket(F.col("embedding"), 4).alias("b")
    ).groupBy("b").count().collect()
    assert len(buckets) > 4


def test_ivf_cells_materialized_path_matches_inline(spark):
    """ensure_ivf_cells' write-time cell assignment must reproduce the
    inline per-row assignment exactly: same cells, and the cells= query
    path returns the identical ranked top-k."""
    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row[0]]
    cells_path = similarity.ensure_ivf_cells(spark, sf)
    cells = spark.read.parquet(cells_path)
    inline_cells = {
        r.vec_id: r.c
        for r in emb.select(
            "vec_id",
            similarity.ivf_cell(F.col("embedding").cast("array<double>")).alias("c"),
        ).collect()
    }
    stored_cells = {r.vec_id: r.cell for r in cells.select("vec_id", "cell").collect()}
    assert stored_cells == inline_cells
    inline = [
        (r.vec_id, r.cos_sim, r.rank)
        for r in similarity.cosine_topk_ivf_trained(emb, qv, k=10, nprobe=5)
        .orderBy("rank")
        .collect()
    ]
    mat = [
        (r.vec_id, r.cos_sim, r.rank)
        for r in similarity.cosine_topk_ivf_trained(
            emb, qv, k=10, nprobe=5, cells=cells
        )
        .orderBy("rank")
        .collect()
    ]
    assert mat == inline


def test_ivf_cells_probe_filter_is_partition_pruning(spark):
    """VERDICT r3 item 2: with the materialized cell layout, the probe
    filter must be PARTITION pruning, not a computed filter — the scan's
    PartitionFilters carries the probe IN-list, every scanned file lives
    under a cell=<probe> directory, and the plan computes zero centroid
    dot products (no full-corpus cell assignment)."""
    import re

    from openocr_spark import plans
    from openocr_spark.queries import SPARK_Q

    sf = "/root/testdata/sf0.01"
    df = SPARK_Q["ann_ivf_trained"](spark, sf)
    plan = plans.physical_plan(df)
    # partition filter on `cell` present at the scan
    pf = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    cell_pf = [s for s in pf if "cell" in s]
    assert cell_pf, plan
    assert any("cell" in s and ("IN" in s or "in(" in s.lower()) for s in cell_pf), cell_pf
    # runtime ground truth: the executed scan's numFiles/numPartitions
    # metrics count only what was actually read — 5 probe cells of the
    # 8 on disk (inputFiles()/PartitionFilters only show intent)
    import glob

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    probes = set(similarity.probe_cells([float(x) for x in row[0]], nprobe=5))
    cells_path = similarity.ensure_ivf_cells(spark, sf)
    all_cells = glob.glob(f"{cells_path}/cell=*")
    assert len(all_cells) == 8 and len(probes) == 5
    pruned = spark.read.parquet(cells_path).filter(
        F.col("cell").isin(*probes)
    ).select("vec_id")
    pruned.collect()
    (metrics,) = plans.executed_scan_metrics(pruned)
    assert metrics["numPartitions"] == len(probes), metrics
    assert metrics["numFiles"] == len(probes), metrics  # 1 file/cell (repartitioned write)
    # no per-row centroid math anywhere in the pruned plan: the inline
    # path's signature is a k_cells-wide array_min of dist structs
    assert "array_min" not in plan, plan


def test_near_dup_lsh_strict_dims_fails_loud(spark):
    """ADVICE r3 item 2: a corpus whose embedding width differs from
    the hyperplane width must ERROR on both engine and oracle sides,
    never silently project onto the leading coordinates."""
    import duckdb
    import pytest

    from openocr_spark.queries import _near_dup_lsh_sql

    rows = [(i, [float(i), 1.0, -1.0]) for i in range(4)]  # 3-dim, not 64
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the raise_error surfaces as Py4JJavaError or as the converted
    # SparkRuntimeException depending on where in the plan it fires
    # (driver-local projection vs executor task) — the contract under
    # test is the MESSAGE, not the wrapper class
    with pytest.raises(Exception, match="dim != 64"):
        similarity.near_dup_pairs_lsh(df, strict_dims=True).collect()
    # non-strict keeps the documented projection semantics
    assert similarity.near_dup_pairs_lsh(df, strict_dims=False).count() >= 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])) t(vec_id, embedding)"
    )
    # duckdb fails loudly too — either our chk-CTE error or its own
    # list-length check, whichever the optimizer evaluates first
    with pytest.raises(duckdb.Error, match="dim"):
        con.execute(_near_dup_lsh_sql()).fetchall()


def test_tuned_lsh_params_scaling_math():
    """The tuned parameters must (a) bound expected bucket occupancy as
    the corpus grows — bits rises with log2(n) — and (b) restore the
    recall the extra bits cost via more bands (closed form)."""
    import math

    b1, k1 = similarity.tuned_lsh_params(6_000, threshold=0.9, recall=0.9)
    b2, k2 = similarity.tuned_lsh_params(60_000, threshold=0.9, recall=0.9)
    b3, k3 = similarity.tuned_lsh_params(600_000, threshold=0.9, recall=0.9)
    # occupancy bound: n / 2^bits <= target (64) at every scale
    for n, k in ((6_000, k1), (60_000, k2), (600_000, k3)):
        assert n / (1 << k) <= 64
    assert k1 < k2 < k3  # bits track log2(n)
    # closed-form recall holds at the threshold for every tuned pair
    for thr, rec in ((0.9, 0.9), (0.95, 0.8), (0.99, 0.9)):
        for n in (1_000, 50_000, 2_000_000):
            bands, bits = similarity.tuned_lsh_params(n, thr, rec)
            p = 1 - math.acos(thr) / math.pi
            if bands < 64:  # below the spend cap the target must be met
                assert 1 - (1 - p**bits) ** bands >= rec - 1e-9
    # tiny corpora keep the 4-bit floor (never fewer buckets than 16)
    assert similarity.tuned_lsh_params(100, 0.9, 0.9)[1] == 4


def test_near_dup_lsh_tuned_equals_fixed_params(spark):
    """The tuned wrapper must produce EXACTLY the fixed-parameter
    operator's pairs for the parameters it derives — same hyperplanes,
    same bands, same verify — so the hash-checked fixed-param oracle
    covers the tuned path's semantics too."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    for j in range(20):
        rows.append((2000 + j, [x + rng.uniform(-0.005, 0.005) for x in rows[j][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bands, bits = similarity.tuned_lsh_params(df.count(), 0.95, 0.9)
    tuned = {(r.id_a, r.id_b, r.cos_sim) for r in
             similarity.near_dup_pairs_lsh_tuned(df, 0.95, recall=0.9).collect()}
    fixed = {(r.id_a, r.id_b, r.cos_sim) for r in
             similarity.near_dup_pairs_lsh(df, 0.95, bands, bits).collect()}
    assert tuned == fixed
    assert len(tuned) > 0  # non-vacuous: the planted pairs are found


def test_cell_write_salts_scales_with_corpus():
    """Shard SIZE, not shard count, is the invariant: fixture corpora
    keep the 1-file-per-cell layout (the pruning assert relies on it),
    web-scale corpora spread each cell over ~n/4M parallel writers."""
    from openocr_spark.operators.similarity import _cell_write_salts

    assert _cell_write_salts(0) == 1
    assert _cell_write_salts(10_000) == 1
    assert _cell_write_salts(4_000_000) == 1
    assert _cell_write_salts(4_000_001) == 2
    assert _cell_write_salts(1_000_000_000) == 250
