"""SemDeDup semantics: planted exact duplicates are dropped
first-wins within their cluster; keepers stay; the cluster cap
bounds the pair work deterministically.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def test_semantic_dedup_drops_planted_duplicates_first_wins(spark):
    """An identical copy of every 10th vector (higher id) lands in
    the same k-means cluster (identical cosine to every centroid →
    same first-max pick) and must be flagged is_dup, while the
    lower-id original survives — the first-wins keeper rule."""
    from blackedge_ocr_spark.analysis import ann
    from blackedge_ocr_spark.analysis.semdedup import semantic_dedup_df

    e = _corpus(spark)
    dups = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "v"
    )
    corpus = e.unionByName(dups)
    cents = ann.kmeans_centroids(corpus)
    out = semantic_dedup_df(corpus, cents, threshold=0.999999)
    rows = {r["vec_id"]: r for r in out.collect()}

    assert len(rows) == corpus.count()
    for r in e.filter(F.col("vec_id") % 10 == 0).collect():
        orig, copy = rows[r["vec_id"]], rows[r["vec_id"] + 1_000_000]
        assert copy["cid"] == orig["cid"], "copy left its twin's cluster"
        assert copy["is_dup"], "planted duplicate survived"
        assert not orig["is_dup"], "original (lowest id) was dropped"


def test_semantic_dedup_threshold_one_no_exact_pairs_keeps_all(spark):
    """Without planted duplicates no pair reaches cos rounded to
    1.0 at the contract scale (max pairwise cosine ≈ 0.43), so a
    threshold of 1.0 keeps the whole corpus."""
    from blackedge_ocr_spark.analysis import ann
    from blackedge_ocr_spark.analysis.semdedup import semantic_dedup_df

    corpus = _corpus(spark)
    cents = ann.kmeans_centroids(corpus)
    out = semantic_dedup_df(corpus, cents, threshold=1.0)
    assert out.filter("is_dup").count() == 0
    assert out.count() == corpus.count()


def test_semantic_dedup_cluster_cap_limits_pairing(spark):
    """cap=1 keeps only the lowest id per cluster in the pairing
    set, so NO pair exists and nothing is dropped even with planted
    duplicates — the oracle-mirrored row_number rule."""
    from blackedge_ocr_spark.analysis import ann
    from blackedge_ocr_spark.analysis.semdedup import semantic_dedup_df

    e = _corpus(spark).limit(60)
    dups = e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "v")
    corpus = e.unionByName(dups)
    cents = ann.kmeans_centroids(corpus)
    capped = semantic_dedup_df(
        corpus, cents, threshold=0.999999, cluster_cap=1
    )
    assert capped.filter("is_dup").count() == 0
    uncapped = semantic_dedup_df(corpus, cents, threshold=0.999999)
    assert uncapped.filter("is_dup").count() == e.count()


def test_pruned_assign_identical_to_full_scan():
    """_pruned_first_max_assign must return EXACTLY the indices of
    _first_max_assign for random inputs including zero-norm vectors,
    zero-norm centroids, duplicated centroids (equal-cosine ties) and
    duplicated vectors — the round-5 exactness contract that lets
    semantic_dedup keep its DuckDB hash while dropping the O(n·C)
    scan."""
    import numpy as np

    from blackedge_ocr_spark.analysis import ann

    rng = np.random.RandomState(7)
    for trial in range(8):
        C = rng.randint(5, 120)
        dims = rng.choice([4, 16, 64])
        n = rng.randint(1, 400)
        Cm = rng.randn(C, dims)
        V = rng.randn(n, dims)
        # ties: duplicate some centroids and vectors verbatim
        if C > 3:
            Cm[2] = Cm[0]
            Cm[C - 1] = Cm[1]
        if trial % 2 == 0:
            Cm[min(3, C - 1)] = 0.0  # zero-norm centroid
        if n > 5:
            V[4] = 0.0               # zero-norm vector
            V[5] = V[0]
        # replicated-cluster shape (the corpus the prune targets)
        if trial % 3 == 0:
            V[: n // 2] = Cm[rng.randint(0, C, size=n // 2)] + \
                1e-3 * rng.randn(n // 2, dims)
        groups = ann._build_centroid_groups(Cm)
        got = ann._pruned_first_max_assign(V, Cm, groups)
        want = ann._first_max_assign(V, Cm)
        assert (got == want).all(), (trial, np.nonzero(got != want)[0][:5])


def test_train_stride_sql_parity():
    """ann.train_stride's arithmetic == TRAIN_STRIDE_SQL's, for n
    spanning both sides of every floor/crossover — the cross-engine
    contract the adaptive Lloyd sample rests on (the big-n corpora
    where the stride actually adapts are too large for the DuckDB
    list oracle to execute end-to-end, so the arithmetic is pinned
    directly)."""
    import duckdb

    from blackedge_ocr_spark.analysis import ann

    for n in [1, 10, 500, 2000, 21904, 22500, 102_399, 102_401,
              200_000, 500_000, 1_500_000, 5_000_000, 123_456_789]:
        sql = (
            "SELECT greatest(4, CAST(floor(greatest(37, "
            "CAST(floor(cnt / (4 * floor(sqrt(cnt)))) AS BIGINT)"
            ")::DOUBLE / 16.0) AS BIGINT)) "
            f"FROM (SELECT {n}::BIGINT AS cnt)"
        )
        got = duckdb.sql(sql).fetchone()[0]
        assert got == ann.train_stride(n), (n, got, ann.train_stride(n))
        stride_sql = (
            "SELECT greatest(37, CAST(floor(cnt / "
            "(4 * floor(sqrt(cnt)))) AS BIGINT)) "
            f"FROM (SELECT {n}::BIGINT AS cnt)"
        )
        got_s = duckdb.sql(stride_sql).fetchone()[0]
        assert got_s == ann.centroid_stride(n), (n, got_s)
