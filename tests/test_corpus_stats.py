"""Unit tests for the corpus-shape operators: IDF table, exact
distributed percentiles (vs numpy's linear interpolation), and the
snapshot-diff classifier. DuckDB end-to-end parity is covered by the
driver contract; these pin the semantics on hand-built inputs."""

import math

import numpy as np
from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis import corpusops, textstats


def test_term_doc_freq_counts_and_idf(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha delta"),
            (3, "alpha beta xy"),  # 'xy' too short for a key term
        ],
        "doc_id long, text string",
    )
    rows = {
        r["term"]: (r["df"], r["idf"])
        for r in textstats.term_doc_freq(docs).collect()
    }
    assert set(rows) == {"alpha", "beta", "gamma", "delta"}
    assert rows["alpha"][0] == 3 and rows["alpha"][1] == 0.0
    assert rows["beta"][0] == 2  # repeats within a doc count once
    assert rows["gamma"][0] == 1
    want = math.floor(math.log(3 / 2) * 1e6 + 0.5) / 1e6
    assert rows["beta"][1] == want


def test_corpus_token_stats_matches_numpy_percentiles(spark):
    rows = []
    counts = {"web": [1, 2, 3, 4, 5, 6, 7, 8, 9, 50], "book": [10, 20, 21]}
    i = 0
    for src, ns in counts.items():
        for n in ns:
            rows.append((i, src, "w " * n))  # n whitespace tokens
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r.asDict()
        for r in textstats.corpus_token_stats(docs).collect()
    }
    for src, ns in counts.items():
        assert got[src]["n_docs"] == len(ns)
        for p in textstats.PCTS:
            want = float(np.percentile(ns, p * 100, method="linear"))
            want = math.floor(want * 1e6 + 0.5) / 1e6
            assert got[src][f"p{int(p * 100)}_tokens"] == want, (src, p)


def test_snapshot_diff_classification(spark):
    # doc_ids chosen to hit each class: 3 -> added (absent from A),
    # 7 -> removed (absent from B), 17 -> changed (revised in B),
    # 1 -> unchanged.
    docs = spark.createDataFrame(
        [(1, "one"), (3, "three"), (7, "seven"), (17, "seventeen")],
        "doc_id long, text string",
    )
    got = {
        r["status"]: (r["n_docs"], r["min_doc_id"], r["max_doc_id"])
        for r in corpusops.snapshot_diff(docs).collect()
    }
    assert got == {
        "added": (1, 3, 3),
        "removed": (1, 7, 7),
        "changed": (1, 17, 17),
        "unchanged": (1, 1, 1),
    }


def test_snapshot_views_are_deterministic_projections(spark):
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    )
    a, b = corpusops.snapshot_views(docs)
    assert a.count() == 200 - 4  # 4 ids = 3, 53, 103, 153
    assert b.count() == 200 - 4  # 4 ids = 7, 57, 107, 157
    revised = b.filter(F.col("text").endswith(corpusops.DIFF_REV_SUFFIX))
    assert revised.count() == b.filter(
        F.col("doc_id") % corpusops.DIFF_REV_MOD == 0
    ).count()
