"""Calibration-report semantics and mirror-stats detection on
constructed corpora.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_calibration_bins_partition_the_corpus(spark):
    from blackedge_ocr_spark.analysis.classifier import calibration_report

    scored = spark.createDataFrame(
        [
            (1, 1, 0.05),
            (2, 0, 0.04),
            (3, 1, 0.55),
            (4, 1, 0.59),
            (5, 0, 0.52),
            (6, 1, 1.0),  # score 1.0 -> top bin, not bin 10
        ],
        "doc_id long, label long, score double",
    )
    rows = {r["bin"]: r for r in calibration_report(scored).collect()}
    assert set(rows) == {0, 5, 9}
    assert rows[0]["n"] == 2 and rows[0]["n_pos"] == 1
    assert rows[0]["pos_rate"] == 0.5
    assert rows[5]["n"] == 3 and rows[5]["pos_rate"] == 0.666667
    assert rows[9]["n"] == 1 and rows[9]["pos_rate"] == 1.0
    assert sum(r["n"] for r in rows.values()) == 6


def test_source_mirror_stats_finds_planted_mirror(spark):
    """A mirror stratum re-hosting half of source A's docs shows up
    as (A, mirror) pairs at jaccard 1.0; unrelated sources yield no
    cross mass."""
    from blackedge_ocr_spark.analysis.dedup import source_mirror_stats

    def page(prefix: str, i: int) -> str:
        # fully disjoint token sets across pages: no organic pairs
        return " ".join(f"{prefix}{i}w{k}" for k in range(30))

    rows = []
    for i in range(20):
        rows.append((i, page("a", i), "siteA"))
    for i in range(20, 40):
        rows.append((i, page("b", i), "siteB"))
    # mirror re-hosts siteA's even docs verbatim
    for i in range(0, 20, 2):
        rows.append((1000 + i, page("a", i), "mirror"))
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_mirror_stats(d).collect()
    }
    am = out[("siteA", "mirror")]
    assert am["n_pairs"] == 10
    assert am["mean_jaccard"] == 1.0
    # disjoint vocabularies: the mirror stratum is the ONLY pair mass
    assert set(out) == {("siteA", "mirror")}
