"""Int8 scalar quantization: code bounds, degenerate vectors, and
agreement of the quantized scan with the float64 baseline.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_sq8_codes_bounds_and_zero_vector(spark):
    from blackedge_ocr_spark.analysis.ann import sq8_codes

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [-0.0, 3.0, -3.0, 1.5]),
        ],
        "vec_id long, v array<double>",
    ).select("vec_id", sq8_codes(F.col("v")).alias("c"))
    rows = {r["vec_id"]: list(r["c"]) for r in df.collect()}
    # max-|x| component always maps to ±127; HALF_UP grid elsewhere
    assert rows[1] == [64, -127, 32, 0]
    assert rows[2] == [0, 0, 0, 0]  # all-zero vector -> all-zero codes
    assert rows[3] == [0, 127, -127, 64]
    for codes in rows.values():
        assert all(-127 <= c <= 127 for c in codes)


def test_sq8_topk_near_exact_on_testdata(spark):
    """The int8 grid perturbs only borderline ranks: the quantized
    scan recovers ≥90% of the exact neighbor set at sf0.001 (measured
    0.96 here, 1.0 at the sf0.01 contract scale — the ann_recall
    'sq8' row), far above the bucketed paths (~0.2–0.45)."""
    from blackedge_ocr_spark.analysis import ann

    exact = {
        (r["q_id"], r["neighbor_id"])
        for r in ann.brute_force_topk(spark, SF).collect()
    }
    sq8 = {
        (r["q_id"], r["neighbor_id"])
        for r in ann.sq8_topk(spark, SF).collect()
    }
    assert len(sq8 & exact) >= 0.9 * len(exact)


def test_sq8_recall_row_present(spark):
    from blackedge_ocr_spark.analysis import ann

    rows = {r["method"]: r for r in ann.recall_vs_exact(spark, SF).collect()}
    assert set(rows) == {"lsh", "ivf", "ivf_kmeans", "sq8", "pq", "ivfpq"}
    assert rows["sq8"]["recall"] >= 0.9
    assert all(rows["sq8"]["recall"] >= rows[m]["recall"]
               for m in ("lsh", "ivf", "ivf_kmeans"))
