"""Z-order layout: the Morton curve against a pure-Python reference,
and the pruning-audit property the layout exists for."""

import pyspark.sql.functions as F

from blackedge_ocr_spark import plans
from blackedge_ocr_spark.analysis import zorder

SF = "/root/testdata/sf0.001"


def _py_spread16(x: int) -> int:
    x &= 0xFFFF
    for shift, mask in zorder._SPREAD_STEPS:
        x = (x | (x << shift)) & mask
    return x


def test_z_value_matches_python_reference(spark):
    """The Spark bit-spread equals the classic Morton interleave on
    corners, mid-range, and adjacent values."""
    vals = [0, 1, 2, 3, 255, 256, 12345, 54321, 65534, 65535]
    rows = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "qx long, qy long")
    got = {
        (r["qx"], r["qy"]): r["z"]
        for r in df.select(
            "qx", "qy", zorder.z_value(F.col("qx"), F.col("qy")).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_spread16(a) | (_py_spread16(b) << 1)


def test_zorder_prunes_both_dimensions(spark):
    """The property the audit exists to show: each single-dim-sorted
    layout scans EVERY bucket for the other dimension's predicate,
    while the z-order layout prunes both dimensions and reads no
    more rows for the 2-D predicate than either sorted layout."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = {
        r["layout"]: r.asDict()
        for r in zorder.layout_prune_stats(e).collect()
    }
    # empty buckets don't materialize, so each layout's full-scan
    # count is its OWN n_buckets (sf0.001 has just 15 distinct users)
    assert (
        out["time_sorted"]["scanned_user"] == out["time_sorted"]["n_buckets"]
    )
    assert (
        out["user_sorted"]["scanned_hour"] == out["user_sorted"]["n_buckets"]
    )
    nb = out["zorder"]["n_buckets"]
    assert out["zorder"]["scanned_user"] < nb
    assert out["zorder"]["scanned_hour"] < nb
    assert (
        out["zorder"]["rows_both"]
        <= min(
            out["time_sorted"]["rows_both"], out["user_sorted"]["rows_both"]
        )
    )


def test_zorder_audit_is_two_shuffles(spark):
    """One corpus-wide hash agg on (layout, bucket) plus the final
    3-row layout agg — the 1-row bounds ride broadcast joins, never
    a shuffle of the event stream."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    q = zorder.layout_prune_stats(e)
    plan = plans.formatted_plan(q)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plans.count_exchanges(q) <= 3, plan
