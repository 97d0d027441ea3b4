"""Z-order (Morton-curve) data layout and min/max pruning audit.

At 100 TB the dominant cost of a selective query is the files it
CANNOT skip. Lakehouse engines (Delta OPTIMIZE ZORDER, Iceberg
rewrite with a z-sort-order) cluster rows along a space-filling
curve so that per-file min/max column statistics become selective
on EVERY z-dimension at once: a file then covers a small tile of
the (dim1, dim2) plane instead of a thin full-width stripe, and
zone-map pruning (the same PartitionFilters/row-group-stats
machinery the parquet scan already uses) skips most files for
predicates on either dimension.

This module makes that trade measurable inside the engine:

- ``z_value(qx, qy)`` — the 32-bit Morton interleave of two 16-bit
  quantized coordinates, built from the classic 4-step bit-spread
  (each step = shiftleft | or, then mask). Pure int64 arithmetic —
  shiftleft / bitwiseOR / bitwiseAND exist identically in DuckDB,
  so the curve is bit-equal across engines by construction.
- ``layout_prune_stats(events)`` — assigns every event row to a
  64-bucket "file" under three layouts (time-sorted = the natural
  ingestion order, user-sorted, z-order over (user, epoch-hour)),
  collects per-bucket min/max zone maps in ONE pass (the three
  bucket ids are computed row-side and exploded, so the corpus is
  scanned once), and evaluates zone-map pruning for a fixed 5%
  band predicate on each dimension and on both. Quantization bounds
  come from a 1-row global agg that rides a broadcast cross join —
  the table-stats lookup a real optimizer gets for free; never a
  driver collect.

Expected shape of the answer (asserted by the pytest): a single-dim
sorted layout prunes perfectly on its own dimension and scans 100%
of the buckets for the other dimension; the z-order layout prunes
on BOTH (each 1/64 bucket is a 1/8 x 1/8 tile of the plane), which
is the property that makes it the right write layout when the
workload filters on more than one column.

Scale shape: one corpus scan -> explode(3) -> hash agg on
(layout, bucket) — map-side combinable, O(192) output rows; the
predicate evaluation is a projection over that tiny table. No
window, no join wider than the broadcast 1-row bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BUCKETS_LOG2 = 6            # 64 "files" per layout
Z_BITS = 16                   # per-dimension quantization width
# (lo_pct, hi_pct) selectivity bands for the audit predicates —
# deliberately different per dimension so the two single-dim
# predicates are independent.
USER_BAND = (40, 45)
HOUR_BAND = (70, 75)

# The classic 16->32-bit Morton spread: (shift, mask) per step.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col):
    """Spread a 16-bit value into the even bit positions of a 32-bit
    word (b15..b0 -> bit positions 30,28,..,0)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z_value(qx, qy):
    """Morton interleave of two 16-bit quantized coordinates; qx
    occupies the even bits, qy the odd bits."""
    return _spread16(qx).bitwiseOR(F.shiftleft(_spread16(qy), 1))


def layout_prune_stats(events: DataFrame) -> DataFrame:
    """(layout, n_buckets, scanned_user, scanned_hour, scanned_both,
    rows_both) — zone-map pruning audit of three write layouts over
    the events table; see module docstring."""
    # epoch-hour via integer div — double division + cast could land
    # one off at representation boundaries; div cannot.
    e = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 3600000000"
        ).alias("hr"),
    )
    bounds = e.agg(
        F.min("u").alias("umin"), F.max("u").alias("umax"),
        F.min("hr").alias("hmin"), F.max("hr").alias("hmax"),
    )
    j = e.crossJoin(F.broadcast(bounds))

    top = (1 << Z_BITS) - 1

    # exact integer quantization: ((v - lo) * top) div span
    qu = F.when(
        (F.col("umax") - F.col("umin")) > 0,
        F.expr(f"((u - umin) * {top}) div (umax - umin)"),
    ).otherwise(F.lit(0))
    qt = F.when(
        (F.col("hmax") - F.col("hmin")) > 0,
        F.expr(f"((hr - hmin) * {top}) div (hmax - hmin)"),
    ).otherwise(F.lit(0))

    # keep the bounds columns on the row: the predicate stage reads
    # them back out of the zone agg (min() of a constant), so the
    # 1-row bounds subtree is computed ONCE, not re-joined.
    staged = j.select(
        "u", "hr", "umin", "umax", "hmin", "hmax",
        qu.alias("qu"), qt.alias("qt"),
    ).withColumn("z", z_value(F.col("qu"), F.col("qt")))

    shift_1d = Z_BITS - Z_BUCKETS_LOG2          # 16-bit -> 64 buckets
    shift_z = 2 * Z_BITS - Z_BUCKETS_LOG2       # 32-bit -> 64 buckets
    tagged = staged.select(
        "u",
        "hr",
        "umin",
        "umax",
        "hmin",
        "hmax",
        F.explode(
            F.array(
                F.struct(
                    F.lit("time_sorted").alias("layout"),
                    F.shiftright(F.col("qt"), shift_1d).alias("bucket"),
                ),
                F.struct(
                    F.lit("user_sorted").alias("layout"),
                    F.shiftright(F.col("qu"), shift_1d).alias("bucket"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("z"), shift_z).alias("bucket"),
                ),
            )
        ).alias("lb"),
    ).select(
        "u", "hr", "umin", "umax", "hmin", "hmax",
        "lb.layout", "lb.bucket",
    )

    zone = tagged.groupBy("layout", "bucket").agg(
        F.min("u").alias("bu_lo"), F.max("u").alias("bu_hi"),
        F.min("hr").alias("bh_lo"), F.max("hr").alias("bh_hi"),
        F.count("*").alias("n_rows"),
        # constants within every group — min() just re-surfaces them
        F.min("umin").alias("umin"), F.min("umax").alias("umax"),
        F.min("hmin").alias("hmin"), F.min("hmax").alias("hmax"),
    )

    # Audit predicates: fixed percent bands of each dimension's span.
    zb = zone
    u_lo = F.expr(f"umin + ((umax - umin) * {USER_BAND[0]}) div 100")
    u_hi = F.expr(f"umin + ((umax - umin) * {USER_BAND[1]}) div 100")
    h_lo = F.expr(f"hmin + ((hmax - hmin) * {HOUR_BAND[0]}) div 100")
    h_hi = F.expr(f"hmin + ((hmax - hmin) * {HOUR_BAND[1]}) div 100")
    hit_u = (F.col("bu_lo") <= u_hi) & (F.col("bu_hi") >= u_lo)
    hit_h = (F.col("bh_lo") <= h_hi) & (F.col("bh_hi") >= h_lo)

    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    return (
        zb.select(
            "layout",
            "n_rows",
            F.when(hit_u, one).otherwise(zero).alias("su"),
            F.when(hit_h, one).otherwise(zero).alias("sh"),
            F.when(hit_u & hit_h, one).otherwise(zero).alias("sb"),
        )
        .groupBy("layout")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum("su").cast("bigint").alias("scanned_user"),
            F.sum("sh").cast("bigint").alias("scanned_hour"),
            F.sum("sb").cast("bigint").alias("scanned_both"),
            F.sum(
                F.when(F.col("sb") == 1, F.col("n_rows")).otherwise(0)
            ).cast("bigint").alias("rows_both"),
        )
    )
