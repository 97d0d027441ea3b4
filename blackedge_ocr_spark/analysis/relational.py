"""Classic relational analytics over the TPC-H-shaped tables —
the scan → broadcast-dim join → shuffle-agg discipline, stated on
the queries every warehouse engine is judged by (Q1 pricing
summary, Q3 shipping priority, Q5 local-supplier volume).

Cross-engine exactness for money math: every per-row metric is
quantized ONCE to integer units (cents, or 1e-4 units for
discounted products) with ``floor(x · scale + 0.5)`` — the house
HALF_UP op — and only the resulting int64s are summed. The per-row
double products are identical IEEE op sequences in both engines
(inputs are the same stored doubles), so the quantized longs match
row-for-row and the sums are exact and order-free. No double is
ever summed.

Scale shapes:
- Q1: pure scan + hash agg on a 4-value group key — map-side
  combine makes the shuffle O(groups), the canonical fact-table
  rollup.
- Q3: dims filter first; customer joins orders on custkey, the
  result joins lineitem on orderkey (the big join keys on the fact
  table's natural key); TakeOrdered(10) replaces a global sort.
- Q5: region → nation → supplier/customer are all broadcast-sized
  dims here and hinted broadcast; the only real shuffles key the
  two fact joins. At 100 TB customer stops being broadcastable —
  AQE picks SMJ for it while the nation/region hints still hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Q1_CUTOFF = "2000-09-02"     # l_shipdate upper bound (data to 2001-11)
Q3_DATE = "1998-06-01"       # orders before / ships after this date
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1997-01-01"


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _cents(col) -> Column:
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def _e4(col) -> Column:
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)).cast("long")


def _disc_price(price, disc) -> Column:
    return price * (F.lit(1.0) - disc)


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 class): per (returnflag,
    linestatus) over shipped-by-cutoff lineitems — quantities, base
    price in cents, discounted price and charge in 1e-4 units, row
    count. Averages are the ratios of these exact sums (left to the
    reader; emitting them would reintroduce float division)."""
    l = spark.read.parquet(_t(sf_dir, "lineitem"))
    price, disc, tax = (
        F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    )
    dp = _disc_price(price, disc)
    return (
        l.filter(
            F.col("l_shipdate") <= F.to_timestamp(F.lit(Q1_CUTOFF))
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(price)).alias("sum_base_cents"),
            F.sum(_e4(dp)).alias("sum_disc_e4"),
            F.sum(_e4(dp * (F.lit(1.0) + tax))).alias("sum_charge_e4"),
            F.count("*").alias("n_rows"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Shipping-priority top-k (TPC-H Q3 class): revenue of
    not-yet-shipped lineitems of BUILDING-segment orders placed
    before the date, top-k by revenue with a full deterministic
    order (revenue desc, orderdate, orderkey) so the limit is
    well-defined in both engines."""
    c = spark.read.parquet(_t(sf_dir, "customer")).filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    o = spark.read.parquet(_t(sf_dir, "orders")).filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit(Q3_DATE))
    )
    l = spark.read.parquet(_t(sf_dir, "lineitem")).filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit(Q3_DATE))
    )
    rev = _e4(_disc_price(F.col("l_extendedprice"), F.col("l_discount")))
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    agg = joined.groupBy(
        "l_orderkey", "o_orderdate", "o_orderpriority"
    ).agg(F.sum(rev).alias("revenue_e4"))
    return (
        agg.orderBy(
            F.col("revenue_e4").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(k)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_e4",
        )
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 class): revenue per nation of
    the chosen region for orders in the window, counting only
    lineitems whose supplier shares the customer's nation. The dim
    chain region→nation (and here supplier/customer) is broadcast;
    the fact joins shuffle on custkey/orderkey."""
    r = spark.read.parquet(_t(sf_dir, "region")).filter(
        F.col("r_name") == Q5_REGION
    )
    n = spark.read.parquet(_t(sf_dir, "nation"))
    c = spark.read.parquet(_t(sf_dir, "customer"))
    s = spark.read.parquet(_t(sf_dir, "supplier"))
    o = spark.read.parquet(_t(sf_dir, "orders")).filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(Q5_FROM)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(Q5_TO)))
    )
    l = spark.read.parquet(_t(sf_dir, "lineitem"))
    rev = _e4(_disc_price(F.col("l_extendedprice"), F.col("l_discount")))
    nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    joined = (
        c.join(F.broadcast(nations), c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(F.sum(rev).alias("revenue_e4"))
