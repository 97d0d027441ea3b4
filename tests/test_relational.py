"""TPC-H-class relational queries: plan-shape guarantees (broadcast
dims actually broadcast, fact-scan filters actually push down) and
value sanity. Cross-engine value parity is the driver-contract
oracle (`tpch_q1/q3/q5`)."""

from blackedge_ocr_spark import plans
from blackedge_ocr_spark.analysis import relational

SF = "/root/testdata/sf0.001"


def test_q1_filter_pushdown_and_single_shuffle(spark):
    df = relational.tpch_q1(spark, SF)
    plan = plans.formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or (
        "l_shipdate" in plan and "PushedFilters" in plan
    )
    # scan + ONE hash-agg exchange on the 4-value group key
    assert plans.count_exchanges(df) == 1


def test_q3_q5_broadcast_dims(spark):
    q3 = plans.formatted_plan(relational.tpch_q3(spark, SF))
    assert "BroadcastHashJoin" in q3
    q5 = plans.formatted_plan(relational.tpch_q5(spark, SF))
    # region→nation chain and the hinted dims broadcast; the fact
    # joins may be SMJ/broadcast per AQE, but at least the hinted
    # dim joins must not shuffle both sides
    assert q5.count("BroadcastHashJoin") >= 2


def test_values_sane(spark):
    q1 = relational.tpch_q1(spark, SF).collect()
    assert len(q1) == 6  # 3 returnflags x 2 linestatuses
    for r in q1:
        assert r["sum_charge_e4"] >= r["sum_disc_e4"] > 0
        assert r["n_rows"] > 0
    q3 = relational.tpch_q3(spark, SF).collect()
    assert len(q3) == 10
    revs = [r["revenue_e4"] for r in q3]
    assert revs == sorted(revs, reverse=True)
    q5 = relational.tpch_q5(spark, SF).collect()
    assert 1 <= len(q5) <= 25 and all(r["revenue_e4"] > 0 for r in q5)
