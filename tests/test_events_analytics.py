"""Funnel / cohort-retention semantics pinned on hand-built event
sets (the oracle proves cross-engine parity; these prove the
semantics are the INTENDED ones)."""

import datetime as dt

import pyspark.sql.functions as F

from blackedge_ocr_spark import queries as q


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h, m, s, us), u, t, 1.0, "{}")
            for i, (u, t, d, h, m, s, us) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _funnel_on(spark, tmp_path, rows):
    path = str(tmp_path / "ev")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    out = {
        r["step"]: (r["n_users"], r["total_wait_us"])
        for r in q.q_event_funnel(spark, path).collect()
    }
    return out


def test_funnel_first_touch_and_window_semantics(spark, tmp_path):
    """User 1 converts fully (1 h waits). User 2's purchase lands
    outside the 72 h window anchored at its FIRST view — even though
    a later view would open a window containing it (first-touch
    semantics, documented). User 3 has click BEFORE view: strictly-
    after ordering rejects it at step 2."""
    rows = [
        # user 1: view 10:00, click 11:00, purchase 12:00 on day 1
        (1, "view", 1, 10, 0, 0, 0),
        (1, "click", 1, 11, 0, 0, 0),
        (1, "purchase", 1, 12, 0, 0, 0),
        # user 2: first view day 1; click day 2; second view day 5;
        # purchase day 6 (123 h after FIRST view > 72 h window)
        (2, "view", 1, 10, 0, 0, 0),
        (2, "click", 2, 10, 0, 0, 0),
        (2, "view", 5, 10, 0, 0, 0),
        (2, "purchase", 6, 13, 0, 0, 0),
        # user 3: click precedes its only view
        (3, "click", 1, 9, 0, 0, 0),
        (3, "view", 1, 10, 0, 0, 0),
    ]
    out = _funnel_on(spark, tmp_path, rows)
    assert out[1] == (3, 0)
    # step 2: users 1 and 2 (user 3's click is before its view);
    # waits: user 1 = 1 h, user 2 = 24 h (day-2 click vs day-1 anchor)
    assert out[2] == (2, (24 * 3600 + 3600) * 1_000_000)
    # step 3: user 1 only (2 h from anchor); user 2 outside window
    assert out[3] == (1, 2 * 3600 * 1_000_000)


def test_funnel_microsecond_window_edge(spark, tmp_path):
    """The window bound is inclusive at exactly +72 h and exact to
    the microsecond: an event 1 us past the bound drops."""
    w_h = q.FUNNEL_WINDOW_HOURS
    rows = [
        (1, "view", 1, 0, 0, 0, 0),
        (1, "click", 1 + w_h // 24, 0, 0, 0, 0),      # exactly +72 h
        (2, "view", 1, 0, 0, 0, 0),
        (2, "click", 1 + w_h // 24, 0, 0, 0, 1),      # +72 h + 1 us
    ]
    out = _funnel_on(spark, tmp_path, rows)
    assert out[2] == (1, w_h * 3600 * 1_000_000)


def test_asof_join_ties_and_missing(spark, tmp_path):
    """A view AT the purchase timestamp matches (<=); equal-ts views
    resolve to max event_id; a purchase with no prior view keeps
    NULLs; the match is strictly the LATEST prior view."""
    rows = [
        (1, "view", 1, 10, 0, 0, 0),       # id 0
        (1, "view", 1, 11, 0, 0, 0),       # id 1  <- latest prior
        (1, "purchase", 1, 12, 0, 0, 0),   # id 2
        (2, "view", 1, 9, 0, 0, 0),        # id 3 (tie, lower id)
        (2, "view", 1, 9, 0, 0, 0),        # id 4 (tie, max id wins)
        (2, "purchase", 1, 9, 0, 0, 0),    # id 5: view AT ts matches
        (3, "purchase", 1, 8, 0, 0, 0),    # id 6: no view at all
        (4, "purchase", 1, 8, 0, 0, 0),    # id 7: view only AFTER
        (4, "view", 1, 9, 0, 0, 0),        # id 8
    ]
    path = str(tmp_path / "ev")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    got = {
        r["event_id"]: (r["view_event_id"], r["lag_us"])
        for r in q.q_asof_join(spark, path).collect()
    }
    assert got == {
        2: (1, 3600 * 1_000_000),
        5: (4, 0),
        6: (None, None),
        7: (None, None),
    }


def test_range_join_band_edges_and_bucket_crossing(spark, tmp_path):
    """The 30-min band is inclusive at both edges to the microsecond
    (Δ=0 and Δ=W match, Δ=W+1 µs does not), matches cross the bucket
    boundary (the probe-two-buckets guarantee), future clicks never
    match, and zero-count errors keep their row."""
    rows = [
        # user 1: error at 01:00:00; clicks at Δ=0, Δ=W (00:30:00),
        # Δ=W+1µs (just outside), and one future click
        (1, "error", 1, 1, 0, 0, 0),
        (1, "click", 1, 1, 0, 0, 0),        # Δ = 0
        (1, "click", 1, 0, 30, 0, 0),       # Δ = W exactly
        (1, "click", 1, 0, 29, 59, 999999), # Δ = W + 1 µs
        (1, "click", 1, 1, 0, 0, 1),        # future (1 µs later)
        # user 2: error whose only click sits in the PREVIOUS bucket
        # (error 00:31, click 00:25 — different div-1800s bins)
        (2, "error", 1, 0, 31, 0, 0),
        (2, "click", 1, 0, 25, 0, 0),
        # user 3: error with no clicks at all
        (3, "error", 1, 5, 0, 0, 0),
        # user 4's click must not leak into user 1's count
        (4, "click", 1, 1, 0, 0, 0),
    ]
    path = str(tmp_path / "ev")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    got = {
        r["event_id"]: r["n_prior_clicks"]
        for r in q.q_range_join(spark, path).collect()
    }
    assert got == {0: 2, 5: 1, 7: 0}


def test_native_session_window_boundary_matches_manual(spark, tmp_path):
    """Spark's session_window merge condition is inclusive
    (next − last ≤ gap), exactly like the manual lag rule — an
    event exactly 1800 s after the last one merges in both; one
    1 µs later splits in both. This pins the boundary so the shared
    oracle pass is structural, not luck of the corpus."""
    rows = [
        (1, "click", 1, 0, 0, 0, 0),
        (1, "click", 1, 0, 30, 0, 0),        # exactly +1800 s
        (2, "click", 1, 0, 0, 0, 0),
        (2, "click", 1, 0, 30, 0, 1),        # +1800 s + 1 µs
    ]
    path = str(tmp_path / "ev")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    manual = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in q.q_user_sessions(spark, path).collect()
    )
    native = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in q.q_user_sessions_native(spark, path).collect()
    )
    assert manual == native
    by_user = {}
    for u, _, n in manual:
        by_user.setdefault(u, []).append(n)
    assert by_user == {1: [2], 2: [1, 1]}


def test_hypertable_rollup_conserves_mass_across_levels(spark):
    """Each level partitions the same events: per-level n_events and
    sum_k totals must be identical (the conservation the
    rollup-of-rollup reuse must not break), and granularity strictly
    coarsens."""
    rows = q.q_hypertable_rollup(spark, "/root/testdata/sf0.001").collect()
    tot = {}
    nb = {}
    for r in rows:
        n, k = tot.get(r["level"], (0, 0))
        tot[r["level"]] = (n + r["n_events"], k + (r["sum_k"] or 0))
        nb[r["level"]] = nb.get(r["level"], 0) + 1
    assert tot["hour"] == tot["day"] == tot["week"]
    assert nb["hour"] > nb["day"] > nb["week"]


def test_analytics_plan_shapes(spark):
    """Shuffle budgets of the event-analytics family, pinned:
    transitions/asof/range = 2 exchanges (one staging key shuffle +
    one combinable agg), hypertable = 1 runtime exchange with the
    two finer levels folded into cache builds (a regression that
    re-scans raw events per level shows up here as 6)."""
    from blackedge_ocr_spark import plans

    sf = "/root/testdata/sf0.001"
    assert plans.count_exchanges(q.q_event_transitions(spark, sf)) == 2
    assert plans.count_exchanges(q.q_asof_join(spark, sf)) == 2
    assert plans.count_exchanges(q.q_range_join(spark, sf)) == 2
    hyper = q.q_hypertable_rollup(spark, sf)
    assert plans.count_exchanges(hyper) == 1
    assert plans.count_cache_build_exchanges(hyper) == 2


def test_cohort_retention_buckets(spark, tmp_path):
    """Signup fixes the cohort; activity counts once per distinct
    user per week offset; pre-signup activity is excluded."""
    rows = [
        (1, "signup", 1, 0, 0, 0, 0),    # week W
        (1, "view", 1, 5, 0, 0, 0),      # offset 0
        (1, "view", 9, 0, 0, 0, 0),      # offset 1 (8+ days later)
        (1, "click", 9, 1, 0, 0, 0),     # same week, same user
        (2, "view", 1, 0, 0, 0, 0),      # activity but NO signup
        (3, "view", 1, 0, 0, 0, 0),      # pre-signup activity
        (3, "signup", 9, 0, 0, 0, 0),    # week W+1
    ]
    path = str(tmp_path / "ev")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    rowso = q.q_cohort_retention(spark, path).collect()
    got = {
        (r["cohort_week"] , r["week_offset"]): r["n_active"] for r in rowso
    }
    weeks = sorted({cw for cw, _ in got})
    w0 = weeks[0]
    # user 1: offsets 0 and 1 in cohort w0; user 3: offset 0 in its
    # own cohort (signup week), pre-signup view excluded; user 2 absent
    assert got[(w0, 0)] == 1
    assert got[(w0, 1)] == 1
    assert sum(n for (cw, _), n in got.items() if cw != w0) == 1
    assert all(off >= 0 for _, off in got)


def _concurrency_on(spark, tmp_path, rows):
    path = str(tmp_path / "pc")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    return {
        r["day"]: (
            r["peak_concurrent"],
            r["sessions_started"],
            r["sessions_ended"],
            r["active_at_eod"],
        )
        for r in q.q_peak_concurrency(spark, path).collect()
    }


def test_peak_concurrency_inclusive_ends_and_carry(spark, tmp_path):
    """Three pinned behaviors: (1) INCLUSIVE interval ends — user 1's
    session ends at the exact µs user 2's starts, and both count at
    that instant (peak 2, not 1); (2) a session spanning midnight
    carries into the next day (day-2 peak counts it even though it
    started on day 1); (3) active_at_eod is the cross-day running
    net (1 after day 1, 0 after day 2)."""
    rows = [
        # user 1: one session 10:00:00 .. 10:10:00 on Jan 1
        (1, "a", 1, 10, 0, 0, 0),
        (1, "a", 1, 10, 10, 0, 0),
        # user 2: starts at EXACTLY user 1's end instant
        (2, "a", 1, 10, 10, 0, 0),
        (2, "a", 1, 10, 20, 0, 0),
        # user 3: session spanning midnight Jan 1 -> Jan 2
        (3, "a", 1, 23, 50, 0, 0),
        (3, "a", 2, 0, 10, 0, 0),
        # user 4: Jan 2 session overlapping user 3's tail
        (4, "a", 2, 0, 5, 0, 0),
        (4, "a", 2, 0, 15, 0, 0),
    ]
    out = _concurrency_on(spark, tmp_path, rows)
    assert out["2024-01-01"] == (2, 3, 2, 1)
    assert out["2024-01-02"] == (2, 1, 2, 0)


def test_peak_concurrency_gap_splits_sessions(spark, tmp_path):
    """Two events >30 min apart are separate sessions — concurrency
    never exceeds 1 and both start/end on the same day."""
    rows = [
        (1, "a", 1, 9, 0, 0, 0),
        (1, "a", 1, 11, 0, 0, 0),
    ]
    out = _concurrency_on(spark, tmp_path, rows)
    assert out["2024-01-01"] == (1, 2, 2, 0)


def test_gapfill_locf_semantics(spark, tmp_path):
    """Crafted series: type 'a' observes hours 10 and 13 (value 1.5
    then 2.5) — hours 11/12 must exist, carry 1.5, and be flagged
    filled; type 'b' has no gaps and no filled rows."""
    rows = [
        (1, "a", 1, 10, 0, 0, 0),
        (2, "a", 1, 13, 0, 0, 0),
        (3, "b", 1, 5, 0, 0, 0),
        (4, "b", 1, 6, 0, 0, 0),
    ]
    path = str(tmp_path / "gf")
    df = _events(spark, rows)
    # distinct values so the carried total is attributable
    df = df.withColumn(
        "value",
        F.when(F.col("event_id") == 0, 1.5)
        .when(F.col("event_id") == 1, 2.5)
        .otherwise(1.0),
    )
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    out = {
        (r["event_type"], r["hour"]): (
            r["n_events"],
            r["total_value_locf"],
            r["gap_filled"],
        )
        for r in q.q_gapfill(spark, path).collect()
    }
    assert len(out) == 6  # a: 10..13 (4 slots), b: 5..6 (2 slots)
    assert out[("a", "2024-01-01 10:00:00")] == (1, 1.5, False)
    assert out[("a", "2024-01-01 11:00:00")] == (0, 1.5, True)
    assert out[("a", "2024-01-01 12:00:00")] == (0, 1.5, True)
    assert out[("a", "2024-01-01 13:00:00")] == (1, 2.5, False)
    assert out[("b", "2024-01-01 05:00:00")] == (1, 1.0, False)
    assert out[("b", "2024-01-01 06:00:00")] == (1, 1.0, False)


def test_hour_anomalies_flags_spike_not_flat(spark, tmp_path):
    """Type 'a': 23 quiet hours (1 event) + one 50-event spike —
    only the spike crosses 3 population sigmas. Type 'b' is
    perfectly flat: sigma = 0 and the rhs>0 guard flags nothing."""
    rows = []
    eid = 0
    for h in range(23):
        rows.append((1, "a", 1, h, 0, 0, eid)); eid += 1
    for i in range(50):
        rows.append((1, "a", 1, 23, i, 0, eid)); eid += 1
    for h in range(4):
        rows.append((2, "b", 1, h, 0, 0, eid)); eid += 1
    path = str(tmp_path / "an")
    _events(spark, [(u, t, d, h, m, s, us) for (u, t, d, h, m, s, us) in rows]).write.mode(
        "overwrite"
    ).parquet(path + "/events.parquet")
    out = {
        (r["event_type"], r["hour"]): (r["n_events"], r["is_anomaly"])
        for r in q.q_hour_anomalies(spark, path).collect()
    }
    flagged = {k for k, v in out.items() if v[1]}
    assert flagged == {("a", "2024-01-01 23:00:00")}
    assert out[("a", "2024-01-01 23:00:00")][0] == 50
    assert all(not v[1] for k, v in out.items() if k[0] == "b")


def test_value_ranks_prune_is_partition_invariant(spark, tmp_path):
    """The partition-local top-K prune must be invisible in the
    output: the same corpus stored as 1 file and as 7 shuffled
    files yields identical rows, and both equal the naive
    full-window computation."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    src.coalesce(1).write.parquet(one + "/events.parquet")
    # scramble rows across 7 files so partition-local ranks differ
    src.repartition(7, F.col("event_id") % 7).write.parquet(
        many + "/events.parquet"
    )

    def rows(sf):
        return sorted(
            tuple(r) for r in q.q_value_ranks(spark, sf).collect()
        )

    got_one, got_many = rows(one), rows(many)
    assert got_one == got_many

    # naive spec: full per-type window, no prune
    w = Window.partitionBy("event_type").orderBy("value")
    naive = (
        src.select(
            "event_type", "event_id", "value",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .filter(F.col("rnk") <= 40)
        .select(
            "event_type",
            F.col("event_id").cast("bigint"),
            F.round("value", 3),
            F.col("rnk").cast("bigint"),
            F.col("drnk").cast("bigint"),
            "prnk",
            "cdist",
        )
    )
    want = sorted(tuple(r) for r in naive.collect())
    assert got_one == want


def test_peak_concurrency_fills_boundaryless_days(spark, tmp_path):
    """A session spanning Jan 1 -> Jan 3 (continuous sub-30-min
    events) puts boundary points only on its start and end days;
    Jan 2 must still appear, with peak = the carried concurrency."""
    rows = []
    eid = 0
    # user 1: one long session, events every 20 min for 48 h
    import datetime as dt
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    while t < dt.datetime(2024, 1, 3, 12, 0, 0):
        rows.append((1, "a", t.day, t.hour, t.minute, 0, eid))
        eid += 1
        t += dt.timedelta(minutes=20)
    out = _concurrency_on(spark, tmp_path, rows)
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    assert out["2024-01-01"] == (1, 1, 0, 1)
    assert out["2024-01-02"] == (1, 0, 0, 1)  # the hole day
    assert out["2024-01-03"] == (1, 0, 1, 0)
