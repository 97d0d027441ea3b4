"""Streaming first-touch funnel: buffer-until-watermark finality,
strict step ordering, and the anchor-replacement case a
process-on-arrival design gets wrong."""

import os
import shutil
import time as _t

import pyspark.sql.functions as F


def _write(spark, tmp_path, inp, name, rows, age_sec):
    df = (
        spark.createDataFrame(
            [
                (i, ts, uid, et, 1.0, "{}")
                for i, (uid, et, ts) in enumerate(rows)
            ],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        )
        .select(
            "event_id",
            F.to_timestamp("ts").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .coalesce(1)
    )
    stage = str(tmp_path / f"fstage_{name}")
    df.write.mode("overwrite").parquet(stage)
    part = next(
        os.path.join(r, f)
        for r, _, fs in os.walk(stage)
        for f in fs
        if f.endswith(".parquet")
    )
    dest = str(inp / name)
    shutil.copy(part, dest)
    now = _t.time()
    os.utime(dest, (now - age_sec, now - age_sec))


def test_stream_funnel_finality_ordering_and_anchor_replacement(
    spark, tmp_path
):
    """Three users, 1 h window, 10 min lateness:
    - user 1 completes the chain (waits 10 min / 50 min);
    - user 2 purchases without clicking → strict ordering stops the
      chain at step 1 even though the purchase is in-window;
    - user 3's view arrives one TRIGGER LATE but above the watermark
      → it must replace the click-only buffer as the anchor;
    - user 99's window never closes under the final watermark → no
      row (the availableNow caveat, same as stream_sessionize)."""
    from blackedge_ocr_spark.streaming import stream_funnel

    inp = tmp_path / "fev"
    inp.mkdir()
    # trigger-1 watermark lands at 00:20 (max ts 00:30 − 10 min), so
    # every trigger-2 event below sits AT or ABOVE it (not late)
    _write(
        spark, tmp_path, inp, "f1.parquet",
        [
            (1, "view", "2026-01-01 00:00:00"),
            (1, "click", "2026-01-01 00:10:00"),
            (2, "view", "2026-01-01 00:05:00"),
            (2, "purchase", "2026-01-01 00:20:00"),
            (3, "click", "2026-01-01 00:30:00"),
        ],
        age_sec=120,
    )
    _write(
        spark, tmp_path, inp, "f2.parquet",
        [
            (1, "purchase", "2026-01-01 00:50:00"),
            (3, "view", "2026-01-01 00:21:00"),
            (99, "view", "2026-01-01 06:00:00"),
        ],
        age_sec=60,
    )
    out = str(tmp_path / "fout")
    q = stream_funnel(
        spark, str(inp), out, str(tmp_path / "fck"), window_hours=1
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (
            r["anchor"], r["step_reached"], r["wait2_us"], r["wait3_us"]
        )
        for r in spark.read.parquet(out).collect()
    }
    m = 60 * 1_000_000
    assert got == {
        1: ("2026-01-01 00:00:00", 3, 10 * m, 50 * m),
        2: ("2026-01-01 00:05:00", 1, None, None),
        3: ("2026-01-01 00:21:00", 2, 9 * m, None),
    }


def test_stream_funnel_corpus_parity_with_python_model(spark, tmp_path):
    """On the real sf0.001 event corpus (single file → no late
    drops), every emitted row must equal an independent pure-Python
    greedy first-touch chain, and exactly the users whose window the
    final watermark passes must emit."""
    import duckdb

    from blackedge_ocr_spark.queries import (
        FUNNEL_STEPS,
        FUNNEL_WINDOW_HOURS,
    )
    from blackedge_ocr_spark.streaming import stream_funnel

    inp = tmp_path / "cev"
    inp.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", str(inp / "e.parquet")
    )
    out = str(tmp_path / "cout")
    q = stream_funnel(spark, str(inp), out, str(tmp_path / "cck"))
    q.awaitTermination(180)
    got = {
        r["user_id"]: (r["step_reached"], r["wait2_us"], r["wait3_us"])
        for r in spark.read.parquet(out).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, event_type, epoch_us(ts) FROM "
        f"read_parquet('{inp}/e.parquet') WHERE event_type IN "
        + str(tuple(FUNNEL_STEPS))
    ).fetchall()
    win_us = FUNNEL_WINDOW_HOURS * 3600 * 1_000_000
    wm_us = (
        con.execute(
            f"SELECT epoch_us(max(ts)) FROM read_parquet('{inp}/e.parquet')"
        ).fetchone()[0]
        - 600 * 1_000_000
    )
    by_user = {}
    for u, et, ts in rows:
        by_user.setdefault(u, []).append((ts, et))
    want = {}
    for u, evs in by_user.items():
        anchors = [t for t, et in evs if et == FUNNEL_STEPS[0]]
        if not anchors:
            continue
        t1 = min(anchors)
        if not wm_us > t1 + win_us:
            continue  # window still open under the final watermark
        t_prev, waits = t1, []
        for step in FUNNEL_STEPS[1:]:
            cands = [
                t
                for t, et in evs
                if et == step and t_prev < t <= t1 + win_us
            ]
            if not cands:
                break
            t_prev = min(cands)
            waits.append(t_prev - t1)
        want[u] = (
            1 + len(waits),
            waits[0] if len(waits) >= 1 else None,
            waits[1] if len(waits) >= 2 else None,
        )
    assert len(want) > 0
    assert got == want
