"""Native stream-stream interval join vs its batch twin: the matched
(view, click) pair set must be identical, with the feed split across
triggers so pairs span micro-batch boundaries."""

import pyspark.sql.functions as F

from blackedge_ocr_spark.queries import q_view_click_pairs
from blackedge_ocr_spark.streaming import stream_interval_join

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {
        (r["user_id"], r["view_id"], r["click_id"], r["wait_us"])
        for r in df.collect()
    }


def _stage_quartered_feed(spark, tmp_path):
    """Write the sf0.001 events as 4 TIME-quartile part files inside
    one events.parquet dir (a feed arrives roughly time-ordered;
    id-striped chunks would each span the whole month and the
    watermark set by chunk 0 would mark every later chunk late — the
    join would correctly drop everything). Returns (sf_dir, stream
    source dir, the batch events frame)."""
    import shutil

    from pyspark.sql import Window

    inp = tmp_path / "in"
    ev_dir = inp / "events.parquet"
    ev_dir.mkdir(parents=True)
    e = spark.read.parquet(f"{SF}/events.parquet")
    nt = e.withColumn(
        "_q", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(4):
        tmp = tmp_path / f"chunk{i}"
        nt.filter(F.col("_q") == i + 1).drop("_q").coalesce(
            1
        ).write.parquet(str(tmp))
        part = next(
            p for p in tmp.iterdir() if p.name.endswith(".parquet")
        )
        shutil.move(str(part), str(ev_dir / f"part-{i}.parquet"))
    return str(inp), str(ev_dir), e


def test_stream_interval_join_matches_batch_twin(spark, tmp_path):
    """Events split into 4 chunk files, one per trigger on each
    side: a click can arrive triggers after its view (and on the
    OTHER stream), so parity proves the buffered-state join, not
    single-batch luck."""
    inp, ev_dir, _ = _stage_quartered_feed(spark, tmp_path)

    q = stream_interval_join(
        spark,
        ev_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)

    got = _pairs(spark.read.parquet(str(tmp_path / "out")))
    want = _pairs(q_view_click_pairs(spark, inp))
    assert got == want
    assert len(want) > 0  # the corpus must actually exercise the band

    # restart on the same checkpoint with no new files: no dup pairs
    q2 = stream_interval_join(
        spark,
        ev_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(300)
    out2 = spark.read.parquet(str(tmp_path / "out"))
    assert out2.count() == len(want)


def test_stream_interval_join_left_outer_negative_results(
    spark, tmp_path
):
    """how='left_outer': matched pairs equal the inner result, and a
    view that attracts no click emits ONCE with null click columns
    — but only after the final watermark proves no click can still
    arrive (wm > v_ts + band). Views inside the final watermark
    horizon stay withheld: asserting the exact expected set pins
    that emission rule, not just 'some nulls showed up'."""
    from blackedge_ocr_spark.queries import RANGE_WINDOW_SEC

    inp, ev_dir, e = _stage_quartered_feed(spark, tmp_path)

    q_ = stream_interval_join(
        spark,
        ev_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
        how="left_outer",
    )
    q_.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))

    matched = _pairs(out.filter(F.col("click_id").isNotNull()))
    want_pairs = _pairs(q_view_click_pairs(spark, inp))
    assert matched == want_pairs

    got_null_views = {
        r["view_id"]
        for r in out.filter(F.col("click_id").isNull()).collect()
    }
    # expectation: views with no in-band click whose horizon closed
    # before the FINAL watermark = min(side maxima) - delay
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    vmax = e.filter(F.col("event_type") == "view").agg(
        F.max(us("ts"))
    ).collect()[0][0]
    cmax = e.filter(F.col("event_type") == "click").agg(
        F.max(us("ts"))
    ).collect()[0][0]
    wm_us = min(vmax, cmax) - 3_600 * 1_000_000
    band_us = RANGE_WINDOW_SEC * 1_000_000
    matched_views = {v for (_, v, _, _) in want_pairs}
    want_null_views = {
        r["event_id"]
        for r in e.filter(F.col("event_type") == "view")
        .withColumn("_ep", us("ts"))
        .filter(F.col("_ep") + band_us < wm_us)
        .collect()
        if r["event_id"] not in matched_views
    }
    assert got_null_views == want_null_views
    assert len(want_null_views) > 0
