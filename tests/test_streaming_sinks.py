"""Streaming front-end + JSON sink tests."""

import json
import shutil

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_stream_extract_available_now(spark, tmp_path):
    from blackedge_ocr_spark.streaming import stream_extract

    inp = tmp_path / "in"
    inp.mkdir()
    shutil.copy(f"{SF}/documents.parquet", inp / "batch0.parquet")

    q = stream_extract(
        spark,
        str(inp),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 500
    assert out.select("doc_id").distinct().count() == 500

    # restart with no new files: checkpoint prevents reprocessing
    q2 = stream_extract(
        spark, str(inp), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 500


def test_json_response_shape(spark):
    from blackedge_ocr_spark.datagen import spansify_documents
    from blackedge_ocr_spark.pipeline import extract_documents
    from blackedge_ocr_spark.sinks import json_response

    result = extract_documents(
        spansify_documents(spark, SF), query_col="query"
    )
    rows = json_response(result).limit(20).collect()
    for r in rows:
        doc = json.loads(r["response"])
        assert doc["status"] == "success"
        assert isinstance(doc["content"], str)
        assert doc["metadata"]["pages"] >= 1
        assert all(s["page_number"] >= 1 for s in doc["sections"])


def test_stream_event_rollup_watermarked(spark, tmp_path):
    """Windows fully below the final watermark emit exactly once and
    match the batch aggregation; the not-yet-final tail is withheld."""
    from blackedge_ocr_spark.streaming import stream_event_rollup

    inp = tmp_path / "ev"
    inp.mkdir()
    shutil.copy(f"{SF}/events.parquet", inp / "e0.parquet")

    q = stream_event_rollup(
        spark, str(inp), str(tmp_path / "evout"), str(tmp_path / "evckpt")
    )
    q.awaitTermination(300)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(str(tmp_path / "evout")).collect()
    }
    assert got, "no finalized windows emitted"

    batch = spark.read.parquet(f"{SF}/events.parquet")
    exp = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.groupBy(
            F.date_format(F.window("ts", "1 hour")["start"],
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 3).alias("total_value"))
        .collect()
    }
    for key, vals in got.items():
        assert exp[key] == vals, key
    # withheld tail = windows newer than (max ts - watermark)
    assert len(got) < len(exp)
