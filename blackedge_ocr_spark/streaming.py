"""Structured Streaming front-end for the extraction pipeline.

The reference has no streaming surface (SURVEY §2.13) and the north
rule's resumability is satisfied by partition checkpoints
(lineage.py); this module exists because the same span schema should
also serve continuous ingest: new document files landing in a
directory are picked up incrementally and flow through the *same*
``extract_documents`` plan via ``foreachBatch`` — one codepath for
batch and streaming, which is the idiomatic Spark way to add a stream
head to a batch engine.

Checkpointing: Spark's streaming checkpoint (source offsets) plus the
engine's own lineage manifest on the sink side — restarting resumes
from the last committed micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RAW_DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watch ``input_dir`` for document parquet files, run the
    spansify + extract pipeline per micro-batch, append results as
    parquet. Returns the StreamingQuery (await with .awaitTermination).
    """
    from pyspark.sql import functions as F

    from blackedge_ocr_spark.datagen import spansify_documents
    from blackedge_ocr_spark.pipeline import extract_documents

    raw = (
        spark.readStream.schema(RAW_DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Reuse the batch spansify logic on this micro-batch: write-
        # free conversion (spansify reads a path, so inline its span
        # construction via a temp view round-trip is avoided by just
        # re-deriving from the columns).
        spans = _spansify_batch(batch_df)
        result = extract_documents(spans, query_col="query")
        (
            result.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _spansify_batch(docs: DataFrame) -> DataFrame:
    """Columnar spansify over an in-memory micro-batch — the SAME
    span-construction plan as the batch reader (datagen.spansify_frame:
    mega-doc stratum, scrambled storage, 7-way query template cycle),
    so a corpus streamed file-by-file produces byte-identical spans to
    the batch path."""
    from blackedge_ocr_spark.datagen import spansify_frame

    return spansify_frame(docs)


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start string, n_events bigint, total_value double"
)
SESSION_STATE_SCHEMA = "start double, last double, n bigint, total double"


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_sec: int = 1800,
    watermark: str = "10 minutes",
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    gap-based user sessionization. A session closes either when a later
    event of the same user arrives past the gap (emitted in-batch) or
    when the event-time watermark passes last_event + gap (emitted by
    state timeout) — so the sink receives exactly the CLOSED sessions,
    each once, and state is bounded by |active users|.

    The batch twin is ``queries.q_user_sessions`` (lag → running-sum
    session id → agg); closed sessions agree between the two (pytest
    parity). Late events below the watermark are dropped by the
    stateful operator, mirroring the rollup's semantics.
    """
    import datetime

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _fmt(epoch_us: float) -> str:
        return datetime.datetime.fromtimestamp(
            epoch_us / 1e6, tz=datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")

    def _r3(x: float) -> float:
        # Spark's round(col, 3) = HALF_UP over the exact decimal
        # expansion of the double; Python's built-in round is
        # banker's. Mirror Spark so the twins agree on .5 ties.
        import decimal

        return float(
            decimal.Decimal(x).quantize(
                decimal.Decimal("0.001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def sessionize(key, pdf_iter, state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            closed.append((user_id, _fmt(start), int(n), _r3(float(total))))
            state.remove()
        else:
            rows = pd.concat(list(pdf_iter), ignore_index=True)
            rows = rows.sort_values(["ts", "event_id"])
            if state.exists:
                start, last, n, total = state.get
            else:
                start = last = None
                n, total = 0, 0.0
            # Integer microseconds (pandas ts.value is ns) — exact gap
            # comparison, same integer semantics as the batch twin's
            # unix_micros and the oracle's epoch_us. State holds the
            # micros in doubles: exact up to 2^53 us (~year 287396).
            gap_us = gap_sec * 1_000_000
            for ts, v in zip(rows["ts"], rows["value"]):
                t = ts.value // 1000
                if start is None:
                    start, last, n, total = t, t, 1, float(v)
                elif t - last > gap_us:
                    # round to 3 decimals on close — the batch twin's
                    # contract (q_user_sessions: round(sum(value), 3))
                    closed.append((user_id, _fmt(start), int(n), _r3(float(total))))
                    start, last, n, total = t, t, 1, float(v)
                else:
                    last, n, total = t, n + 1, total + float(v)
            state.update((float(start), float(last), int(n), float(total)))
            # timeout is in epoch MILLIseconds
            state.setTimeoutTimestamp(int(last + gap_us) // 1000)
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "n_events", "total_value"],
        )

    sessions = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_rollup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int = 2,
):
    """Watermarked hour-window event aggregation as a stream: late
    events inside the watermark fold into their window; windows emit
    (append mode) only once the watermark passes their end, so the
    sink sees each window exactly once. State is bounded by
    (watermark / window) x |event_type| — the Structured Streaming
    shape for the engine's metrics rollups."""
    from pyspark.sql import functions as F

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
