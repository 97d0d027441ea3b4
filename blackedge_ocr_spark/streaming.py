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
