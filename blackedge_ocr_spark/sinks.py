"""Result sinks: the reference's response shapes as columns/writes.

S9 (JSON response, reference: src/services/response_builder.py:27-71)
becomes a ``to_json(struct(...))`` column — one JSON document per row,
writable to any sink. S10 (ZIP with per-page files,
response_builder.py:73-138) has no file-per-page analog at table
scale; its information content (full content + per-section texts +
metadata + validation report) is preserved as typed columns in the
same row. S11 (error response) is the nullable ``error`` column
convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_response(result: DataFrame) -> DataFrame:
    """RESULT_SCHEMA rows → (doc_id, response:string JSON) matching the
    reference's {status, content, metadata, validation_report,
    sections} shape."""
    metadata = F.struct(
        F.col("workflow"),
        F.col("provider"),
        F.col("pages"),
        F.col("used_secondary"),
    )
    validation_report = F.when(
        F.col("used_secondary") | F.col("similarity").isNotNull(),
        F.struct(
            F.col("used_secondary"),
            F.col("similarity"),
            F.col("reason"),
            F.transform(
                F.col("problems"),
                lambda p: F.struct(p["offset"].alias("page"),
                                   p["labels"].alias("problems")),
            ).alias("problem_pages"),
        ),
    )
    sections = F.transform(
        F.col("out_spans"),
        lambda s: F.struct(
            (s["offset"] + 1).alias("page_number"),  # reference is 1-indexed
            s["text"].alias("content"),
            s["kind"].alias("kind"),
        ),
    )
    response = F.to_json(
        F.struct(
            F.lit("success").alias("status"),
            F.col("content"),
            metadata.alias("metadata"),
            validation_report.alias("validation_report"),
            sections.alias("sections"),
        )
    )
    return result.select("doc_id", response.alias("response"))


def write_results(result: DataFrame, path: str, partition_col: str | None = None) -> None:
    """Parquet sink (Iceberg stand-in) — partitioned when asked."""
    w = result.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path)
