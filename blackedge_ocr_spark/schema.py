"""Canonical schemas for the interleaved text+media document table.

Input shape per BASELINE.json ``input_hint``:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

``offset`` is the in-document ordering key (generalizes the
reference's 1-indexed ``page_number``,
reference: src/models/workflow_models.py:24).
"""

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

# Full pipeline output row (FIXTURES.md §6). out_spans carries the
# per-row invariant target: exact (kind, text, media_ref, offset)
# sequence equality vs the oracle.
PROBLEM_STRUCT = T.StructType(
    [
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
    ]
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("workflow", T.StringType(), False),
        T.StructField("out_spans", T.ArrayType(SPAN_STRUCT), False),
        T.StructField("problems", T.ArrayType(PROBLEM_STRUCT), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("used_secondary", T.BooleanType(), False),
        T.StructField("similarity", T.DoubleType(), True),
        T.StructField("reason", T.StringType(), True),
        T.StructField("pages", T.IntegerType(), False),
        T.StructField("provider", T.StringType(), False),
    ]
)
