"""Edge-row behavior: empty spans, invalid explicit workflow,
single-span docs, mega-doc ordering."""

import pyspark.sql.functions as F

from blackedge_ocr_spark.pipeline import extract_documents
from blackedge_ocr_spark.schema import DOCUMENTS_SCHEMA


def _df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        list(DOCUMENTS_SCHEMA.fields)
        + [
            T.StructField("query", T.StringType(), True),
            T.StructField("explicit_workflow", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_empty_spans_yield_empty_content(spark):
    df = _df(spark, [("e1", [], "", None)])
    out = extract_documents(df, query_col="query").collect()[0]
    assert out["content"] == ""
    assert out["pages"] == 0
    assert out["out_spans"] == []
    # empty content trips D1/D4 → problems empty (no spans to tag)
    assert out["problems"] == []


def test_invalid_explicit_workflow_is_error_row(spark):
    df = _df(
        spark,
        [("x1", [("text", "hello world, plenty of text here", "", 0)],
          "", "not_a_workflow")],
    )
    out = extract_documents(
        df, query_col="query", explicit_col="explicit_workflow"
    ).collect()[0]
    # dataflow analog of the reference ValueError: NULL workflow/provider
    assert out["workflow"] is None
    assert out["provider"] is None


def test_mega_doc_order_preserved(spark):
    spans = [("text", f"span {i}", "", i) for i in range(500)][::-1]
    df = _df(spark, [("m1", spans, "", None)])
    out = extract_documents(df, query_col="query").collect()[0]
    offs = [s["offset"] for s in out["out_spans"]]
    assert offs == list(range(500))
    assert out["content"].startswith("span 0\n---PAGE-BREAK---\nspan 1")


def test_single_media_span_doc(spark):
    df = _df(spark, [("s1", [("image", "", "m-s1-0", 0)], "", None)])
    out = extract_documents(df, query_col="query").collect()[0]
    assert out["out_spans"][0]["text"].startswith("Extracted by mistral")
    assert out["pages"] == 1
