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


def test_duplicate_media_offsets_first_wins(spark):
    """Two media spans sharing an offset must not raise under the
    default mapKeyDedupPolicy=EXCEPTION (the documents schema does not
    enforce offset uniqueness): the map keeps the FIRST ref per offset
    and every span at that offset receives its text."""
    spans = [
        ("text", "intro words here", "", 0),
        ("image", "", "m-dup-a", 1),
        ("image", "", "m-dup-b", 1),  # same offset, different ref
        ("text", "closing words here", "", 2),
    ]
    df = _df(spark, [("dup1", spans, "", None)])
    out = extract_documents(df, query_col="query").collect()[0]
    media_texts = [
        s["text"] for s in out["out_spans"] if s["kind"] == "image"
    ]
    assert len(media_texts) == 2
    # first-wins: both spans at offset 1 carry ref m-dup-a's transcript
    assert all("m-dup-a" in t for t in media_texts)
    assert out["pages"] == 4
    # jvm variant behaves identically
    out2 = extract_documents(df, query_col="query", ocr_impl="jvm").collect()[0]
    assert [s["text"] for s in out2["out_spans"]] == [
        s["text"] for s in out["out_spans"]
    ]

def test_mega_media_chunk_parity(spark):
    """The split-process-reassemble OCR path (mega_media_chunk) must be
    invisible in the output: a monster doc with many media spans —
    including a duplicate offset (first-wins) and a validating
    workflow — produces byte-identical rows with and without it, and
    small docs below the threshold are untouched."""
    mega_spans = []
    for i in range(97):
        if i % 3 == 0:
            mega_spans.append(("image", "", f"m-big-{i}", i))
        else:
            mega_spans.append(("text", f"body text number {i} with words", "", i))
    # duplicate offset vs the image span already at offset 0 —
    # exercises first-wins dedup ahead of the chunk split
    mega_spans.append(("image", "", "m-dup-late", 0))
    rows = [
        ("mega1", mega_spans, "extract data", None),          # validates (mistral)
        ("mega2", mega_spans[:60], "plain text only", None),  # text_extraction: never validates
        ("small", [("image", "", "m-sm-0", 0), ("text", "tiny body", "", 1)], "extract data", None),
        ("empty", [], "extract data", None),
    ]
    df = _df(spark, rows)
    cols = ["doc_id", "content", "used_secondary", "similarity", "reason", "pages", "provider"]
    base = {r["doc_id"]: r for r in extract_documents(df, query_col="query").select(*cols).collect()}
    split = {r["doc_id"]: r for r in extract_documents(
        df, query_col="query", mega_media_chunk=8
    ).select(*cols).collect()}
    assert base.keys() == split.keys()
    for k in base:
        assert base[k] == split[k], k
