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
    # Straddle doc: an equal-offset media run sits EXACTLY on the
    # chunk=8 boundary (positions 7 and 8 share offset 7) — the
    # chunked path must still give the run's second span the FIRST
    # ref's OCR text (run-safe chunk ids), byte-matching the base
    # path's global first-wins fill.
    straddle_spans = [
        ("text", f"lead text value {i} here", "", i) for i in range(7)
    ] + [
        ("image", "", "m-straddle-first", 7),
        ("image", "", "m-straddle-second", 7),
    ] + [
        ("text", f"tail text value {i} and more", "", i) for i in range(8, 20)
    ]
    rows = [
        ("mega1", mega_spans, "extract data", None),          # validates (mistral)
        ("mega2", mega_spans[:60], "plain text only", None),  # text_extraction: never validates
        ("straddle", straddle_spans, "extract data", None),
        ("small", [("image", "", "m-sm-0", 0), ("text", "tiny body", "", 1)], "extract data", None),
        ("empty", [], "extract data", None),
    ]
    df = _df(spark, rows)
    cols = ["doc_id", "out_spans", "problems", "content", "used_secondary",
            "similarity", "reason", "pages", "provider"]
    base = {r["doc_id"]: r for r in extract_documents(df, query_col="query").select(*cols).collect()}
    split = {r["doc_id"]: r for r in extract_documents(
        df, query_col="query", mega_media_chunk=8
    ).select(*cols).collect()}
    assert base.keys() == split.keys()
    for k in base:
        assert base[k] == split[k], k
    # the straddle run really did take the first ref's text on BOTH spans
    st = split["straddle"]["out_spans"]
    run = [s for s in st if s["offset"] == 7]
    assert len(run) == 2 and run[0]["text"] == run[1]["text"]
    assert "m-straddle-first" in run[0]["text"]


def test_duplicate_offset_media_oracle_parity(spark):
    """Engine and Python oracle agree on duplicate-offset media:
    BOTH spans of the run carry the FIRST ref's OCR text."""
    from blackedge_ocr_spark import oracle

    spans = [
        ("image", "", "refA", 1),
        ("image", "", "refB", 1),
        ("text", "plenty of ordinary text in this span here", "", 0),
    ]
    df = _df(spark, [("d1", spans, "", None)])
    out = extract_documents(df, query_col="query").collect()[0]
    want = oracle.expected_result("d1", spans, "")
    got_spans = [tuple(s) for s in out["out_spans"]]
    assert got_spans == want["out_spans"]
    assert out["content"] == want["content"]
    # and the two duplicate-offset spans really share refA's text
    media_texts = {s[1] for s in got_spans if s[0] == "image"}
    assert len(media_texts) == 1 and "refA" in next(iter(media_texts))


def test_invalid_explicit_oracle_parity(spark):
    """oracle.expected_result must express the NULL-workflow error
    row instead of raising KeyError, matching the engine."""
    from blackedge_ocr_spark import oracle

    spans = [("image", "", "refZ", 0),
             ("text", "hello world, plenty of text here", "", 1)]
    df = _df(spark, [("x1", spans, "", "not_a_workflow")])
    out = extract_documents(
        df, query_col="query", explicit_col="explicit_workflow"
    ).collect()[0]
    want = oracle.expected_result("x1", spans, "", explicit="not_a_workflow")
    assert want["workflow"] is None and want["provider"] is None
    assert out["workflow"] is None and out["provider"] is None
    assert [tuple(s) for s in out["out_spans"]] == want["out_spans"]
    assert out["content"] == want["content"]


def test_control_separator_whitespace_parity(spark):
    """U+001C-001F: Python \\s (the reference) treats them as
    whitespace; the engine's extended _WS/_EDGE_WS classes must too."""
    from blackedge_ocr_spark import oracle
    from blackedge_ocr_spark.functions.text import normalize_text

    texts = ["\x1cpadded\x1f", "a\x1d\x1eb", "\x1c\x1d\x1e\x1f", "x" * 99 + "\x1c"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, t string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text("t").alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == oracle.normalize_text(t), repr(t)


def test_mega_chunk_parity_other_sim_methods(spark):
    """Non-default similarity methods on a mega doc take the in-row
    path over the chunk-MERGED contents — must still byte-match the
    unchunked pipeline."""
    spans = []
    for i in range(40):
        if i % 4 == 0:
            spans.append(("image", "", f"m-os-{i}", i))
        else:
            spans.append(("text", f"steady prose segment {i} with words", "", i))
    df = _df(spark, [("m1", spans, "extract data", None)])
    cols = ["doc_id", "content", "similarity", "used_secondary", "reason"]
    for method in ("word_overlap", "cosine", "levenshtein"):
        base = extract_documents(
            df, query_col="query", similarity_method=method
        ).select(*cols).collect()[0]
        split = extract_documents(
            df, query_col="query", similarity_method=method,
            mega_media_chunk=8,
        ).select(*cols).collect()[0]
        assert base == split, method
