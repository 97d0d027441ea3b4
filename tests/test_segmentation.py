"""Segmentation stage tests: pure-function vectors + Spark wrapper."""

import pyspark.sql.functions as F

from blackedge_ocr_spark.segmentation import (
    htmlify_documents,
    segment_documents,
    segment_html,
)

SF = "/root/testdata/sf0.001"


def test_boilerplate_nav_and_footer_dropped():
    raw = (
        "<html><body>"
        '<nav><ul><li><a href="/">home</a></li></ul></nav>'
        "<p>This paragraph carries the real substance of the page.</p>"
        '<div><a href="/terms">terms</a> <a href="/privacy">privacy</a></div>'
        "</body></html>"
    )
    spans = segment_html(raw)
    assert [s[0] for s in spans] == ["text"]
    assert spans[0][1] == "This paragraph carries the real substance of the page."
    assert spans[0][3] == 0


def test_link_density_threshold():
    # 50% linked chars → dropped; mostly-plain block → kept
    dropped = '<p><a href="x">linked half here</a> tiny tail</p>'
    kept = '<p>plenty of ordinary prose around <a href="x">tiny</a> link</p>'
    assert segment_html(dropped) == []
    assert len(segment_html(kept)) == 1


def test_short_blocks_dropped_headings_kept():
    raw = "<h2>Title</h2><p>short</p><p>a block long enough to survive the cut</p>"
    spans = segment_html(raw)
    assert [(s[0], s[1]) for s in spans] == [
        ("text", "Title"),
        ("text", "a block long enough to survive the cut"),
    ]


def test_table_and_image_spans_interleaved():
    raw = (
        "<p>leading paragraph with sufficient length here</p>"
        '<img src="m-7-img">'
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
        "<p>trailing paragraph with sufficient length too</p>"
    )
    spans = segment_html(raw)
    assert [s[0] for s in spans] == ["text", "image", "table", "text"]
    assert spans[1][2] == "m-7-img"
    assert spans[2][1] == "a | b\n1 | 2"
    assert [s[3] for s in spans] == [0, 1, 2, 3]


def test_script_and_style_skipped():
    raw = (
        "<script>var x = 'this is definitely long enough';</script>"
        "<style>.c { color: red; font-size: 2em; }</style>"
        "<p>only this actual content paragraph should remain</p>"
    )
    spans = segment_html(raw)
    assert len(spans) == 1 and "actual content" in spans[0][1]


def test_whitespace_collapsed_in_blocks():
    raw = "<p>spaced    out\n\n   text   collapses to single spaces</p>"
    assert segment_html(raw)[0][1] == "spaced out text collapses to single spaces"


def test_spark_wrapper_end_to_end(spark):
    raw = htmlify_documents(spark, SF)
    seg = segment_documents(raw)
    rows = seg.collect()
    assert len(rows) == 500
    by_id = {r["doc_id"]: r["spans"] for r in rows}
    # every doc keeps its heading; img docs carry the media span
    s0 = by_id["0"]
    kinds = [s["kind"] for s in s0]
    assert s0[0]["text"] == "Document 0"
    assert "image" in kinds and "table" in kinds  # doc 0: %3 and %5
    offs = [s["offset"] for s in s0]
    assert offs == list(range(len(offs)))
    # nav/footer text never leaks
    assert all("privacy policy" not in s["text"] for s in s0)


def test_segmented_pipeline_composes(spark):
    """Segmentation output feeds the extraction pipeline unchanged."""
    from blackedge_ocr_spark.pipeline import extract_documents

    seg = segment_documents(htmlify_documents(spark, SF))
    out = extract_documents(seg, query_col=None, enable_validation=False)
    assert out.count() == 500
    assert out.filter(F.col("content") == "").count() == 0
