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


def test_malformed_html_robustness():
    """Web-scale HTML is routinely malformed; the three classic
    failure shapes must not lose content: (1) an unclosed <a> may
    mark its own block as linked but never poisons later blocks;
    (2) a nested <table> folds into the outer table instead of
    clobbering its rows; (3) a document truncated mid-table keeps the
    collected rows, like an unterminated paragraph keeps its text."""
    from blackedge_ocr_spark.segmentation import segment_html

    keep = ("This is a long genuine paragraph of real content that "
            "should definitely be kept in the output.")
    spans = segment_html(f"<p><a href=x>nav link words</p><p>{keep}</p>")
    assert [s[1] for s in spans] == [keep]

    spans = segment_html(
        "<table><tr><td>outer1</td><td>outer2</td></tr>"
        "<table><tr><td>inner</td></tr></table>"
        "<tr><td>outer3</td><td>outer4</td></tr></table>"
    )
    assert spans == [
        ("table", "outer1 | outer2\ninner\nouter3 | outer4", "", 0)
    ]

    spans = segment_html("<table><tr><td>k</td><td>v</td></tr>")
    assert spans == [("table", "k | v", "", 0)]

    # and a legally closed link-dense block is still boilerplate
    spans = segment_html(
        "<div><a href=x>pure link boilerplate pure link</a></div>"
        f"<p>{keep}</p>"
    )
    assert [s[1] for s in spans] == [keep]


def test_implicit_close_table_keeps_all_cells(spark):
    """Real-web HTML with implicit </td>/</tr>: every cell survives
    (a new td/tr start folds the open buffer, never discards it)."""
    from blackedge_ocr_spark.segmentation import segment_html

    spans = segment_html(
        "<table><tr><td>alpha<td>beta</tr><tr><td>g<td>d</tr></table>"
    )
    assert spans == [("table", "alpha | beta\ng | d", "", 0)]
    # fully implicit rows too (no </tr> at all)
    spans2 = segment_html("<table><tr><td>x<td>y<tr><td>z</table>")
    assert spans2 == [("table", "x | y\nz", "", 0)]


def test_img_inside_table_emits_image_span(spark):
    from blackedge_ocr_spark.segmentation import segment_html

    spans = segment_html(
        '<table><tr><td><img src="m1">cap</td></tr></table>'
    )
    assert spans == [("image", "", "m1", 0), ("table", "cap", "", 1)]


def test_link_density_counts_normalized_chars(spark):
    """Anchor text with whitespace runs must not inflate density past
    the true collapsed ratio."""
    from blackedge_ocr_spark.segmentation import segment_html

    # linked chars (normalized) = len('a b') = 3; total text
    # 'a b plus twenty more plain characters here ok' -> density
    # well under 0.33, block must SURVIVE
    html = "<p><a>a \n  b</a> plus twenty more plain characters here ok</p>"
    spans = segment_html(html)
    assert spans and spans[0][0] == "text"
