"""Layout-JSON parse + ingest utility unit vectors."""

import json

import pyspark.sql.functions as F

from blackedge_ocr_spark.functions.ingest import (
    decode_payload,
    encode_payload,
    is_pdf_header,
    sanitize_filename,
)
from blackedge_ocr_spark.functions.layout import parse_layout_json


def _doc(pages, tables=None):
    return json.dumps({"analyzeResult": {"pages": pages, "tables": tables}})


def test_pages_sorted_and_lines_joined(spark):
    raw = _doc(
        [
            {"pageNumber": 2, "lines": [{"content": "second"}]},
            {"pageNumber": 1, "lines": [{"content": "first a"}, {"content": "first b"}]},
        ]
    )
    df = spark.createDataFrame([(raw,)], "j string")
    out = df.select(parse_layout_json(F.col("j")).alias("p")).collect()[0]["p"]
    assert [(s["offset"], s["text"]) for s in out] == [
        (0, "first a\nfirst b"),
        (1, "second"),
    ]


def test_table_pivot_attaches_to_page(spark):
    """Cells scrambled, rows/cols re-sorted, None cell → '' —
    reference azure_di_client.py:327-368 semantics."""
    raw = _doc(
        [
            {"pageNumber": 1, "lines": [{"content": "page one"}]},
            {"pageNumber": 2, "lines": [{"content": "page two"}]},
        ],
        [
            {
                "boundingRegions": [{"pageNumber": 2}],
                "cells": [
                    {"rowIndex": 1, "columnIndex": 1, "content": "d"},
                    {"rowIndex": 0, "columnIndex": 1, "content": "b"},
                    {"rowIndex": 0, "columnIndex": 0, "content": "a"},
                    {"rowIndex": 1, "columnIndex": 0, "content": None},
                ],
            }
        ],
    )
    df = spark.createDataFrame([(raw,)], "j string")
    out = df.select(parse_layout_json(F.col("j")).alias("p")).collect()[0]["p"]
    assert out[0]["text"] == "page one"
    assert out[1]["text"] == "page two\nTABLE:\na | b\n | d"


def test_base64_roundtrip_and_header(spark):
    df = spark.createDataFrame(
        [("%PDF-1.7 payload",), ("not a pdf",)], "p string"
    )
    out = df.select(
        decode_payload(encode_payload(F.col("p"))).cast("string").alias("rt"),
        is_pdf_header(decode_payload(encode_payload(F.col("p")))).alias("ok"),
    ).collect()
    assert [r["rt"] for r in out] == ["%PDF-1.7 payload", "not a pdf"]
    assert [r["ok"] for r in out] == [True, False]


def test_filename_sanitizer(spark):
    df = spark.createDataFrame([('a/b\\c:d*e?f"g<h>i|j.pdf',)], "f string")
    got = df.select(sanitize_filename(F.col("f")).alias("s")).collect()[0]["s"]
    assert got == "a_b_c_d_e_f_g_h_i_j.pdf"


def _ref_sanitize(filename: str, max_length: int = 255) -> str:
    """Reference algorithm verbatim-in-spirit (core/utils.py:193-221):
    per-char replace, then Path.stem/Path.suffix truncation — including
    the negative-slice behavior when the suffix alone exceeds
    max_length."""
    from pathlib import Path

    sanitized = filename
    for ch in '/\\:*?"<>|':
        sanitized = sanitized.replace(ch, "_")
    if len(sanitized) > max_length:
        name, ext = Path(sanitized).stem, Path(sanitized).suffix
        sanitized = name[: max_length - len(ext)] + ext
    return sanitized


def test_filename_sanitizer_truncation_parity(spark):
    cases = [
        "a" * 300 + ".pdf",            # long stem, short ext
        "a" * 255 + ".pdf",            # 259 chars: truncates
        "a" * 251 + ".pdf",            # exactly 255: untouched
        "b" * 300,                     # no extension at all
        "stem." + "x" * 300,           # extension alone > 255
        "s" * 100 + "." + "x" * 300,   # negative-slice keep
        "." + "h" * 300,               # dotfile: Path.suffix == ''
        ("n" * 300) + ".",             # trailing dot: suffix == ''
        "a.b.c." + "d" * 300,          # multi-dot: last suffix wins
        'we?ird/na*me' + "q" * 250 + ".tar.gz",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "f string")
    got = [
        r["s"]
        for r in df.select(
            sanitize_filename(F.col("f")).alias("s")
        ).collect()
    ]
    assert got == [_ref_sanitize(c) for c in cases]


def test_empty_cells_table_emits_no_dangling_marker(spark):
    import json as _json

    payload = _json.dumps({"analyzeResult": {
        "pages": [{"pageNumber": 1, "lines": [{"content": "pg"}]}],
        "tables": [
            {"boundingRegions": [{"pageNumber": 1}], "cells": None},
            {"boundingRegions": [{"pageNumber": 1}], "cells": []},
        ],
    }})
    df = spark.createDataFrame([(payload,)], "j string")
    out = df.select(parse_layout_json(F.col("j")).alias("p")).collect()[0]["p"]
    assert out[0]["text"] == "pg"  # no stray '\nTABLE:\n'
