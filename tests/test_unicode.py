"""Unicode hygiene scrub (scrub.unicode_scrub) against a pure-Python
model, plus the cross-engine NFC parity pin that the DuckDB oracle
relies on (utf8proc NFC == Python unicodedata NFC on the classes the
operator and staging exercise)."""

import hashlib
import re
import unicodedata

from pyspark.sql import Row

from blackedge_ocr_spark.analysis import scrub


def _py_pat(p: str) -> str:
    """Java/RE2 \\x{ABCD} -> python \\uABCD."""
    return re.sub(r"\\x\{([0-9A-Fa-f]+)\}", lambda m: chr(int(m[1], 16)), p)


CTRL = re.compile(_py_pat(scrub.CTRL_RE))
ZW = re.compile(_py_pat(scrub.ZW_RE))
REPL = re.compile(_py_pat(scrub.REPL_RE))
STRIP = re.compile(_py_pat(scrub.UNICODE_STRIP_RE))


def _py_scrub(text):
    text = text or ""
    cleaned = unicodedata.normalize("NFC", STRIP.sub("", text))
    return (
        len(CTRL.findall(text)),
        len(ZW.findall(text)),
        len(REPL.findall(text)),
        cleaned != text,
        len(cleaned),
        hashlib.md5(cleaned.encode()).hexdigest(),
    )


ROWS = [
    (0, "plain ascii stays put."),
    (1, "cafe\u0301 composes to caf\u00e9"),  # combining acute
    (2, "A\u030angstro\u0308m units"),  # ring + diaeresis, decomposed
    (3, "zero\u200bwidth and join\u2060er and \ufeffbom strip"),
    (4, "mojibake bad\ufffd\ufffdbytes here"),
    (5, "bell\x07 and null\x00 and del\x7f controls"),
    (6, "ohm \u2126 becomes omega"),
    (7, "tabs\tand\nnewlines\rsurvive"),
    (8, ""),
    (9, "q\u0307\u0323 reorders canonically"),  # mark reordering
    (10, "already caf\u00e9 composed"),  # NFC no-op
]


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in ROWS],
        "doc_id long, text string",
    )


def test_unicode_scrub_matches_pure_python_model(spark):
    out = {
        r["doc_id"]: (
            r["n_ctrl"], r["n_zw"], r["n_repl"], r["changed"],
            r["n_chars"], r["clean_md5"],
        )
        for r in scrub.unicode_scrub(_docs(spark)).collect()
    }
    for doc_id, text in ROWS:
        assert out[doc_id] == _py_scrub(text), f"doc {doc_id}"


def test_unicode_scrub_semantics(spark):
    out = {
        r["doc_id"]: r for r in scrub.unicode_scrub(_docs(spark)).collect()
    }
    # decomposed acute composes: one char shorter, changed
    assert out[1]["changed"]
    assert out[1]["n_chars"] == len(ROWS[1][1]) - 1
    # strips count and disappear
    assert out[3]["n_zw"] == 3 and out[3]["changed"]
    assert out[4]["n_repl"] == 2
    assert out[5]["n_ctrl"] == 3
    # ohm singleton maps to U+03A9, same length
    assert out[6]["changed"] and out[6]["n_chars"] == len(ROWS[6][1])
    # \t \n \r are NOT control-garbage
    assert out[7]["n_ctrl"] == 0 and not out[7]["changed"]
    assert not out[0]["changed"] and not out[10]["changed"]
    assert out[8]["n_chars"] == 0
    # mark reordering canonicalizes (dot-below sorts before dot-above)
    assert out[9]["changed"] and out[9]["n_chars"] == len(ROWS[9][1])


def test_nfc_parity_python_vs_duckdb():
    """The oracle's nfc_normalize must agree byte-for-byte with the
    engine's unicodedata NFC on composition, singletons, reordering,
    and compat-exempt ligatures."""
    import duckdb

    cases = [
        "cafe\u0301",
        "A\u030angstro\u0308m",
        "\u2126 ohm",
        "q\u0307\u0323",
        "\ufb01sh ligature stays",  # NFC keeps compat chars
        "\u1100\u1161 hangul jamo compose",  # -> U+AC00
    ]
    con = duckdb.connect()
    for t in cases:
        d = con.sql("select nfc_normalize(?)", params=[t]).fetchone()[0]
        assert d == unicodedata.normalize("NFC", t), repr(t)
