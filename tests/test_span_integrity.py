"""Span-sequence contract audit + repair (corpusops.span_integrity)
against crafted fixtures and a pure-Python repair model."""

import hashlib

from pyspark.sql import Row

from blackedge_ocr_spark.analysis.corpusops import RS, US, span_integrity

SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind string, text string, media_ref string, offset int>>"
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def _ident(s) -> str:
    return US.join((s["kind"], s["text"], s["media_ref"]))


def _py_repair(spans):
    """Reference model: drop invalid, first-wins per offset by content
    md5, order by offset, digest."""
    allowed = {"text", "table", "image", "page"}
    media = {"image", "page"}

    def valid(s):
        if s["kind"] not in allowed:
            return False
        if s["kind"] in media:
            return s["media_ref"] != ""
        return s["media_ref"] == ""

    surv = sorted(
        (s for s in spans if valid(s)),
        key=lambda s: (s["offset"], _md5(_ident(s))),
    )
    kept, seen = [], set()
    for s in surv:
        if s["offset"] not in seen:
            seen.add(s["offset"])
            kept.append(s)
    complete = [s["offset"] for s in kept] == list(range(len(kept)))
    return kept, complete, _md5(RS.join(_ident(s) for s in kept))


DOCS = [
    # clean but stored scrambled
    ("clean", [
        _span("table", "TABLE 1:\na | b", "", 2),
        _span("text", "hello world", "", 0),
        _span("image", "", "m-1-1", 1),
    ]),
    # duplicate offset 0 — lowest content-md5 wins
    ("dup", [
        _span("text", "alpha", "", 0),
        _span("text", "beta", "", 0),
        _span("text", "gamma", "", 1),
    ]),
    ("badkind", [
        _span("widget", "x", "", 0),
        _span("text", "y", "", 1),
    ]),
    ("badref", [
        _span("image", "", "", 0),         # media missing ref
        _span("text", "z", "m-ghost", 1),  # text carrying ref
        _span("text", "w", "", 2),
    ]),
    ("gap", [
        _span("text", "a", "", 0),
        _span("text", "b", "", 2),
    ]),
    ("empty", []),
]


def _run(spark):
    rows = [Row(doc_id=d, spans=sp) for d, sp in DOCS]
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["doc_id"]: r for r in span_integrity(df).collect()}


def test_span_integrity_matches_python_model(spark):
    out = _run(spark)
    for doc_id, spans in DOCS:
        kept, complete, digest = _py_repair(spans)
        r = out[doc_id]
        assert r["n_kept"] == len(kept), doc_id
        assert r["complete"] == complete, doc_id
        assert r["repaired_md5"] == digest, doc_id


def test_span_integrity_verdicts(spark):
    out = _run(spark)
    c = out["clean"]
    assert c["ok"] and c["complete"] and c["n_kept"] == 3
    # repaired digest is the offset-ordered sequence
    assert c["repaired_md5"] == _md5(RS.join([
        US.join(("text", "hello world", "")),
        US.join(("image", "", "m-1-1")),
        US.join(("table", "TABLE 1:\na | b", "")),
    ]))
    d = out["dup"]
    assert d["n_dup"] == 1 and d["n_kept"] == 2 and not d["ok"]
    assert d["complete"]  # offsets 0,1 survive
    # deterministic winner: lower md5 of 'text\x1falpha\x1f' vs beta
    win = min(("alpha", "beta"), key=lambda t: _md5(US.join(("text", t, ""))))
    assert d["repaired_md5"] == _md5(RS.join([
        US.join(("text", win, "")), US.join(("text", "gamma", "")),
    ]))
    bk = out["badkind"]
    assert bk["n_bad_kind"] == 1 and bk["n_kept"] == 1 and not bk["ok"]
    assert not bk["complete"]  # survivor sits at offset 1, gap at 0
    br = out["badref"]
    assert br["n_ref_bad"] == 2 and br["n_kept"] == 1 and not br["ok"]
    g = out["gap"]
    assert g["n_dup"] == 0 and not g["complete"] and not g["ok"]
    e = out["empty"]
    assert e["n_spans"] == 0 and e["n_kept"] == 0 and e["complete"]
    assert e["repaired_md5"] == _md5("")


def test_span_integrity_idempotent_on_clean_corpus(spark):
    """Re-auditing a contract-clean spansified corpus: every doc ok,
    digest equals the offset-ordered identity digest."""
    from blackedge_ocr_spark.datagen import spansify_documents

    df = spansify_documents(spark, "/root/testdata/sf0.001")
    out = span_integrity(df)
    assert out.filter("NOT ok").count() == 0
    assert out.filter("n_spans != n_kept").count() == 0
