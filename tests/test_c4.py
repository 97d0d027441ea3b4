"""C4 cleaning battery + global three-sentence-span dedup
(scrub.c4_filters / scrub.c4_span_dedup) against pure-Python models
and crafted both-sides fixtures."""

import hashlib
import re

from pyspark.sql import Row

from blackedge_ocr_spark.analysis import scrub


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows],
        "doc_id long, text string",
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ----------------------------------------------------- c4_filters


def _py_sentences(text):
    runs = re.findall(scrub.SENT_RE, text or "")
    return [s.strip(" ") for s in runs if s.strip(" ") != ""]


def _py_c4(text):
    text = text or ""
    lines = [ln.strip(" ") for ln in text.split("\n")]

    def keep(ln):
        words = [w for w in re.split(r"\s+", ln) if w != ""]
        return (
            bool(re.search(scrub.C4_TERMINAL_RE, ln))
            and len(words) >= scrub.C4_MIN_LINE_WORDS
            and "javascript" not in ln.lower()
        )

    kept = [ln for ln in lines if keep(ln)]
    kept_text = "\n".join(kept)
    n_sents = len(_py_sentences(kept_text))
    lorem = "lorem ipsum" in text.lower()
    brace = "{" in text
    bad = bool(re.search(scrub.C4_BADWORD_RE.replace("(?i)", ""), text,
                         re.IGNORECASE))
    return (
        len(lines), len(kept), n_sents, lorem, brace, bad,
        _md5(kept_text),
        n_sents >= scrub.C4_MIN_SENTENCES
        and not lorem and not brace and not bad,
    )


C4_ROWS = [
    (0, "one good sentence here. another fine one. third body line.\n"
        "fourth sentence stands. fifth sentence closes."),  # passes
    (1, "unterminated line with many words\nalso no punctuation"),
    (2, "tiny.\nno. go. so."),  # short lines -> dropped by min-words
    (3, "please enable javascript to continue. second sentence here."
        "\nthird one stays fine. fourth sentence too. fifth closes."
        "\nsixth sentence lands. seventh also lands."),  # js line drops
    (4, "lorem ipsum dolor sit amet. real sentence one. two here."
        "\nthree more words here. four follows now. five ends it."),
    (5, "var x = { a: 1 }. one sentence here. two sentences here."
        "\nthree now appear. four keep coming. five to finish."),
    (6, "mentions badword1 sadly. one more here. two more here."
        "\nthree more here. four more here. five more here."),
    (7, ""),  # empty page
    (8, 'he said "stop". she agreed fully. "it ends now."'
        "\nmore words follow here. final sentence closes out."),
]


def test_c4_filters_match_pure_python_model(spark):
    out = {
        r["doc_id"]: (
            r["n_lines"], r["n_kept_lines"], r["n_sentences"],
            r["has_lorem"], r["has_brace"], r["has_badword"],
            r["kept_md5"], r["c4_keep"],
        )
        for r in scrub.c4_filters(_docs(spark, C4_ROWS)).collect()
    }
    for doc_id, text in C4_ROWS:
        assert out[doc_id] == _py_c4(text), f"doc {doc_id}"


def test_c4_filters_rule_semantics(spark):
    out = {
        r["doc_id"]: r
        for r in scrub.c4_filters(_docs(spark, C4_ROWS)).collect()
    }
    assert out[0]["c4_keep"]
    # unterminated lines all drop -> zero sentences
    assert out[1]["n_kept_lines"] == 0 and not out[1]["c4_keep"]
    # "tiny." (1 word) drops; "no. go. so." (3 words) survives the
    # line rule but leaves only 3 sentences -> page fails min-sents
    assert out[2]["n_kept_lines"] == 1
    assert out[2]["n_sentences"] == 3 and not out[2]["c4_keep"]
    # javascript line dropped but page not flagged
    assert out[3]["n_kept_lines"] == 2 and out[3]["c4_keep"]
    assert out[4]["has_lorem"] and not out[4]["c4_keep"]
    assert out[5]["has_brace"] and not out[5]["c4_keep"]
    assert out[6]["has_badword"] and not out[6]["c4_keep"]
    assert out[7]["n_lines"] == 1 and not out[7]["c4_keep"]
    # closing-quote terminal counts; page passes
    assert out[8]["c4_keep"]


# ------------------------------------------------- c4_span_dedup


def _span_rows(spark, texts):
    return _docs(spark, list(enumerate(texts)))


def test_span_dedup_first_wins_across_docs(spark):
    shared = "alpha one. alpha two. alpha three."
    texts = [
        f"u0 a. u0 b. {shared}",       # doc 0: first holder, keeps all
        f"u1 a. u1 b. {shared} u1 c.", # doc 1: loses the 3 shared
        "u2 a. u2 b. u2 c.",           # doc 2: untouched
    ]
    out = {
        r["doc_id"]: r
        for r in scrub.c4_span_dedup(_span_rows(spark, texts)).collect()
    }
    assert out[0]["n_sents"] == 5 and out[0]["n_kept"] == 5
    assert out[1]["n_sents"] == 6 and out[1]["n_kept"] == 3
    assert out[1]["kept_md5"] == _md5("u1 a. u1 b. u1 c.")
    assert out[2]["n_kept"] == 3


def test_span_dedup_repeat_within_one_doc_loses_later(spark):
    t = "s one. s two. s three. s one. s two. s three."
    out = scrub.c4_span_dedup(_span_rows(spark, [t])).collect()[0]
    # spans at pos 0..3; pos-3 span == pos-0 span -> sentences 3,4,5
    # delete (and the straddling spans at 1,2 are unique, no effect)
    assert out["n_sents"] == 6 and out["n_kept"] == 3
    assert out["kept_md5"] == _md5("s one. s two. s three.")


def test_span_dedup_short_and_empty_docs_pass_through(spark):
    texts = ["a b. c d.", "", "only one sentence here."]
    out = {
        r["doc_id"]: r
        for r in scrub.c4_span_dedup(_span_rows(spark, texts)).collect()
    }
    assert out[0]["n_sents"] == 2 and out[0]["n_kept"] == 2
    assert out[1]["n_sents"] == 0 and out[1]["kept_md5"] == _md5("")
    assert out[2]["n_kept"] == 1


def test_span_dedup_overlap_deletion_beats_winning_span(spark):
    # doc 0 holds [x1 x2 x3]; doc 1 = [x1 x2 x3 y1 y2]: its span at
    # pos 0 loses -> sentences 0..2 delete even though doc 1's span
    # at pos 1 ([x2 x3 y1]) is a global winner. Survivors: y1 y2.
    texts = [
        "x one. x two. x three.",
        "x one. x two. x three. y one. y two.",
    ]
    out = {
        r["doc_id"]: r
        for r in scrub.c4_span_dedup(_span_rows(spark, texts)).collect()
    }
    assert out[1]["n_kept"] == 2
    assert out[1]["kept_md5"] == _md5("y one. y two.")
