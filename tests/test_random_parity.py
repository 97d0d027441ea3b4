"""Randomized Spark-vs-Python-oracle parity over adversarial strings.

One seeded corpus of 300 nasty strings (pipes, newlines, mojibake,
unicode, digit soup, long runs) is pushed through the Spark column
implementations AND the pure-Python oracle; every operator must agree
exactly. This is the guard against Java-regex-vs-Python-re divergence
(SURVEY §7 hard part b).
"""

import random
import string

import pyspark.sql.functions as F
import pytest

from blackedge_ocr_spark import oracle
from blackedge_ocr_spark.functions.problems import problems_array
from blackedge_ocr_spark.functions.similarity import (
    levenshtein_similarity,
    number_frequency_similarity,
    word_overlap_similarity,
    wordfreq_cosine_similarity,
)
from blackedge_ocr_spark.functions.text import (
    extract_numbers,
    key_terms,
    normalize_for_comparison,
    normalize_text,
    remove_page_breaks,
)

_ALPHABETS = (
    string.ascii_letters + "     ",
    string.ascii_lowercase + " |.\n",
    string.digits + " ,.%-$",
    "xyz \n\t",
    "abc âé€™Ã©�中文 ",
    "bcdfg aeiou \n|",
    "mix 😀𝄞\U0001F680 astral ",  # surrogate-pair stress
)
_SNIPPETS = (
    "TABLE 1:\nA | B\n1 | 2",
    "---PAGE-BREAK---",
    "[PAGE BREAK]",
    "â€™ donÃ© â€œx",
    "xxxxxxxxxxxxxxxx",
    "   \n\n\n\n\n\n\n\n\n\n\n\n\n\n\n\n\n\n   ",
    "Price: $1,234.56 up 25% from -3.5",
    "a | b | c\nd | e\nf | g | h | i",
    "bold 𝟏𝟐 arabic ١٢٣ devanagari १२ beside 12.5",  # non-ASCII Nd digits
    "café résumé naïve 😀 touché",
)


def _random_corpus(n=300, seed=1337):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        parts = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.3:
                parts.append(rng.choice(_SNIPPETS))
            else:
                alpha = rng.choice(_ALPHABETS)
                parts.append(
                    "".join(rng.choice(alpha) for _ in range(rng.randint(0, 120)))
                )
        docs.append((i, " ".join(parts)))
    return docs


@pytest.fixture(scope="module")
def corpus(spark):
    docs = _random_corpus()
    df = spark.createDataFrame(docs, "id long, text string")
    return docs, df


def test_text_transforms_match_oracle(corpus):
    docs, df = corpus
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            normalize_text("text").alias("norm"),
            remove_page_breaks("text").alias("nopb"),
            normalize_for_comparison("text").alias("cmp"),
            extract_numbers("text").alias("nums"),
            key_terms("text").alias("terms"),
        ).collect()
    }
    for i, text in docs:
        r = got[i]
        assert r["norm"] == oracle.normalize_text(text), (i, text)
        assert r["nopb"] == oracle.remove_page_breaks(text), (i, text)
        assert r["cmp"] == oracle.normalize_for_comparison(text), (i, text)
        assert r["nums"] == oracle.extract_numbers(text), (i, text)
        assert sorted(r["terms"]) == sorted(oracle.extract_key_terms(text)), (i, text)


def test_problem_detector_matches_oracle(corpus):
    docs, df = corpus
    got = {
        r["id"]: list(r["p"])
        for r in df.select("id", problems_array(F.col("text")).alias("p")).collect()
    }
    for i, text in docs:
        assert got[i] == oracle.detect_problems(text), (i, repr(text)[:200])


def test_similarities_match_oracle(corpus):
    docs, df = corpus
    # pair doc i with doc i+1
    a = df.select(F.col("id"), F.col("text").alias("ta"))
    b = df.select((F.col("id") - 1).alias("id"), F.col("text").alias("tb"))
    j = a.join(b, "id")
    got = {
        r["id"]: r
        for r in j.select(
            "id",
            number_frequency_similarity("ta", "tb").alias("nf"),
            word_overlap_similarity("ta", "tb").alias("wo"),
            wordfreq_cosine_similarity("ta", "tb").alias("co"),
            levenshtein_similarity("ta", "tb").alias("lv"),
        ).collect()
    }
    by_id = dict(docs)
    for i in range(len(docs) - 1):
        ta, tb = by_id[i], by_id[i + 1]
        r = got[i]
        assert r["nf"] == pytest.approx(
            oracle.number_frequency_similarity(ta, tb), abs=1e-9
        ), i
        assert r["wo"] == pytest.approx(
            oracle.word_overlap_similarity(ta, tb), abs=1e-9
        ), i
        assert r["co"] == pytest.approx(
            oracle.wordfreq_cosine_similarity(ta, tb), abs=1e-9
        ), i
        assert r["lv"] == pytest.approx(
            oracle.levenshtein_similarity(ta, tb), abs=1e-9
        ), i

def test_wordrun_duckdb_mirror_fuzz(spark):
    """Java (?U)\\w (engine) vs the RE2 WORDRUN mirror (DuckDB oracle)
    on the characters the round-2 class missed: letter-numbers
    (\\p{Nl}: Roman numerals), join controls (ZWNJ/ZWJ), plus marks,
    connector punctuation and non-ASCII digits. Covers word_count
    (raw text) and tokens/key_terms (normalized text)."""
    import duckdb
    import pandas as pd

    from blackedge_ocr_spark.functions.text import key_terms, tokens, word_count
    from blackedge_ocr_spark.sqloracle import key_terms_sql, tokens_sql, word_count_sql

    seeds = [
        "plain words only",
        "roman Ⅻ and ⅰⅱⅲ numerals",          # Nl
        "zw‌nj inside a word",             # ZWNJ joins the run
        "zw‍join and tail‍",          # ZWJ, trailing
        "under_score_words stay joined",        # Pc
        "étude mark ḿixed",         # combining acute (M)
        "arabic ١٢٣ digits and देवनागरी",        # Nd beyond ASCII, Devanagari
        "mixed Ⅻ‌x12 a_b‍Ⅲ soup",
        "",
        "‌‍",                         # join controls alone
    ]
    rng = random.Random(4242)
    docs = [(i, s) for i, s in enumerate(seeds)]
    pieces = [p for s in seeds if s for p in s.split(" ")]
    for i in range(len(seeds), 120):
        docs.append(
            (i, " ".join(rng.choice(pieces) for _ in range(rng.randint(1, 8))))
        )

    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            word_count("text").alias("wc"),
            tokens("text").alias("toks"),
            key_terms("text").alias("kt"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["id", "text"]))
    want = con.sql(
        f"SELECT id, {word_count_sql('text')} AS wc, "
        f"{tokens_sql('text')} AS toks, {key_terms_sql('text')} AS kt "
        "FROM documents"
    ).fetchall()
    for i, wc, toks, kt in want:
        assert got[i]["wc"] == wc, (i, docs[i][1])
        assert list(got[i]["toks"]) == list(toks), (i, docs[i][1])
        assert sorted(got[i]["kt"]) == sorted(kt), (i, docs[i][1])


def test_url_canonical_duckdb_mirror_fuzz(spark):
    """Spark scrub.url_canonical vs the DuckDB url_canon_sql mirror
    on adversarial URLs: duplicate/valueless/empty params, empty
    query/fragment, other schemes, non-default ports, userinfo with
    password, mixed-case everything, percent-encodings, unicode
    path/params, fragments containing '?', whitespace padding, and
    non-URLs. Also asserts idempotence: canonicalizing a canonical
    form is a fixpoint."""
    import duckdb
    import pandas as pd

    from blackedge_ocr_spark.analysis.scrub import url_canonical
    from blackedge_ocr_spark.sqloracle import url_canon_sql

    seeds = [
        "https://h.io/p?a=1&a=1&b",
        "https://h.io/p?",
        "https://h.io/p#",
        "#only-a-fragment",
        "ftp://H.IO/x",
        "https://h.io:8080/p",
        "http://h.io:80/p",
        "https://h.io:443/p",
        "https://u:pw@h.io./p/",
        "HtTpS://MiXeD.CaSe/PathCase",
        "https://h.io/p?utm_source=&x=1",
        "https://h.io/p?&&a=1",
        "no scheme at all",
        "",
        "http://",
        "https:///path-no-host",
        "  https://h.io/x  ",
        "https://h.io/a?b=c#d?e",
        "https://héllo.io/π?q=λ",
        "https://h.io/a%20b?x=%7E",
        "https://h.io/p?gclid=1&fbclid=2&msclkid=3&mc_cid=4&mc_eid=5",
        "https://h.io/p?utm_=1&utmx=2",  # utm_ prefix rule boundary
        "https://a@b@h.io/x",            # double '@' userinfo
        "https://h.io.:8080/x",          # FQDN dot before a port
        "http://h.io:443/x",             # non-default port for scheme
        "https://h.io:80:90/x",          # garbage port-ish suffix
    ]
    rng = random.Random(20260819)
    hosts = ["h.io", "A.B.C.example", "x.y.", "u@h.io", "u:p@H.iO:443"]
    paths = ["", "/", "/p/1", "/A%2FB", "/π"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x&z=9", "?a&b=", "#f",
               "?a=1#f?g"]
    docs = [(i, s) for i, s in enumerate(seeds)]
    for i in range(len(seeds), 160):
        docs.append((
            i,
            rng.choice(["https://", "HTTP://", "", "s3://"])
            + rng.choice(hosts) + rng.choice(paths) + rng.choice(queries),
        ))

    df = spark.createDataFrame(docs, "id long, url string")
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", url_canonical(F.col("url")).alias("c")
        ).collect()
    }
    # idempotence on the Spark side
    got2 = {
        r["id"]: r["c2"]
        for r in df.select(
            "id",
            url_canonical(url_canonical(F.col("url"))).alias("c2"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("urls", pd.DataFrame(docs, columns=["id", "url"]))
    want = dict(con.sql(url_canon_sql("urls", "id", "url")).fetchall())
    for i, u in docs:
        assert got[i] == want[i], (u, got[i], want[i])
        assert got2[i] == got[i], ("not idempotent", u, got[i], got2[i])
