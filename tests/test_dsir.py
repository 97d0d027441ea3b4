"""Semantics tests for analysis/dsir.py on crafted corpora: a pure-
Python reference model pins the exact weight arithmetic (hash bucket,
add-one smoothing, micro-unit ln rounding, exact long sums), plus
edge cases and the select head's total order. Spark-vs-DuckDB parity
is covered by the driver contract."""

import hashlib
import math

from pyspark.sql import Row

from blackedge_ocr_spark.analysis import dsir


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, t, lang in rows],
        "doc_id long, text string, lang string",
    )


def _py_tokens(text):
    # mirror of functions.text.tokens on plain-ascii lowercase input
    # (the crafted corpora below avoid the normalizer's edge cases)
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _py_weights(rows):
    """Pure-Python DSIR: identical formula, identical rounding."""
    feats = {}
    for doc_id, text, lang in rows:
        toks = _py_tokens(text)
        fs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats[doc_id] = (
            lang == dsir.DSIR_TARGET_LANG,
            [
                hashlib.md5(f"dsir:{f}".encode()).hexdigest()[
                    : dsir.DSIR_BUCKET_HEX
                ]
                for f in fs
            ],
        )
    n_raw, n_tgt = {}, {}
    for is_t, bs in feats.values():
        for b in bs:
            n_raw[b] = n_raw.get(b, 0) + 1
            if is_t:
                n_tgt[b] = n_tgt.get(b, 0) + 1
    t_raw = sum(n_raw.values())
    t_tgt = sum(n_tgt.values())
    li = {
        b: math.floor(
            (
                math.log(
                    (n_tgt.get(b, 0) + 1) / (t_tgt + dsir.DSIR_BUCKETS)
                )
                - math.log((n_raw[b] + 1) / (t_raw + dsir.DSIR_BUCKETS))
            )
            * 1e6
            + 0.5
        )
        for b in n_raw
    }
    out = {}
    for doc_id, (_, bs) in feats.items():
        s = sum(li[b] for b in bs)
        out[doc_id] = (len(bs), s / 1e6 if bs else 0.0)
    return out


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox sleeps", "en"),
    (2, "el rapido zorro marron salta sobre el perro", "es"),
    (3, "der schnelle braune fuchs springt", "de"),
    (4, "quick brown quick brown quick", "en"),
    (5, "", "en"),
    (6, "zorro", "es"),
]


def test_dsir_weights_match_pure_python_model(spark):
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir.dsir_weights(_docs_df(spark, CORPUS)).collect()
    }
    want = _py_weights(CORPUS)
    assert got == want


def test_dsir_weights_edge_rows(spark):
    got = {
        r["doc_id"]: r
        for r in dsir.dsir_weights(_docs_df(spark, CORPUS)).collect()
    }
    # empty doc: zero features, weight exactly 0.0
    assert got[5]["n_feats"] == 0 and got[5]["logw"] == 0.0
    # single-token doc: exactly one unigram, no bigram
    assert got[6]["n_feats"] == 1
    # 9-token doc: 9 unigrams + 8 bigrams
    assert got[0]["n_feats"] == 17
    # target-aligned text outweighs off-target text sharing no tokens
    assert got[1]["logw"] > got[2]["logw"]


def test_dsir_select_is_the_ordered_head(spark):
    d = _docs_df(spark, CORPUS)
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir.dsir_weights(d).collect()
    }
    want = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = dsir.dsir_select(d, k=3).collect()
    assert [(r["doc_id"], r["logw"]) for r in got] == want
    assert [r["rank"] for r in got] == [1, 2, 3]


# --- Gopher rule battery (textstats.gopher_rules) --------------------


def _gopher_df(spark, rows):
    return _docs_df(spark, [(i, t, "en") for i, t in rows])


GOOD = (
    "the data are good and we have to be sure that with care "
    + " ".join(f"word{i} extra tokens here" for i in range(12))
)


def _py_gopher(text):
    """Pure-Python mirror of gopher_rules' formulas (flags on exact
    values, micro-unit rounding for the output ratios)."""
    import re

    from blackedge_ocr_spark.analysis import textstats as ts

    words = [w for w in re.split(r"\s+", text) if w != ""]
    lines = [ln for ln in text.split("\n") if ln.strip() != ""]
    n_w, n_l = len(words), len(lines)
    mean_len = sum(len(w) for w in words) / n_w if n_w else 0.0
    n_sym = len(re.findall(r"#", text)) + len(re.findall(r"\.\.\.|…", text))
    symbol = n_sym / n_w if n_w else 0.0
    bullet = (
        sum(bool(re.search(r"^\s*[-*•]", ln)) for ln in lines) / n_l
        if n_l
        else 0.0
    )
    ell = (
        sum(bool(re.search(r"(\.\.\.|…)\s*$", ln)) for ln in lines) / n_l
        if n_l
        else 0.0
    )
    alpha = (
        sum(bool(re.search(r"[a-zA-Z]", w)) for w in words) / n_w
        if n_w
        else 0.0
    )
    lowered = [w.lower() for w in words]
    hits = sum(s in lowered for s in ts.GOPHER_STOPWORDS)
    flags = (
        ts.GOPHER_MIN_WORDS <= n_w <= ts.GOPHER_MAX_WORDS,
        ts.GOPHER_MIN_WLEN <= mean_len <= ts.GOPHER_MAX_WLEN,
        symbol <= ts.GOPHER_MAX_SYMBOL_RATIO,
        bullet <= ts.GOPHER_MAX_BULLET_FRAC,
        ell <= ts.GOPHER_MAX_ELLIPSIS_FRAC,
        alpha >= ts.GOPHER_MIN_ALPHA_FRAC,
        hits >= ts.GOPHER_MIN_STOP_HITS,
    )
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    return (
        n_w, r6(mean_len), r6(symbol), r6(bullet), r6(ell), r6(alpha),
        hits, *flags, all(flags),
    )


GOPHER_ROWS = [
    (0, GOOD),  # passes every rule
    (1, "the and short"),  # fails only the word-count rule band
    (2, GOOD + " ### ## # # # # # # # #"),  # symbol ratio
    (3, "\n".join(["- bullet line"] * 10 + ["plain"])),  # 10/11 bullets
    (4, GOOD.replace(" ", "...\n", 30)),  # ellipsis-ended lines
    (5, ""),  # empty doc
    (6, "42 7 99 " + GOOD),  # some non-alphabetic words
]


def test_gopher_rules_match_pure_python_model(spark):
    from blackedge_ocr_spark.analysis.textstats import gopher_rules

    out = {
        r["doc_id"]: tuple(r)[1:]
        for r in gopher_rules(_gopher_df(spark, GOPHER_ROWS)).collect()
    }
    for doc_id, text in GOPHER_ROWS:
        assert out[doc_id] == _py_gopher(text), f"doc {doc_id}"


def test_gopher_rules_flag_semantics(spark):
    from blackedge_ocr_spark.analysis.textstats import gopher_rules

    out = {
        r["doc_id"]: r
        for r in gopher_rules(_gopher_df(spark, GOPHER_ROWS)).collect()
    }
    assert out[0]["gopher_pass"]
    # short doc: stopword rule still passes ("the" + "and"), words fail
    assert not out[1]["r_words"] and out[1]["r_stopwords"]
    assert not out[2]["r_symbol"] and out[2]["symbol_ratio"] > 0.1
    assert not out[3]["r_bullet"] and out[3]["bullet_frac"] > 0.9
    assert not out[4]["r_ellipsis"]
    r5 = out[5]
    assert r5["n_words"] == 0 and not r5["gopher_pass"]
    assert r5["r_symbol"] and not r5["r_alpha"]


# --- CCNet perplexity bucketing (textstats.ccnet_buckets) ------------


def test_ccnet_buckets_order_and_unsampled(spark):
    import hashlib as _h

    from blackedge_ocr_spark.analysis import textstats as ts

    def in_sample(doc_id):
        return _h.md5(f"{ts.CCNET_SALT}{doc_id}".encode()).hexdigest()[
            0
        ] < f"{ts.CCNET_KEEP:x}"

    # enough en docs that the sample is non-empty and all three
    # buckets populate; an 'xx' lang built ONLY from out-of-sample ids
    # must come back 'unsampled'.
    en_ids = list(range(40))
    assert any(in_sample(i) for i in en_ids)
    xx_ids = [i for i in range(40, 400) if not in_sample(i)][:3]
    rows = [
        (i, " ".join(["common"] * (1 + i % 7) + [f"rare{i}"]), "en")
        for i in en_ids
    ] + [(i, "opaque tokens here", "xx") for i in xx_ids]
    out = ts.ccnet_buckets(_docs_df(spark, rows)).collect()
    en = [r for r in out if r["lang"] == "en"]
    order = {"tail": 0, "middle": 1, "head": 2}
    # bucket assignment must be monotone in lm_score within a lang
    en.sort(key=lambda r: r["lm_score"])
    ranks = [order[r["bucket"]] for r in en]
    assert ranks == sorted(ranks)
    assert {r["bucket"] for r in out if r["lang"] == "xx"} == {"unsampled"}


def test_lm_scores_carry_columns(spark):
    from blackedge_ocr_spark.analysis import textstats as ts

    d = _docs_df(spark, [(0, "a b c", "en"), (1, "", "de")])
    out = {r["doc_id"]: r for r in ts.lm_scores(d, carry=("lang",)).collect()}
    assert out[0]["lang"] == "en" and out[1]["lang"] == "de"
    assert out[1]["n_tokens"] == 0 and out[1]["lm_score"] == 0.0
