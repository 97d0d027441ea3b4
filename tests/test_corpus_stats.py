"""Unit tests for the corpus-shape operators: IDF table, exact
distributed percentiles (vs numpy's linear interpolation), and the
snapshot-diff classifier. DuckDB end-to-end parity is covered by the
driver contract; these pin the semantics on hand-built inputs."""

import math

import numpy as np
from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis import corpusops, textstats


def test_term_doc_freq_counts_and_idf(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha delta"),
            (3, "alpha beta xy"),  # 'xy' too short for a key term
        ],
        "doc_id long, text string",
    )
    rows = {
        r["term"]: (r["df"], r["idf"])
        for r in textstats.term_doc_freq(docs).collect()
    }
    assert set(rows) == {"alpha", "beta", "gamma", "delta"}
    assert rows["alpha"][0] == 3 and rows["alpha"][1] == 0.0
    assert rows["beta"][0] == 2  # repeats within a doc count once
    assert rows["gamma"][0] == 1
    want = math.floor(math.log(3 / 2) * 1e6 + 0.5) / 1e6
    assert rows["beta"][1] == want


def test_corpus_token_stats_matches_numpy_percentiles(spark):
    rows = []
    counts = {"web": [1, 2, 3, 4, 5, 6, 7, 8, 9, 50], "book": [10, 20, 21]}
    i = 0
    for src, ns in counts.items():
        for n in ns:
            rows.append((i, src, "w " * n))  # n whitespace tokens
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r.asDict()
        for r in textstats.corpus_token_stats(docs).collect()
    }
    for src, ns in counts.items():
        assert got[src]["n_docs"] == len(ns)
        for p in textstats.PCTS:
            want = float(np.percentile(ns, p * 100, method="linear"))
            want = math.floor(want * 1e6 + 0.5) / 1e6
            assert got[src][f"p{int(p * 100)}_tokens"] == want, (src, p)


def test_snapshot_diff_classification(spark):
    # doc_ids chosen to hit each class: 3 -> added (absent from A),
    # 7 -> removed (absent from B), 17 -> changed (revised in B),
    # 1 -> unchanged.
    docs = spark.createDataFrame(
        [(1, "one"), (3, "three"), (7, "seven"), (17, "seventeen")],
        "doc_id long, text string",
    )
    got = {
        r["status"]: (r["n_docs"], r["min_doc_id"], r["max_doc_id"])
        for r in corpusops.snapshot_diff(docs).collect()
    }
    assert got == {
        "added": (1, 3, 3),
        "removed": (1, 7, 7),
        "changed": (1, 17, 17),
        "unchanged": (1, 1, 1),
    }


def test_snapshot_views_are_deterministic_projections(spark):
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    )
    a, b = corpusops.snapshot_views(docs)
    assert a.count() == 200 - 4  # 4 ids = 3, 53, 103, 153
    assert b.count() == 200 - 4  # 4 ids = 7, 57, 107, 157
    revised = b.filter(F.col("text").endswith(corpusops.DIFF_REV_SUFFIX))
    assert revised.count() == b.filter(
        F.col("doc_id") % corpusops.DIFF_REV_MOD == 0
    ).count()


def test_bpe_pairs_weighted_adjacent_char_pairs(spark):
    # word freqs: abab x4, ab x1, x x2. "abab" emits ab,ba,ab;
    # 1-char "x" emits nothing (the sequence(1,0) guard).
    # ab = 4*2 + 1 = 9, ba = 4*1 = 4.
    docs = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "abab x"), (3, "abab x")],
        "doc_id long, text string",
    )
    got = {r["pair"]: r["n"] for r in textstats.bpe_pairs(docs).collect()}
    assert got == {"ab": 9, "ba": 4}


def test_bpe_pairs_order_and_limit(spark):
    docs = spark.createDataFrame(
        [(i, "zz aa") for i in range(5)], "doc_id long, text string"
    )
    rows = textstats.bpe_pairs(docs).collect()
    # equal counts -> pair ASC breaks the tie deterministically
    assert [r["pair"] for r in rows] == ["aa", "zz"]
    assert [r["n"] for r in rows] == [5, 5]


def test_data_split_partitions_every_doc_exactly_once(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma").alias("text"),
    )
    rows = {r["split"]: r for r in corpusops.data_split(docs).collect()}
    assert set(rows) <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == 1000
    assert sum(r["n_tokens"] for r in rows.values()) == 3000
    # shares sum to ~1 and train dominates at 2%/2% val/test
    assert abs(sum(r["doc_share"] for r in rows.values()) - 1.0) < 1e-5
    assert rows["train"]["n_docs"] > 900


def test_data_split_is_stable_under_resharding(spark):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit("w x y").alias("text")
    )
    a = {r["split"]: r["n_docs"] for r in corpusops.data_split(docs).collect()}
    b = {
        r["split"]: r["n_docs"]
        for r in corpusops.data_split(docs.repartition(17)).collect()
    }
    assert a == b


def test_mixture_weights_flatten_toward_uniform(spark):
    # web: 8 docs x 4 tokens = 32; book: 2 x 2 = 4. target = 18.
    rows = [(i, "a b c d", "web") for i in range(8)]
    rows += [(100 + i, "a b", "book") for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in corpusops.mixture_weights(docs).collect()}
    assert got["web"]["n_tokens"] == 32 and got["book"]["n_tokens"] == 4
    assert got["book"]["weight"] == 1.0  # under-represented: keep all
    import math

    want = math.floor(18.0 / 32.0 * 1e6 + 0.5) / 1e6
    assert got["web"]["weight"] == want


def test_doc_features_matches_standalone_operators(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog in the yard"),
            (2, "der hund und die katze ist ein tier"),
            (3, "contact user9@example.com or call (415) 555-0101 now"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    feats = {r["doc_id"]: r for r in textstats.doc_features(docs).collect()}
    langs = {
        r["doc_id"]: r["predicted_lang"]
        for r in textstats.language_id(docs).collect()
    }
    quals = {
        r["doc_id"]: r["quality"]
        for r in textstats.quality_scores(docs).collect()
    }
    toks = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in textstats.token_counts(docs).collect()
    }
    from blackedge_ocr_spark.analysis import scrub

    piis = {r["doc_id"]: r["n_pii"] for r in scrub.pii_scan(docs).collect()}
    for d, r in feats.items():
        assert r["lang"] == langs[d]
        assert r["quality"] == quals[d]
        assert (r["ws_tokens"], r["bpe_tokens"]) == toks[d]
        assert r["n_pii"] == piis[d]
    assert feats[2]["lang"] == "de" and feats[3]["n_pii"] == 2


def test_vocab_coverage_exact_small_vocab(spark):
    # counts: alpha 4, beta 2, gamma 1, zz 1. k=2 -> vocab {alpha,
    # beta} covers 6 of 8 tokens.
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta gamma"), (2, "alpha alpha beta zz")],
        "doc_id long, text string",
    )
    r = textstats.vocab_coverage(docs, k=2).collect()[0]
    assert (r["vocab_k"], r["total_tokens"], r["in_vocab_tokens"]) == (2, 8, 6)
    assert r["coverage"] == 0.75


def test_lm_scores_exact_micro_unit_logprobs(spark):
    # vocab (v=2, ties by term asc): a p=2/4, b p=1/4; c is OOV with
    # the 1/total floor (also 1/4 here).
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.lm_scores(docs, v=2).collect()}
    li = lambda p: math.floor(math.log(p) * 1e6 + 0.5)
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    assert got[1]["n_tokens"] == 3
    assert got[1]["lm_score"] == r6((2 * li(0.5) + li(0.25)) / (3 * 1e6))
    assert got[2]["n_tokens"] == 1  # OOV floor
    assert got[2]["lm_score"] == r6(li(1 / 4) / 1e6)
    assert got[3]["n_tokens"] == 0 and got[3]["lm_score"] == 0.0
    # higher-probability text scores higher (both are negative)
    assert got[1]["lm_score"] > got[2]["lm_score"]


def test_hex_threshold_saturates_at_one(spark):
    # frac >= 1 must map to the "g" sentinel (greater than every hex
    # digit) so `hash < threshold` keeps ALL rows; the unguarded lpad
    # used to TRUNCATE 0x1000000's 7 digits to a ~6% keep rate.
    d = spark.range(1).select(
        textstats.hex_threshold(F.lit(1.0), 6).alias("at_one"),
        textstats.hex_threshold(F.lit(1.5), 6).alias("above"),
        textstats.hex_threshold(F.lit(0.5), 6).alias("half"),
        textstats.hex_threshold(F.lit(0.0), 6).alias("zero"),
    )
    r = d.collect()[0]
    assert r["at_one"] == "g" and r["above"] == "g"
    assert r["half"] == "800000" and r["zero"] == "000000"
    assert "ffffff" < "g"  # every real 6-digit hash stays below "g"


def test_ws_tokens_col_empty_and_null_guard(spark):
    d = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, None), (4, "   "), (5, "one")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", textstats.ws_tokens_col(F.col("text")).alias("n")
        ).collect()
    }
    # normalize_text collapses/strips whitespace, so "   " counts 0
    assert got == {1: 2, 2: 0, 3: 0, 4: 0, 5: 1}


def test_lang_confusion_sums_and_diagonal(spark):
    """The confusion matrix partitions the corpus (cell counts sum to
    n_docs) and agrees cell-wise with language_id joined to truth."""
    import pyspark.sql.functions as F

    from blackedge_ocr_spark.analysis import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = textstats.lang_confusion(docs).collect()
    assert sum(r["n"] for r in m) == docs.count()
    # cross-check against the standalone prediction query
    pred = textstats.language_id(docs)
    joined = (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .count()
    )
    want = {(r["true_lang"], r["predicted_lang"]): r["count"]
            for r in joined.collect()}
    got = {(r["true_lang"], r["predicted_lang"]): r["n"] for r in m}
    assert got == want
