"""Semantics tests for analysis/corpusops.py on crafted corpora
(the Spark-vs-DuckDB value parity is covered by the driver contract;
these pin the intended MEANING of each operator)."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis import corpusops


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )


def test_dup_ngram_stats_shared_and_unique(spark):
    # doc 0 and doc 1 share exactly the trigram "a b c"; doc 2 shares
    # nothing; doc 3 is empty (no grams).
    d = _docs_df(
        spark,
        [
            (0, "a b c d", "s"),  # grams: "a b c", "b c d"
            (1, "x a b c", "s"),  # grams: "x a b", "a b c"
            (2, "p q r", "s"),  # gram: "p q r"
            (3, "", "s"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in corpusops.dup_ngram_stats(d).collect()
    }
    assert out[0]["n_grams"] == 2 and out[0]["dup_grams"] == 1
    assert out[0]["dup_frac"] == 0.5
    assert out[1]["n_grams"] == 2 and out[1]["dup_grams"] == 1
    assert out[2]["n_grams"] == 1 and out[2]["dup_grams"] == 0
    assert out[2]["dup_frac"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["dup_frac"] == 0.0


def test_dup_ngram_within_doc_repeat_is_not_corpus_dup(spark):
    # A trigram repeated WITHIN one doc (distinct-per-doc grams)
    # counts once — only cross-document repetition marks it dup.
    d = _docs_df(spark, [(0, "a b c a b c", "s"), (1, "z z y", "s")])
    out = {r["doc_id"]: r for r in corpusops.dup_ngram_stats(d).collect()}
    assert out[0]["dup_grams"] == 0


def test_decontaminate_flags_only_overlapping_train_docs(spark):
    # doc 0 (doc_id % 50 == 0) is the benchmark; doc 1 shares its
    # trigram, doc 2 does not; benchmark docs never self-report.
    d = _docs_df(
        spark,
        [
            (0, "a b c d", "s"),
            (1, "a b c zz", "s"),  # shares "a b c"
            (2, "p q r t", "s"),
            (50, "m n o", "s"),  # second benchmark doc
            (51, "m n o", "s"),  # shares all of doc 50
        ],
    )
    out = {r["doc_id"]: r["n_shared"] for r in corpusops.decontaminate(d).collect()}
    assert out == {1: 1, 51: 1}  # doc 51 shares the single gram "m n o"


def test_corpus_sample_matches_python_md5(spark):
    rows = [(i, f"text {i}", "src" + str(i % 3)) for i in range(200)]
    d = _docs_df(spark, rows)
    out = {r["source"]: r for r in corpusops.corpus_sample(d).collect()}
    for src in {s for _, _, s in rows}:
        ids = [i for i, _, s in rows if s == src]
        kept = sum(
            1
            for i in ids
            if hashlib.md5(str(i).encode()).hexdigest()[:2]
            < corpusops.SAMPLE_HEX_LT
        )
        assert out[src]["n_docs"] == len(ids)
        assert out[src]["n_kept"] == kept


def test_token_packing_shard_boundaries(spark):
    # cap=5 tokens; per-source contiguous fill in doc_id order:
    # doc 0 (3 tok, before=0 -> shard 0), doc 1 (3 tok, before=3 ->
    # shard 0), doc 2 (4 tok, before=6 -> shard 1).
    d = _docs_df(
        spark,
        [
            (0, "a b c", "s"),
            (1, "d e f", "s"),
            (2, "g h i j", "s"),
            (3, "k l", "other"),
        ],
    )
    out = corpusops.token_packing(d, cap=5)
    got = {
        (r["source"], r["shard"]): (r["n_docs"], r["shard_tokens"])
        for r in out.collect()
    }
    assert got == {
        ("s", 0): (2, 6),
        ("s", 1): (1, 4),
        ("other", 0): (1, 2),
    }


def test_token_packing_mega_doc_owns_boundary(spark):
    # A doc larger than cap lands in the shard where its prefix-sum
    # starts (contiguous fill, documented): doc 0 has 7 tokens
    # (before=0 -> shard 0), doc 1 starts at 7 -> shard 1.
    d = _docs_df(spark, [(0, "a b c d e f g", "s"), (1, "h i", "s")])
    got = {
        r["shard"]: r["n_docs"]
        for r in corpusops.token_packing(d, cap=5).collect()
    }
    assert got == {0: 1, 1: 1}


def test_token_packing_2p_equals_single_phase(spark):
    # bucket_ids=4 forces many phase-1 buckets and bucket-boundary
    # merges; varied token counts make shard boundaries land both
    # inside and across buckets.
    rows = [
        (i, " ".join(["w"] * ((i * 7) % 11 + 1)), "src" + str(i % 3))
        for i in range(100)
    ]
    d = _docs_df(spark, rows)
    one = {
        (r["source"], r["shard"]): (r["n_docs"], r["shard_tokens"])
        for r in corpusops.token_packing(d, cap=16).collect()
    }
    two = {
        (r["source"], r["shard"]): (r["n_docs"], r["shard_tokens"])
        for r in corpusops.token_packing_2p(d, cap=16, bucket_ids=4).collect()
    }
    assert one == two


def test_sample_predicate_is_deterministic(spark):
    d = _docs_df(spark, [(i, "t", "s") for i in range(64)])
    a = corpusops.corpus_sample(d).collect()
    b = corpusops.corpus_sample(d).collect()
    assert a == b
