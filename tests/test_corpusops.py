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


# ------------------------------------------------------------------
# corpus_shuffle / doc_chunks / lang_rebalance / top_terms
# ------------------------------------------------------------------


def test_corpus_shuffle_pos_is_permutation_within_shard(spark):
    d = _docs_df(spark, [(i, f"doc {i}", "s") for i in range(300)])
    out = corpusops.corpus_shuffle(d).collect()
    assert len(out) == 300
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_corpus_shuffle_two_phase_equals_one_window_rank(spark):
    from pyspark.sql import Window

    d = _docs_df(spark, [(i, f"doc {i}", "s") for i in range(200)])
    key = corpusops._shuffle_key(F.col("doc_id"))
    w = Window.partitionBy(F.substring(key, 1, 2)).orderBy(
        key, F.col("doc_id")
    )
    oracle = d.select(
        "doc_id",
        F.substring(key, 1, 2).alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )
    assert corpusops.corpus_shuffle(d).exceptAll(oracle).count() == 0


def test_corpus_shuffle_order_is_seeded_not_input_order(spark):
    # Reversing input row order must not change any assignment.
    rows = [(i, f"doc {i}", "s") for i in range(100)]
    a = corpusops.corpus_shuffle(_docs_df(spark, rows)).collect()
    b = corpusops.corpus_shuffle(_docs_df(spark, rows[::-1])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_doc_chunks_boundaries_and_overlap(spark):
    # 113 tokens -> 3 chunks: [0:64], [48:112], [96:113].
    toks = [f"t{i:03d}" for i in range(113)]
    d = _docs_df(spark, [(0, " ".join(toks), "s"), (1, "", "s")])
    out = sorted(
        corpusops.doc_chunks(d).collect(), key=lambda r: r["chunk_id"]
    )
    assert [r["chunk_id"] for r in out] == [0, 1, 2]
    assert [r["n_toks"] for r in out] == [64, 64, 17]
    exp = lambda lo, hi: hashlib.md5(
        " ".join(toks[lo:hi]).encode()
    ).hexdigest()
    assert out[0]["chunk_md5"] == exp(0, 64)
    assert out[1]["chunk_md5"] == exp(48, 112)
    assert out[2]["chunk_md5"] == exp(96, 113)


def test_doc_chunks_short_doc_single_chunk(spark):
    d = _docs_df(spark, [(0, "alpha beta", "s")])
    out = corpusops.doc_chunks(d).collect()
    assert len(out) == 1
    assert out[0]["chunk_id"] == 0 and out[0]["n_toks"] == 2
    assert (
        out[0]["chunk_md5"]
        == hashlib.md5(b"alpha beta").hexdigest()
    )


def test_doc_chunks_exact_width_no_spill_chunk(spark):
    toks = " ".join(f"t{i}" for i in range(corpusops.CHUNK_TOKENS))
    d = _docs_df(spark, [(0, toks, "s")])
    assert corpusops.doc_chunks(d).count() == 1


def test_lang_rebalance_caps_hot_language_keeps_small_one(spark):
    # 400 English docs vs 8 unknown-language docs; 2 langs ->
    # cap = 408 // 8 = 51: en subsampled to ~cap, und kept whole.
    en = [(i, "the quick fox and the lazy dog with", "s") for i in range(400)]
    und = [(1000 + i, "zz qq xx", "s") for i in range(8)]
    out = {
        r["lang"]: r
        for r in corpusops.lang_rebalance(_docs_df(spark, en + und)).collect()
    }
    assert out["und"]["n_kept"] == 8 and out["und"]["kept_frac"] == 1.0
    cap = 408 // (corpusops.REBALANCE_DIVISOR * 2)
    assert out["en"]["n_docs"] == 400
    # binomial around cap=51 at rate 51/400: generous 3-sigma band
    assert cap - 21 <= out["en"]["n_kept"] <= cap + 24
    # deterministic: bit-identical on rerun
    again = {
        r["lang"]: r["n_kept"]
        for r in corpusops.lang_rebalance(_docs_df(spark, en + und)).collect()
    }
    assert again["en"] == out["en"]["n_kept"]


def test_top_terms_order_and_tiebreak(spark):
    from blackedge_ocr_spark.analysis.textstats import top_terms

    d = _docs_df(
        spark,
        [
            (0, "apple apple banana cherry", "s"),
            (1, "banana apple date", "s"),
        ],
    )
    out = [(r["term"], r["n"]) for r in top_terms(d).collect()]
    # apple x3, banana x2, then count-1 terms tie-broken alphabetically
    assert out == [
        ("apple", 3),
        ("banana", 2),
        ("cherry", 1),
        ("date", 1),
    ]


def test_span_packing_budget_boundaries_and_media_cost(spark):
    # Hand-built interleaved spans: budget 120, image cost 16.
    # costs: 100 (text) -> seq 0 (cum_before 0); 16 (image) -> seq 0
    # (cum_before 100); 30 (text) -> seq 0 (cum_before 116 < 120);
    # 16 (image) -> seq 1 (cum_before 146); 200 (text) -> seq 1
    # (cum_before 162); next -> seq 3 (cum_before 362).
    span = lambda off, kind, words: {
        "kind": kind,
        "text": " ".join(f"w{i}" for i in range(words)) if words else "",
        "media_ref": f"m-{off}" if kind == "image" else "",
        "offset": off,
    }
    rows = [
        {
            "doc_id": 1,
            "spans": [
                span(0, "text", 100),
                span(1, "image", 0),
                span(2, "text", 30),
                span(3, "image", 0),
                span(4, "text", 200),
                span(5, "text", 5),
            ],
        }
    ]
    d = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = {
        r["seq_id"]: r for r in corpusops.span_packing(d).collect()
    }
    assert out[0]["n_spans"] == 3 and out[0]["n_media"] == 1
    assert out[0]["seq_tokens"] == 100 + 16 + 30
    assert out[1]["n_spans"] == 2 and out[1]["n_media"] == 1
    assert out[1]["seq_tokens"] == 16 + 200
    assert out[3]["n_spans"] == 1 and out[3]["seq_tokens"] == 5
    assert sorted(out) == [0, 1, 3]


def test_span_packing_restores_scrambled_span_order(spark):
    # Same spans stored in scrambled order must pack identically —
    # the window orders by offset, not storage order.
    span = lambda off, words: {
        "kind": "text",
        "text": " ".join(f"w{i}" for i in range(words)),
        "media_ref": "",
        "offset": off,
    }
    ordered = [span(i, 60) for i in range(4)]
    schema = (
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    a = spark.createDataFrame([{"doc_id": 1, "spans": ordered}], schema)
    b = spark.createDataFrame(
        [{"doc_id": 1, "spans": ordered[::-1]}], schema
    )
    ra = sorted(map(tuple, corpusops.span_packing(a).collect()))
    rb = sorted(map(tuple, corpusops.span_packing(b).collect()))
    assert ra == rb and len(ra) == 2


def test_span_packing_page_kind_and_empty_span_cost(spark):
    # A scanned-'page' span is media (MEDIA_KINDS contract): fixed
    # IMG_TOKEN_COST, counted in n_media. An empty text span costs 0
    # (split('') is [''] — the naive size() would charge 1).
    span = lambda off, kind, text: {
        "kind": kind,
        "text": text,
        "media_ref": f"m-{off}" if kind in ("image", "page") else "",
        "offset": off,
    }
    d = spark.createDataFrame(
        [
            {
                "doc_id": 1,
                "spans": [
                    span(0, "text", "a b c"),
                    span(1, "page", ""),
                    span(2, "text", ""),
                    span(3, "image", ""),
                ],
            }
        ],
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = corpusops.span_packing(d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_spans"] == 4 and r["n_media"] == 2
    # 3 words + 16 (page) + 0 (empty text) + 16 (image)
    assert r["seq_tokens"] == 3 + 16 + 0 + 16
