"""BM25 retrieval and PMI collocation: values vs an independent
pure-Python mirror, plus the shape contracts (rank density, bounds).
"""

from __future__ import annotations

import math
import re

from blackedge_ocr_spark.analysis import retrieval, textstats


def _py_tokens(text: str) -> list[str]:
    # mirror of functions.text.tokens over simple ascii inputs
    return re.findall(r"[a-z0-9]+", text.lower())


def _py_bm25(corpus: dict[int, str], queries: dict[int, list[str]], k1, b):
    post = {}
    for d, text in corpus.items():
        for t in _py_tokens(text):
            post.setdefault(d, {}).setdefault(t, 0)
            post[d][t] += 1
    dlen = {d: sum(tfs.values()) for d, tfs in post.items() if tfs}
    post = {d: tfs for d, tfs in post.items() if tfs}
    n = len(dlen)
    avg = sum(dlen.values()) / n
    out = {}
    for qid, terms in queries.items():
        for t in terms:
            df = sum(1 for tfs in post.values() if t in tfs)
            if df == 0:
                continue
            idf_u = math.floor(
                math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5
            )
            for d, tfs in post.items():
                if t not in tfs:
                    continue
                tf = tfs[t]
                denom = tf + k1 * (1 - b + b * dlen[d] / avg)
                part = math.floor(idf_u * (tf * (k1 + 1.0) / denom) + 0.5)
                out[(qid, d)] = out.get((qid, d), 0) + part
    return {kk: v / 1e6 for kk, v in out.items()}


def test_bm25_matches_python_mirror(spark):
    # query docs: doc_id % BM25_QRY_MOD == BM25_QRY_ADD → id 7 here.
    corpus = {
        7: "apple banana cherry",  # the query doc
        1: "apple apple apple apple",  # high tf, short
        2: "apple banana apple banana cherry date elder fig grape",
        3: "date elder fig",  # no query terms
        4: "cherry",  # single-token doc
    }
    d = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in retrieval.bm25_topk(d).collect()
    }
    want = _py_bm25(
        corpus,
        {7: sorted({"apple", "banana", "cherry"})[: retrieval.BM25_QRY_TERMS]},
        retrieval.BM25_K1,
        retrieval.BM25_B,
    )
    assert set(got) == set(want)  # doc 3 never scores
    for key, score in want.items():
        assert got[key][1] == score
    # ranks are dense 1..n ordered by score desc then doc_id
    ranked = sorted(got.values())
    assert [r for r, _ in ranked] == list(range(1, len(got) + 1))
    scores = [v[1] for _, v in sorted(got.items(), key=lambda kv: kv[1][0])]
    assert scores == sorted(scores, reverse=True)
    # the query doc matches all three terms: it must rank first
    assert got[(7, 7)][0] == 1


def test_bm25_no_queries_yields_empty(spark):
    d = spark.createDataFrame(
        [(1, "apple"), (2, "banana")], "doc_id long, text string"
    )
    assert retrieval.bm25_topk(d).count() == 0


def test_cooccur_pmi_counts_and_values(spark):
    # w=2 forward pairs of "a b c a b": (a,b)x2 (a,c) (b,c) (b,a)
    # (c,a) (c,b) — 7 pairs total; unigrams a:2 b:2 c:1, 5 tokens.
    d = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id long, text string"
    )
    rows = textstats.cooccur_pmi(d, w=2, min_pair=1, k=100).collect()
    got = {(r["term_a"], r["term_b"]): (r["n_pair"], r["pmi"]) for r in rows}
    counts = {
        ("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1,
        ("b", "a"): 1, ("c", "a"): 1, ("c", "b"): 1,
    }
    assert {k: v[0] for k, v in got.items()} == counts
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    for (a, b), n in counts.items():
        uni = {"a": 2, "b": 2, "c": 1}
        want = r6(math.log((n / 7) / ((uni[a] / 5) * (uni[b] / 5))))
        assert got[(a, b)][1] == want, (a, b)


def test_cooccur_pmi_min_pair_and_topk_bound(spark):
    d = spark.createDataFrame(
        [(i, "x y x y z q") for i in range(10)], "doc_id long, text string"
    )
    rows = textstats.cooccur_pmi(d, w=1, min_pair=10, k=2).collect()
    # adjacent pairs per doc: (x,y) (y,x) (x,y) (y,z) (z,q) → x10 docs
    # min_pair=10 keeps all five kinds; k=2 keeps the top two by
    # count desc then (a, b) asc → (x,y) n=20, then (y,x) n=10
    got = [(r["term_a"], r["term_b"], r["n_pair"]) for r in rows]
    assert sorted(got) == [("x", "y", 20), ("y", "x", 10)]


def test_cooccur_and_bm25_random_parity(spark):
    # Randomized ascii word-soup corpus vs the pure-Python mirrors —
    # pins the windowed pair generation and the postings/df/idf
    # arithmetic on larger, unstructured input (the adversarial
    # unicode tokenizer edge cases live in test_random_parity).
    import random
    from collections import Counter

    rng = random.Random(20260819)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    corpus = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for i in range(120)
    }
    d = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )

    # --- cooccur_pmi ---
    w, min_pair, k = 2, 3, 25
    pair_c, uni_c = Counter(), Counter()
    for text in corpus.values():
        toks = _py_tokens(text)
        uni_c.update(toks)
        for i, t in enumerate(toks):
            for u in toks[i + 1 : i + 1 + w]:
                pair_c[(t, u)] += 1
    np_, nt = sum(pair_c.values()), sum(uni_c.values())
    sel = sorted(
        (p for p in pair_c.items() if p[1] >= min_pair),
        key=lambda kv: (-kv[1], kv[0]),
    )[:k]
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    want = {
        (a, b): (n, r6(math.log((n / np_) / ((uni_c[a] / nt) * (uni_c[b] / nt)))))
        for (a, b), n in sel
    }
    got = {
        (r["term_a"], r["term_b"]): (r["n_pair"], r["pmi"])
        for r in textstats.cooccur_pmi(d, w=w, min_pair=min_pair, k=k).collect()
    }
    assert got == want

    # --- bm25_topk: scores match for every emitted (query, doc) ---
    queries = {
        i: sorted(
            {t for t in _py_tokens(text) if len(t) >= 3}
        )[: retrieval.BM25_QRY_TERMS]
        for i, text in corpus.items()
        if i % retrieval.BM25_QRY_MOD == retrieval.BM25_QRY_ADD
    }
    want_scores = _py_bm25(
        corpus, queries, retrieval.BM25_K1, retrieval.BM25_B
    )
    rows = retrieval.bm25_topk(d).collect()
    assert rows, "query docs exist by construction"
    for r in rows:
        assert r["score"] == want_scores[(r["query_id"], r["doc_id"])]
    # per-query: emitted set = top-k of the mirror with the same
    # (score desc, doc_id asc) tie-break
    by_q = {}
    for (qid, doc), s in want_scores.items():
        by_q.setdefault(qid, []).append((-s, doc))
    for qid, lst in by_q.items():
        topk = [doc for _, doc in sorted(lst)[: retrieval.BM25_TOP_K]]
        got_docs = [
            r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])
            if r["query_id"] == qid
        ]
        assert got_docs == topk, qid


def test_bm25_indexed_matches_direct_and_prunes_shards(spark, tmp_path):
    """bm25_topk_indexed over a write_postings_index table must equal
    bm25_topk(docs, queries=...) row-for-row, and its postings scan
    must be partition-pruned to the shards owning query terms
    (round-5 sf100 item: the reusable on-disk index form)."""
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    q = retrieval.query_set(d)
    path = str(tmp_path / "bmix")
    retrieval.write_postings_index(d, path)

    direct = sorted(
        map(tuple, retrieval.bm25_topk(d, queries=q).collect())
    )
    indexed = sorted(
        map(tuple, retrieval.bm25_topk_indexed(spark, path, q).collect())
    )
    assert indexed == direct and len(direct) > 0

    # pruning: with a single-term query the scan touches exactly the
    # one shard owning that term — the shard filter must appear as a
    # PartitionFilter in the postings scan node (same proof shape as
    # the IVF index pruning test)
    one = q.limit(1)
    term = one.collect()[0]["term"]
    owned = spark.createDataFrame([(term,)], "term string").select(
        retrieval._term_shard(F.col("term"), retrieval.POSTINGS_SHARDS)
        .alias("s")
    ).collect()[0]["s"]
    from blackedge_ocr_spark import plans

    fp = plans.formatted_plan(retrieval.bm25_topk_indexed(spark, path, one))
    assert "PartitionFilters" in fp
    assert re.search(rf"shard#\d+ IN \({owned}\)", fp) or re.search(
        rf"shard#\d+ = {owned}", fp
    ), fp[:4000]


def test_bm25_sharded_matches_direct(spark, tmp_path):
    """bm25_topk_sharded (query-range loop, bounded scratch) must
    union to EXACTLY bm25_topk's rows — queries are independent in
    BM25, so sharding them changes nothing. Also pins the
    loop-built index (loop_groups>1) against the one-pass build."""
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    q = retrieval.query_set(d)
    direct = sorted(map(tuple, retrieval.bm25_topk(d, queries=q).collect()))
    sharded = sorted(
        map(
            tuple,
            retrieval.bm25_topk_sharded(
                d, q, str(tmp_path / "scratch"), shards=3
            ).collect(),
        )
    )
    assert sharded == direct and len(direct) > 0

    # loop-built index == one-pass index, and sharded-over-index ==
    # direct too
    p1, p2 = str(tmp_path / "ix1"), str(tmp_path / "ix2")
    retrieval.write_postings_index(d, p1)
    retrieval.write_postings_index(d, p2, loop_groups=4)
    a = sorted(
        map(tuple, spark.read.parquet(f"{p1}/postings").collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(f"{p2}/postings").collect())
    )
    assert a == b
    via_ix = sorted(
        map(
            tuple,
            retrieval.bm25_topk_sharded(
                d, q, str(tmp_path / "scr2"), shards=2, index_path=p2
            ).collect(),
        )
    )
    assert via_ix == direct
