"""Semantics tests for analysis/bpe.py: the learned merge table and
the encode counts are checked against an independent pure-Python BPE
reference (the scan-and-skip loop of Sennrich et al. 2016) on crafted
and randomized corpora. Spark-vs-DuckDB value parity is covered by
the driver contract; these pin the MEANING."""

import random
from collections import Counter

from pyspark.sql import Row

from blackedge_ocr_spark.analysis import bpe


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows],
        "doc_id long, text string",
    )


def _py_tokens(text):
    # mirror functions.text.tokens on the ASCII inputs used here
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _py_apply(s, l, r):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _py_bpe(word_freq, n_merges):
    syms = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for w, f in word_freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                c[(a, b)] += f
        if not c:
            break
        (l, r), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, n))
        syms = {w: _py_apply(s, l, r) for w, s in syms.items()}
    return merges, syms


def _py_train_from_docs(texts, n_merges):
    wf = Counter(t for x in texts for t in _py_tokens(x))
    return _py_bpe(wf, n_merges), wf


def test_bpe_train_matches_reference_loop(spark):
    texts = [
        "the cat sat on the mat",
        "the thin cat then that",
        "",
        "aaaa abab the",
    ]
    d = _docs_df(spark, list(enumerate(texts)))
    got = [
        (r["lhs"], r["rhs"], r["n"])
        for r in bpe.bpe_train(d, 6).orderBy("rank").collect()
    ]
    (exp, _), _ = _py_train_from_docs(texts, 6)
    assert got == exp
    # the published non-overlap semantics: aaaa -> [aa, aa], not
    # [aa, a, a]; abab -> [ab, ab]
    assert ("a", "a", 3) in got  # 3 adjacencies counted, 2 merged


def test_bpe_encode_counts_and_fallback_free(spark):
    texts = ["the cat sat on the mat", "aaaa abab the", ""]
    d = _docs_df(spark, list(enumerate(texts)))
    out = {r["doc_id"]: r for r in bpe.bpe_encode(d, 6).collect()}
    (merges, syms), wf = _py_train_from_docs(texts, 6)
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["n_bpe"] == sum(len(syms[w]) for w in toks)
    assert out[2]["n_bpe"] == 0 and out[2]["syms_per_word"] == 0.0


def test_bpe_randomized_parity_with_reference(spark):
    rng = random.Random(42)
    alpha = "abcd"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
        for _ in range(60)
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        for _ in range(25)
    ]
    d = _docs_df(spark, list(enumerate(texts)))
    got = [
        (r["lhs"], r["rhs"], r["n"])
        for r in bpe.bpe_train(d, 6).orderBy("rank").collect()
    ]
    (exp, _), _ = _py_train_from_docs(texts, 6)
    assert got == exp


def test_bpe_encode_plan_broadcasts_vocab(spark):
    """The trained vocab must BROADCAST to the exploded corpus token
    stream (the corpus never shuffles for the join); one executed
    exchange total — the per-doc agg."""
    from blackedge_ocr_spark import plans

    d = _docs_df(spark, [(0, "the cat"), (1, "the mat")])
    df = bpe.bpe_encode(d, 2)
    plan = plans.formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plans.count_exchanges(df) == 1, plan


def test_bpe_oracle_survives_merge_exhaustion(spark):
    """A vocab that FULLY merges before N_MERGES (here: one distinct
    word 'ab', one merge, then zero pairs) must leave the oracle's
    later CTE stages as pass-throughs — not empty them via a cross
    join against the empty m{i}, which would collapse the encode
    vocab to the char-count fallback and report n_bpe=2 per 'ab'."""
    import duckdb
    import pandas as pd

    from blackedge_ocr_spark.sqloracle import sql_bpe_encode, sql_bpe_train

    texts = ["ab ab", "ab"]
    d = _docs_df(spark, list(enumerate(texts)))
    eng = {r["doc_id"]: r for r in bpe.bpe_encode(d).collect()}
    assert eng[0]["n_bpe"] == 2 and eng[1]["n_bpe"] == 1  # 1 sym/word

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [0, 1], "text": texts})
    )
    for _, r in con.sql(sql_bpe_encode()).df().iterrows():
        e = eng[r["doc_id"]]
        assert e["n_tokens"] == r["n_tokens"]
        assert e["n_bpe"] == r["n_bpe"]
        assert e["syms_per_word"] == r["syms_per_word"]

    tr = bpe.bpe_train(d).collect()
    otr = con.sql(sql_bpe_train()).df()
    assert len(tr) == len(otr) == 1  # both stop emitting at exhaustion
    assert (tr[0]["lhs"], tr[0]["rhs"], tr[0]["n"]) == ("a", "b", 3)
    assert (otr.iloc[0]["lhs"], otr.iloc[0]["rhs"], otr.iloc[0]["n"]) == (
        "a", "b", 3,
    )
