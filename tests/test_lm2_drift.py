"""Bigram LM scoring (textstats.lm2_scores) and per-source KL drift
(corpusops.source_drift) against pure-Python models."""

import math
import re
from collections import Counter

import pytest

from blackedge_ocr_spark.analysis.corpusops import KL_UNIT, source_drift
from blackedge_ocr_spark.analysis.textstats import (
    LM2_L0,
    LM2_L1,
    lm2_scores,
)


def py_tokens(text):
    # mirror of functions.text.tokens on plain-ascii lowercase input
    # (the crafted corpora below avoid the normalizer's edge cases)
    return re.findall(r"[a-z0-9]+", (text or "").lower())

DOCS = [
    # heavy bigram structure: "the cat" / "cat sat" repeat
    (1, "the cat sat. the cat sat. the cat sat. the cat sat."),
    # same unigrams, scrambled order — bigram model should rank it
    # below doc 1
    (2, "cat the sat cat. sat the the cat. sat sat cat the."),
    (3, "completely different words appear once here only today"),
    (4, ""),
    (5, "single"),
    (6, None),
]

SRC_DOCS = [
    # src_a and src_b share the corpus distribution; src_c skews
    (10, "alpha beta gamma alpha beta", "src_a"),
    (11, "alpha beta gamma alpha beta", "src_b"),
    (12, "zulu zulu zulu zulu yankee", "src_c"),
]


def _mic(x):
    return math.floor(x * 1e6 + 0.5)


def _model_lm2(texts, v=512):
    toks = {d: py_tokens(t or "") for d, t in texts}
    counts = Counter(t for ts in toks.values() for t in ts)
    tot = sum(counts.values())
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:v]
    )
    pairs = Counter(
        (ts[i - 1], ts[i])
        for ts in toks.values()
        for i in range(1, len(ts))
        if ts[i - 1] in vocab and ts[i] in vocab
    )
    out = {}
    for d, ts in toks.items():
        lis, hits = [], 0
        for i, w in enumerate(ts):
            p_uni = counts[w] / tot if w in vocab else None
            if i == 0:
                lis.append(
                    _mic(math.log(p_uni if p_uni else 1.0 / tot))
                )
                continue
            pair = (ts[i - 1], w)
            if pair in pairs:
                hits += 1
                lis.append(
                    _mic(
                        math.log(
                            LM2_L1 * (pairs[pair] / counts[ts[i - 1]])
                            + LM2_L0 * (counts[w] / tot)
                        )
                    )
                )
            elif p_uni is not None:
                lis.append(_mic(math.log(LM2_L0 * p_uni)))
            else:
                lis.append(_mic(math.log(LM2_L0 * (1.0 / tot))))
        n = len(ts)
        score = (
            math.floor(sum(lis) / (n * 1e6) * 1e6 + 0.5) / 1e6
            if n
            else 0.0
        )
        out[d] = (n, hits, score)
    return out


@pytest.fixture(scope="module")
def lm2(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r for r in lm2_scores(df).collect()
    }


def test_lm2_matches_python_model(lm2):
    want = _model_lm2(DOCS)
    for d, (n, hits, score) in want.items():
        r = lm2[d]
        assert r["n_tokens"] == n, d
        assert r["n_pair_hits"] == hits, d
        assert abs(r["lm2_score"] - score) < 5e-7, (d, r["lm2_score"], score)


def test_lm2_semantics(lm2):
    # repeated bigrams score above the scrambled same-unigram doc
    assert lm2[1]["lm2_score"] > lm2[2]["lm2_score"]
    # a one-token doc has no pair hits and a pure-unigram score
    assert lm2[5]["n_pair_hits"] == 0
    # empty/None docs survive with score 0
    assert lm2[4]["lm2_score"] == 0.0 and lm2[6]["lm2_score"] == 0.0


def test_source_drift(spark):
    df = spark.createDataFrame(
        SRC_DOCS, "doc_id long, text string, source string"
    )
    got = {r["source"]: r for r in source_drift(df).collect()}
    # python model
    toks = {
        s: [t for d, txt, src in SRC_DOCS if src == s
            for t in py_tokens(txt)]
        for s in ("src_a", "src_b", "src_c")
    }
    allc = Counter(t for ts in toks.values() for t in ts)
    nt = sum(allc.values())
    for s, ts in toks.items():
        c = Counter(ts)
        ns = len(ts)
        kl = sum(
            math.floor(
                (n / ns) * math.log((n / ns) / (allc[t] / nt)) * KL_UNIT
                + 0.5
            )
            for t, n in c.items()
        )
        want = math.floor(kl / KL_UNIT * 1e6 + 0.5) / 1e6
        assert abs(got[s]["kl_nats"] - want) < 5e-7, s
        assert got[s]["n_tokens"] == ns
        assert got[s]["n_terms"] == len(c)
    # the skewed source drifts far more than the two mirrored ones
    assert got["src_c"]["kl_nats"] > got["src_a"]["kl_nats"]
    assert got["src_a"]["kl_nats"] == got["src_b"]["kl_nats"]
