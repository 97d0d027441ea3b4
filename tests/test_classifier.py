"""Trainable quality classifier: exact parity with a pure-Python GD
mirror, plus learning-direction sanity (separable corpus → positive
docs score higher after training).
"""

from __future__ import annotations

import math

from blackedge_ocr_spark.analysis.classifier import (
    LR_ITERS,
    LR_RATE,
    LR_X1_SCALE,
    train_quality_classifier,
)


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _py_quality(text: str) -> float:
    toks = text.lower().split()
    n = len(toks)
    if n == 0:
        return 0.0
    stopwords = {"the", "a", "and", "of", "to", "is", "in"}
    stop = sum(1 for t in toks if t in stopwords)
    mean_len = sum(len(t) for t in toks) / n
    return _r6(
        0.5 * min(n / 50.0, 1.0)
        + 0.3 * (stop / n)
        + 0.2 * min(mean_len / 8.0, 1.0)
    )


def _py_train(feats, iters=LR_ITERS, lr=LR_RATE):
    w = [0, 0, 0]  # micro-unit longs
    n = len(feats)
    for _ in range(iters):
        g = [0, 0, 0]
        for y, x1, x2 in feats:
            z = w[0] / 1e6 + w[1] / 1e6 * x1 + w[2] / 1e6 * x2
            p = 1.0 / (1.0 + math.exp(-z))
            for j, xj in enumerate((1.0, x1, x2)):
                g[j] += math.floor(((p - y) * xj) * 1e6 + 0.5)
        w = [
            w[j] - math.floor(lr * (g[j] / n) + 0.5)
            for j in range(3)
        ]
    return w


def test_classifier_matches_python_mirror(spark):
    # ascii stopword-bearing texts → predict_lang and quality are
    # mirrorable with plain python; 'en' docs are the positives.
    corpus = {
        1: "the cat is in the hat and the dog is in the house",
        2: "der hund ist ein tier und die katze ist ein tier",
        3: "the quick brown fox jumps over the lazy dog again",
        4: "la casa es un lugar y el perro es un animal",
        5: "",
        6: "one two three four five six seven eight nine ten",
    }
    d = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["label"], r["score"])
        for r in train_quality_classifier(d).collect()
    }
    en = {"the", "a", "and", "of", "to", "is", "in"}
    de = {"der", "die", "das", "und", "ist", "ein"}
    es = {"el", "la", "los", "y", "es", "un"}
    fr = {"le", "la", "les", "et", "est", "un"}

    def label(text):
        toks = text.lower().split()
        scores = [
            sum(1 for t in toks if t in ws) for ws in (en, de, es, fr)
        ]
        # en wins ties (profile priority); all-zero → not en
        return 1.0 if scores[0] > 0 and scores[0] >= max(scores) else 0.0

    feats = {}
    for i, text in corpus.items():
        n_tok = 0 if not text.split() else len(text.split())
        feats[i] = (
            label(text),
            min(n_tok / LR_X1_SCALE, 1.0),
            _py_quality(text),
        )
    w = _py_train(list(feats.values()))
    for i, (y, x1, x2) in feats.items():
        z = w[0] / 1e6 + w[1] / 1e6 * x1 + w[2] / 1e6 * x2
        p = 1.0 / (1.0 + math.exp(-z))
        assert got[i] == (int(y), _r6(p)), i
    # learning direction: every 'en' doc outscores every non-'en' doc
    pos = [s for lab, s in got.values() if lab == 1]
    neg = [s for lab, s in got.values() if lab == 0]
    assert pos and neg and min(pos) > max(neg)


def test_classifier_fixed_point_at_balanced_start(spark):
    # one positive + one negative with IDENTICAL features (same token
    # count, same en-stopword count, same mean word length — doc 2 is
    # labelled 'de' because two de-stopwords outvote the one 'the'):
    # gradients cancel exactly, weights stay 0, both score 0.5.
    d = spark.createDataFrame(
        [(1, "the cat fox dog"), (2, "the der und cat")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in train_quality_classifier(d).collect()}
    assert rows[1]["label"] == 1 and rows[2]["label"] == 0
    assert rows[1]["score"] == 0.5 and rows[2]["score"] == 0.5
