"""Gopher A1.2 repetition battery (textstats.gopher_repetition)
against crafted fixtures and a pure-Python model."""

from collections import Counter

import pytest

from blackedge_ocr_spark.analysis.textstats import (
    REP_MAX_DUP_LINE_CHAR_FRAC,
    REP_MAX_DUP_LINE_FRAC,
    REP_MAX_DUP_NGRAM_FRAC,
    REP_MAX_DUP_PARA_CHAR_FRAC,
    REP_MAX_DUP_PARA_FRAC,
    REP_MAX_TOP_NGRAM_FRAC,
    gopher_repetition,
)


def _units(text, sep):
    # trim() in BOTH engines strips the space character only — a
    # tab-only line survives as a unit (mirrored deliberately)
    return [
        u for u in (s.strip(" ") for s in text.split(sep)) if u != ""
    ]


def _unit_stats(units):
    c = Counter(units)
    m = len(units)
    d = sum(v - 1 for v in c.values())
    dc = sum((v - 1) * len(u) for u, v in c.items())
    tc = sum(len(u) for u in units)
    return m, _frac(d, m), _frac(dc, tc)


def _frac(n, d):
    return n / d if d else 0.0


def _grams(words, n):
    return [
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    ]


def _top_frac(words, n, t):
    c = Counter(_grams(words, n))
    if not c:
        return 0.0
    top = max((cnt, len(g)) for g, cnt in c.items())
    return _frac(top[0] * top[1], t)


def _cov_frac(words, n, t):
    c = Counter(_grams(words, n))
    covered = set()
    for i, g in enumerate(_grams(words, n)):
        if c[g] >= 2:
            covered.update(range(i, i + n))
    if not covered:
        return 0.0
    # char coverage of the merged word-index runs over the
    # space-joined text
    runs, s = [], None
    prev = None
    for i in sorted(covered):
        if prev is None or i > prev + 1:
            if prev is not None:
                runs.append((s, prev + 1))
            s = i
        prev = i
    runs.append((s, prev + 1))
    chars = sum(
        sum(len(w) for w in words[a:b]) + (b - a - 1) for a, b in runs
    )
    return _frac(chars, t)


def _model(text):
    text = text or ""
    words = text.split()
    t = sum(len(w) for w in words) + max(len(words) - 1, 0)
    nl, dlf, dlcf = _unit_stats(_units(text, "\n"))
    np_, dpf, dpcf = _unit_stats(_units(text, "\n\n"))
    out = {
        "n_words": len(words),
        "n_lines": nl,
        "n_paras": np_,
        "dup_line_frac": dlf,
        "dup_para_frac": dpf,
        "dup_line_char_frac": dlcf,
        "dup_para_char_frac": dpcf,
    }
    for n in REP_MAX_TOP_NGRAM_FRAC:
        out[f"top_{n}gram_frac"] = _top_frac(words, n, t)
    for n in REP_MAX_DUP_NGRAM_FRAC:
        out[f"dup_{n}gram_frac"] = _cov_frac(words, n, t)
    thr = {
        "dup_line_frac": REP_MAX_DUP_LINE_FRAC,
        "dup_para_frac": REP_MAX_DUP_PARA_FRAC,
        "dup_line_char_frac": REP_MAX_DUP_LINE_CHAR_FRAC,
        "dup_para_char_frac": REP_MAX_DUP_PARA_CHAR_FRAC,
        **{
            f"top_{n}gram_frac": v
            for n, v in REP_MAX_TOP_NGRAM_FRAC.items()
        },
        **{
            f"dup_{n}gram_frac": v
            for n, v in REP_MAX_DUP_NGRAM_FRAC.items()
        },
    }
    out["rep_pass"] = all(out[k] <= v for k, v in thr.items())
    return out


DOCS = [
    # 3 identical lines + one unique — line dup rules fire
    (1, "alpha beta gamma one.\nalpha beta gamma one.\n"
        "alpha beta gamma one.\nsomething quite different here."),
    # duplicated paragraph
    (2, "one two three four.\n\none two three four.\n\nfive six."),
    # hot bigram: overlapping occurrences (mass ratio may exceed 1)
    (3, "tick tock " * 10 + "end."),
    # 7-word phrase repeated — dup 5/6/7-gram coverage fires
    (4, "one two three four five six seven. " * 4 + "plain tail."),
    # repeated phrase with a gap between repeats (two merged runs)
    (5, "aa bb cc dd ee ff. " + "x y z. " + "aa bb cc dd ee ff. "
        "completely different closing words go right here now."),
    (6, ""),
    (7, None),
    # below every gram width
    (8, "four plain words only"),
    # whitespace-only lines must vanish as units
    (9, "line one here.\n   \n\t\nline one here.\n"),
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition(df).collect()
    }


def test_matches_python_model(result):
    for doc_id, text in DOCS:
        want = _model(text)
        got = result[doc_id]
        for k, v in want.items():
            if isinstance(v, float):
                assert abs(got[k] - v) < 5e-7, (doc_id, k, got[k], v)
            else:
                assert got[k] == v, (doc_id, k, got[k], v)


def test_flags_match_thresholds(result):
    for doc_id, text in DOCS:
        want = _model(text)
        got = result[doc_id]
        assert got["r_dup_line"] == (
            want["dup_line_frac"] <= REP_MAX_DUP_LINE_FRAC
        )
        for n, thr in REP_MAX_DUP_NGRAM_FRAC.items():
            assert got[f"r_dup_{n}gram"] == (
                want[f"dup_{n}gram_frac"] <= thr
            ), (doc_id, n)


def test_specific_semantics(result):
    # doc 1: 2 of 4 lines are duplicates-after-first
    assert result[1]["dup_line_frac"] == 0.5
    assert not result[1]["rep_pass"]
    # doc 2: one duplicated paragraph of three
    assert abs(result[2]["dup_para_frac"] - 1 / 3) < 5e-7
    # doc 3: overlapping "tick tock tick" grams — mass ratio > 1 is
    # the published definition's own artifact, not an error
    assert result[3]["top_3gram_frac"] > 1.0
    assert not result[3]["rep_pass"]
    # doc 4 fails the 5..7-gram coverage rules
    assert not result[4]["r_dup_5gram"]
    # doc 5: gap between repeats -> two merged runs, coverage < 1
    assert 0.0 < result[5]["dup_5gram_frac"] < 1.0
    # empty/None docs pass everything
    assert result[6]["rep_pass"] and result[7]["rep_pass"]
    # a tiny doc fails the top-gram rules naturally (one occurrence
    # of the longest bigram already exceeds 20% of 4 words) — the
    # paper applies A1.2 after the A1.1 50-word minimum
    assert not result[8]["r_top_2gram"]
    assert result[8]["r_dup_5gram"]
    # space-only lines are not units; the tab-only line IS one
    # (trim strips spaces only in both engines)
    assert result[9]["n_lines"] == 3
    assert abs(result[9]["dup_line_frac"] - 1 / 3) < 5e-7
