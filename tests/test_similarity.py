"""Similarity vectors from the reference's test suite
(tests/unit/services/validation/test_similarity_calculator.py) plus
oracle parity over text pairs."""

import pytest
from pyspark.sql import functions as F

from blackedge_ocr_spark import oracle
from blackedge_ocr_spark.functions import (
    levenshtein_similarity,
    number_frequency_similarity,
    similarity_report,
    word_overlap_similarity,
    wordfreq_cosine_similarity,
)

PAIRS = [
    # identical → 1.0 everywhere
    ("Revenue was 100 and 200.", "Revenue was 100 and 200."),
    # disjoint numbers → number_frequency 0.0
    ("values 1 2 3", "values 7 8 9"),
    # partial overlap → (0, 1)
    ("totals 10 20 30 40", "totals 10 20 77 88"),
    # both number-free → 1.0 by convention
    ("no digits here", "none here either"),
    # one side number-free → 0.0
    ("count 42", "no numbers at all"),
    # word overlap partial
    ("the quick brown fox", "the quick red wolf"),
    # empty vs empty / empty vs text
    ("", ""),
    ("", "something present"),
    # near cases and punctuation
    ("Hello, world! 3.14", "hello world 3.14"),
    ("kitten sitting", "sitting kitten"),
]


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(PAIRS)], "id int, a string, b string"
    )
    return (
        df.select(
            "id",
            "a",
            "b",
            number_frequency_similarity("a", "b").alias("numfreq"),
            word_overlap_similarity("a", "b").alias("overlap"),
            wordfreq_cosine_similarity("a", "b").alias("cosine"),
            levenshtein_similarity("a", "b").alias("lev"),
            similarity_report("a", "b").alias("report"),
        )
        .orderBy("id")
        .collect()
    )


def test_reference_vectors(rows):
    by_pair = {(r["a"], r["b"]): r for r in rows}
    identical = by_pair[PAIRS[0]]
    # cosine of identical integer counters is 1.0 up to fp rounding
    # (the reference's own math: sqrt(2)*sqrt(2) != 2 exactly)
    assert identical["numfreq"] == pytest.approx(1.0, abs=1e-12)
    assert identical["overlap"] == 1.0
    assert identical["cosine"] == pytest.approx(1.0, abs=1e-12)
    assert identical["lev"] == 1.0

    assert by_pair[PAIRS[1]]["numfreq"] == 0.0
    assert 0.0 < by_pair[PAIRS[2]]["numfreq"] < 1.0
    assert by_pair[PAIRS[3]]["numfreq"] == 1.0  # both empty → 1.0
    assert by_pair[PAIRS[4]]["numfreq"] == 0.0  # one empty → 0.0
    assert 0.0 < by_pair[PAIRS[5]]["overlap"] < 1.0
    assert by_pair[("", "")]["overlap"] == 1.0
    assert by_pair[("", "something present")]["overlap"] == 0.0
    # punctuation-insensitive levenshtein via normalize_for_comparison
    assert by_pair[PAIRS[8]]["lev"] == 1.0


def test_oracle_parity(rows):
    for r in rows:
        a, b = r["a"], r["b"]
        assert r["numfreq"] == pytest.approx(
            oracle.number_frequency_similarity(a, b), abs=1e-12
        )
        assert r["overlap"] == pytest.approx(
            oracle.word_overlap_similarity(a, b), abs=1e-12
        )
        assert r["cosine"] == pytest.approx(
            oracle.wordfreq_cosine_similarity(a, b), abs=1e-12
        )
        assert r["lev"] == pytest.approx(
            oracle.levenshtein_similarity(a, b), abs=1e-12
        )
        expected_report = oracle.similarity_report(a, b)
        got = r["report"].asDict()
        for k, v in expected_report.items():
            if v is None:
                assert got[k] is None, k
            else:
                assert got[k] == pytest.approx(v, abs=1e-12), k


def test_levenshtein_report_skip(spark):
    """levenshtein omitted from the report when either text >= 5000
    chars (similarity_calculator.py:325-329)."""
    long_text = "word " * 1200  # 6000 chars
    df = spark.createDataFrame([(long_text, "short")], "a string, b string")
    row = df.select(similarity_report("a", "b").alias("r")).head()
    assert row["r"]["levenshtein"] is None
    assert row["r"]["word_overlap"] == 0.0  # disjoint-ish but defined
