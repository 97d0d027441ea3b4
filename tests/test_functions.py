"""Reference unit vectors (SURVEY.md §5.1) + oracle parity sweep for
every scalar transform, evaluated as Spark columns."""

import pytest
from pyspark.sql import functions as F

from blackedge_ocr_spark import oracle
from blackedge_ocr_spark.datagen import fixture_documents
from blackedge_ocr_spark.functions import (
    extract_numbers,
    key_terms,
    normalize_for_comparison,
    normalize_text,
    problems_array,
    remove_page_breaks,
    word_frequency,
)


def _texts():
    """Every span text in the adversarial fixture corpus."""
    out = []
    for _, spans, _, _ in fixture_documents():
        out.extend(s[1] for s in spans if s[1])
    # plus the classic unit vectors from the reference's test suite
    out += [
        "  Hello   World  ",
        "Line1\n\n\nLine2\r\nLine3",
        "Price: $1,234.56",
        "Scores: 85, 90, 95",
        "Growth rate: 25%",
        "-15 degrees",
        "snake_case under_score words",
        "a---PAGE-BREAK---b ---PAGE BREAK--- c [PAGE BREAK] d",
        "The quick brown fox! jumps; over: the lazy dog?",
        # FS/GS/RS/US separators: Python \s (the reference) includes
        # U+001C-001F, Java (?U)\s does not — the engine carves them
        # back in (_WS/_EDGE_WS) so these normalize identically.
        "\x1cpadded with file separator\x1f",
        "mid\x1d\x1e gap",
        "\x1c\x1d\x1e\x1f",
        "",
    ]
    return out


@pytest.fixture(scope="module")
def evaluated(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_texts())], "id int, t string"
    )
    rows = (
        df.select(
            "id",
            "t",
            normalize_text("t").alias("norm"),
            extract_numbers("t").alias("nums"),
            key_terms("t").alias("terms"),
            word_frequency("t").alias("freq"),
            remove_page_breaks("t").alias("nobreaks"),
            normalize_for_comparison("t").alias("cmp"),
            problems_array("t").alias("problems"),
        )
        .orderBy("id")
        .collect()
    )
    return rows


def test_normalize_vectors(evaluated):
    by_text = {r["t"]: r for r in evaluated}
    assert by_text["  Hello   World  "]["norm"] == "hello world"
    assert by_text["Line1\n\n\nLine2\r\nLine3"]["norm"] == "line1 line2 line3"
    assert by_text[""]["norm"] == ""


def test_extract_numbers_vectors(evaluated):
    by_text = {r["t"]: r for r in evaluated}
    assert by_text["Price: $1,234.56"]["nums"] == [1234.56]
    assert by_text["Scores: 85, 90, 95"]["nums"] == [85.0, 90.0, 95.0]
    assert by_text["Growth rate: 25%"]["nums"] == [25.0]
    assert by_text["-15 degrees"]["nums"] == [-15.0]
    assert by_text[""]["nums"] == []


def test_page_break_vectors(evaluated):
    by_text = {r["t"]: r for r in evaluated}
    assert (
        by_text["a---PAGE-BREAK---b ---PAGE BREAK--- c [PAGE BREAK] d"]["nobreaks"]
        == "a b c d"
    )


def test_underscore_word_boundaries(evaluated):
    """\\b[a-z0-9]+\\b must reject terms glued by underscores (Python
    re parity — underscores are word chars, so no boundary exists)."""
    by_text = {r["t"]: r for r in evaluated}
    row = by_text["snake_case under_score words"]
    assert row["terms"] == ["words"]


def test_oracle_parity_all_texts(evaluated):
    """Every scalar matches the pure-Python oracle on every fixture
    text — the per-function half of the per-row invariant."""
    for r in evaluated:
        t = r["t"]
        assert r["norm"] == oracle.normalize_text(t), t
        assert r["nums"] == oracle.extract_numbers(t), t
        assert r["terms"] == sorted(oracle.extract_key_terms(t)), t
        assert dict(r["freq"]) == oracle.calculate_word_frequency(t), t
        assert r["nobreaks"] == oracle.remove_page_breaks(t), t
        assert r["cmp"] == oracle.normalize_for_comparison(t), t
        assert list(r["problems"]) == oracle.detect_problems(t), t


def test_problem_labels_fire(evaluated):
    """Each detector fires on its designed stratum."""
    fired = set()
    for r in evaluated:
        fired.update(r["problems"])
    assert fired >= {
        "low_content_density",
        "missing_numbers",
        "repeated_characters",
        "low_word_count",
        "high_gibberish",
        "suspicious_characters",
        "incomplete_tables",
        "excessive_whitespace",
        "encoding_issues",
        "missing_punctuation",
    }
