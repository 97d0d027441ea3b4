"""The ten quality-problem predicates as Spark Column expressions.

reference: src/services/validation/problem_detector.py:131-330, with
thresholds at :27-30 and the fixed check order at :85-124. All ten
checks evaluate as one fused projection (whole-stage codegen) — the
reference's ``asyncio.gather`` batch (:59-61) becomes plain data
parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blackedge_ocr_spark.constants import (
    ENCODING_ERROR_MARKERS,
    MAX_GIBBERISH_RATIO,
    MAX_REPEATED_CHAR_LENGTH,
    MIN_CONTENT_LENGTH,
    MIN_WORD_COUNT,
    PROBLEM_LABELS,
)
from blackedge_ocr_spark.functions.text import py_strip, word_count


def _c(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(""))


def low_content_density(col) -> Column:
    """D1 — stripped length < 100 (problem_detector.py:131-141)."""
    return F.length(py_strip(_c(col))) < MIN_CONTENT_LENGTH


def missing_numbers(col) -> Column:
    """D2 — table markers present but no digit (:143-161)."""
    c = _c(col)
    has_table = c.contains("|") | F.upper(c).contains("TABLE")
    return has_table & ~c.rlike(r"\d")


def repeated_characters(col) -> Column:
    """D3 — any char repeated > MAX_REPEATED_CHAR_LENGTH times (:163-174).

    Backreference regex, identical in Java and Python re ('.' excludes
    newlines in both).
    """
    return _c(col).rlike(r"(.)\1{%d,}" % MAX_REPEATED_CHAR_LENGTH)


def low_word_count(col) -> Column:
    """D4 — fewer than 20 ``\\b\\w+\\b`` words (:176-187)."""
    return word_count(_c(col)) < MIN_WORD_COUNT


def high_gibberish(col) -> Column:
    """D5 — among >=10 words of [a-zA-Z]{4,}: ratio of (vowel-less or
    5+-consonant-run) words > 0.3 (:189-218). The reference's
    ``len(word) > 3`` guard is vacuous (the word regex already requires
    4+ chars), so membership reduces to the OR of the two regex tests.
    """
    c = _c(col)
    words = F.regexp_extract_all(c, F.lit(r"(?U)\b[a-zA-Z]{4,}\b"), 0)
    gib = F.size(
        F.filter(
            words,
            lambda w: (~F.lower(w).rlike(r"[aeiou]"))
            | F.lower(w).rlike(r"[bcdfghjklmnpqrstvwxyz]{5,}"),
        )
    )
    n = F.size(words)
    return (n >= 10) & (
        gib.cast("double") / n.cast("double") > F.lit(MAX_GIBBERISH_RATIO)
    )


def suspicious_characters(col) -> Column:
    """D6 — long non-ASCII runs, doubled replacement chars, or control
    chars (:220-240)."""
    c = _c(col)
    return (
        c.rlike(r"[^\x00-\x7F]{5,}")
        | c.rlike("�{2,}")
        | c.rlike(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")
    )


def incomplete_tables(col) -> Column:
    """D7 — >=2 pipe-bearing lines with >2 distinct pipe counts
    (:242-269). The reference's TABLE/| marker pre-check is implied:
    no '|' in the content means no pipe-bearing lines.
    """
    c = _c(col)
    table_lines = F.filter(
        F.split(c, "\n", -1), lambda l: l.contains("|")
    )
    pipe_counts = F.transform(
        table_lines, lambda l: F.size(F.split(l, r"[|]", -1)) - 1
    )
    return (F.size(table_lines) >= 2) & (
        F.size(F.array_distinct(pipe_counts)) > 2
    )


def excessive_whitespace(col) -> Column:
    """D8 — a 20+-space run, or more than five non-overlapping
    occurrences of three consecutive newlines (:271-289)."""
    c = _c(col)
    triple = "\n\n\n"
    blank_count = (
        F.length(c) - F.length(F.replace(c, F.lit(triple), F.lit("")))
    ) / 3
    return c.rlike(" {20,}") | (blank_count > 5)


def encoding_issues(col) -> Column:
    """D9 — any mojibake marker substring (:291-309)."""
    c = _c(col)
    pred = F.lit(False)
    for marker in ENCODING_ERROR_MARKERS:
        pred = pred | c.contains(marker)
    return pred


def missing_punctuation(col) -> Column:
    """D10 — >=50 words but fewer than words/30 punctuation marks
    (:311-330)."""
    c = _c(col)
    words = word_count(c)
    punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,!?;:]"), 0))
    return (words >= 50) & (
        punct.cast("double") < words.cast("double") / F.lit(30.0)
    )


_CHECKS = (
    low_content_density,
    missing_numbers,
    repeated_characters,
    low_word_count,
    high_gibberish,
    suspicious_characters,
    incomplete_tables,
    excessive_whitespace,
    encoding_issues,
    missing_punctuation,
)


def problem_flags(col) -> dict[str, Column]:
    """{label: boolean Column} for all ten checks, reference order."""
    return {label: fn(col) for label, fn in zip(PROBLEM_LABELS, _CHECKS)}


def problems_array(col) -> Column:
    """array<string> of fired labels in the reference's fixed order
    (problem_detector.py:85-124); empty array when clean.
    """
    tagged = F.array(
        *[
            F.when(fn(col), F.lit(label))
            for label, fn in zip(PROBLEM_LABELS, _CHECKS)
        ]
    )
    return F.filter(tagged, lambda x: x.isNotNull())
