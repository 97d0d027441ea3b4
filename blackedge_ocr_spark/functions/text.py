"""Scalar text transforms as pure Spark Column expressions.

Each function mirrors one scalar in the reference's normalizer
(reference: src/services/validation/content_normalizer.py) but is
expressed with JVM-side built-ins so the whole stage fuses into
whole-stage codegen — no Python in the hot path.

Regex parity note: the reference uses Python ``re`` where ``\\w \\b \\s``
are Unicode-aware; Java regex defaults to ASCII classes. We compile
with the ``(?U)`` (UNICODE_CHARACTER_CLASS) flag wherever the
reference's behavior on non-ASCII input would otherwise diverge
(validated against the Python oracle in tests/test_pipeline_oracle.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Python re semantics for \s / \b / \w via Java's (?U) flag.
# [\s\x1c-\x1f]: Java (?U)\s is the Unicode White_Space property,
# which EXCLUDES the legacy FS/GS/RS/US separators U+001C-001F;
# Python's \s and str.strip() (the reference semantics,
# content_normalizer.py) include them — carve them back in so a
# control-separator-padded span normalizes identically.
_WS = r"(?U)[\s\x1c-\x1f]+"
_EDGE_WS = r"(?U)^[\s\x1c-\x1f]+|[\s\x1c-\x1f]+$"
# reference: content_normalizer.py:99
NUMBER_PATTERN = r"-?\d+(?:,\d{3})*(?:\.\d+)?%?"
# reference: content_normalizer.py:137 (runs over lowercased text)
TERM_PATTERN = r"(?U)\b[a-z0-9]+\b"
WORD_PATTERN = r"(?U)\b\w+\b"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def py_strip(col) -> Column:
    """Python ``str.strip()`` (Unicode whitespace, both ends)."""
    return F.regexp_replace(_c(col), _EDGE_WS, "")


def normalize_text(col, preserve_case: bool = False) -> Column:
    """Lowercase, line-breaks→space, collapse whitespace, strip.

    reference: content_normalizer.py:26-64.
    """
    c = F.coalesce(_c(col), F.lit(""))
    if not preserve_case:
        c = F.lower(c)
    c = F.regexp_replace(c, r"\r\n|\n|\r", " ")
    c = F.regexp_replace(c, _WS, " ")
    return F.trim(c)


def extract_numbers(col) -> Column:
    """All numbers in the text as array<double> (commas stripped,
    trailing ``%`` dropped: ``25%`` → 25.0).

    reference: content_normalizer.py:67-113.
    """
    c = F.coalesce(_c(col), F.lit(""))
    matches = F.regexp_extract_all(c, F.lit(NUMBER_PATTERN), 0)
    # + 0.0 folds IEEE -0.0 into 0.0: Python dict keys merge the two
    # zeros (the reference's Counter semantics) but Spark's array
    # distinct/union are binary — normalize at the source.
    return F.transform(
        matches,
        lambda x: F.regexp_replace(
            F.regexp_replace(x, ",", ""), r"%$", ""
        ).cast("double")
        + F.lit(0.0),
    )


def tokens(col) -> Column:
    """``\\b[a-z0-9]+\\b`` tokens of the *normalized* text, in order,
    with repeats — the basis for both key terms and frequencies.
    """
    return F.regexp_extract_all(normalize_text(col), F.lit(TERM_PATTERN), 0)


def key_terms(col, min_length: int = 3) -> Column:
    """Distinct normalized terms of length >= min_length, sorted for
    deterministic array output (the reference returns a set,
    content_normalizer.py:116-140).
    """
    distinct = F.array_distinct(
        F.filter(tokens(col), lambda w: F.length(w) >= min_length)
    )
    return F.array_sort(distinct)


def word_frequency(col, min_length: int = 3) -> Column:
    """map<term, occurrences> over terms of length >= min_length.

    reference: content_normalizer.py:143-173 (``\\b{term}\\b`` counting
    over the normalized text == equality counting over the token list).

    Tokenization stays JVM-side (Java ``(?U)`` regex — identical to
    every other term consumer); only the hash count crosses the Arrow
    boundary. The count is O(tokens) per row — the earlier
    higher-order-function formulation rescanned the token array once
    per distinct term (O(distinct x tokens): ~10^9 comparisons on a
    100k-token/10k-term document) and, being a UDF-free expression,
    was exposed to CollapseProject re-inlining. A pandas-UDF output is
    an attribute and can never be inlined into a lambda.

    For relational (doc_id, term, n) output prefer
    ``queries.q_word_frequency``'s explode + groupBy — zero Python,
    map-side combinable.
    """
    toks = F.filter(tokens(col), lambda w: F.length(w) >= min_length)
    return _word_counter_udf(toks)


@F.pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
def _word_counter_udf(toks: "pd.Series") -> "pd.Series":
    from collections import Counter

    out = []
    for arr in toks:
        if arr is None:
            out.append(None)
        else:
            out.append(dict(Counter(list(arr))))
    return pd.Series(out)


def word_count(col) -> Column:
    """Count of ``\\b\\w+\\b`` words (Unicode, Python-re parity)."""
    c = F.coalesce(_c(col), F.lit(""))
    return F.size(F.regexp_extract_all(c, F.lit(WORD_PATTERN), 0))


def remove_page_breaks(col) -> Column:
    """Strip the three page-break marker variants, collapse
    whitespace, strip. reference: content_normalizer.py:176-196.
    """
    c = F.coalesce(_c(col), F.lit(""))
    for marker in ("---PAGE-BREAK---", "---PAGE BREAK---", "[PAGE BREAK]"):
        c = F.replace(c, F.lit(marker), F.lit(" "))
    c = F.regexp_replace(c, _WS, " ")
    return F.trim(c)


def normalize_for_comparison(col) -> Column:
    """remove_page_breaks → normalize → drop punctuation → collapse.

    reference: content_normalizer.py:199-229.
    """
    c = normalize_text(remove_page_breaks(col))
    c = F.regexp_replace(c, r"(?U)[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, _WS, " ")
    return F.trim(c)
