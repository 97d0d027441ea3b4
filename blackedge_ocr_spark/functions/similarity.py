"""Similarity measures between two text columns, per-row and
shuffle-free.

reference: src/services/validation/similarity_calculator.py. Every
method runs as a single fused projection over the pair of strings —
the natural Spark shape for the reference's pairwise comparisons:
counter math happens inside array/map higher-order functions, so a
1000-executor cluster scales these embarrassingly (no join, no
shuffle). Counts are integers, so dot products and magnitudes are
exact and independent of iteration order — bit-for-bit parity with
the Python oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blackedge_ocr_spark.constants import (
    LEVENSHTEIN_REPORT_MAX,
    LEVENSHTEIN_TRUNCATE,
)
from blackedge_ocr_spark.functions.text import (
    extract_numbers,
    key_terms,
    normalize_for_comparison,
    tokens,
)


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _cosine_from_multisets(a: Column, b: Column) -> Column:
    """Cosine of the frequency vectors of two array columns
    (reference counter cosine, similarity_calculator.py:227-258) —
    LINEAR, pure JVM.

    Shape: tag each element with its side (a→(k,1,0), b→(k,0,1)),
    sort the concatenation once (compiled comparator, O(n log n)),
    then ONE aggregate pass run-length-merges equal keys and folds
    dot/|a|²/|b|² — O(n) lambda evaluations with a constant-size
    accumulator. The previous form counted each distinct key by
    re-filtering the full array (O(u·n) per row): invisible on a
    10-number document, ~10¹⁰ interpreted comparisons on a
    20k-transcript media monster (found via executor thread dump —
    the straggler was pegged in ArrayFilter.eval under
    ArrayAggregate).

    Bit-identical to the old form and to the DuckDB oracle: counts
    are integers, so dot and squared magnitudes are exact
    integer-valued float64 sums — iteration order cannot change a
    single bit — and the final sqrt/multiply/divide are the same
    correctly-rounded IEEE ops.
    """
    side = lambda arr, ca, cb: F.transform(
        arr,
        lambda x: F.struct(
            x.alias("k"),
            F.lit(float(ca)).alias("ca"),
            F.lit(float(cb)).alias("cb"),
        ),
    )
    tagged = F.array_sort(F.concat(side(a, 1, 0), side(b, 0, 1)))
    zero = F.lit(0.0)
    # Seed prev from the RAW a[0] (type-generic: double or string) —
    # NOT from tagged[0]: ArrayAggregate is CodegenFallback and its
    # zero expression evaluates independently of the aggregate input,
    # so referencing `tagged` there ran the O(n log n) sort TWICE per
    # row. ANY seed key is correct with zero counts: same-run adds
    # counts to zeros, flush adds 0*0 — both no-ops bit-for-bit.
    acc0 = F.struct(
        F.get(a, 0).alias("prev"),
        zero.alias("ca"), zero.alias("cb"),
        zero.alias("dot"), zero.alias("ma"), zero.alias("mb"),
    )
    same = lambda acc, e: F.struct(
        e["k"].alias("prev"),
        (acc["ca"] + e["ca"]).alias("ca"),
        (acc["cb"] + e["cb"]).alias("cb"),
        acc["dot"].alias("dot"), acc["ma"].alias("ma"), acc["mb"].alias("mb"),
    )
    flush = lambda acc, e: F.struct(
        e["k"].alias("prev"),
        e["ca"].alias("ca"), e["cb"].alias("cb"),
        (acc["dot"] + acc["ca"] * acc["cb"]).alias("dot"),
        (acc["ma"] + acc["ca"] * acc["ca"]).alias("ma"),
        (acc["mb"] + acc["cb"] * acc["cb"]).alias("mb"),
    )
    def _finish(acc: Column) -> Column:
        # Fold the last run and produce the cosine INSIDE the finish
        # lambda: the aggregate then returns one double and is
        # referenced exactly once — three references to a struct
        # result would re-run the whole sort+fold three times per row
        # (expressions are not CSE'd across a projection).
        dot = acc["dot"] + acc["ca"] * acc["cb"]
        ma = acc["ma"] + acc["ca"] * acc["ca"]
        mb = acc["mb"] + acc["cb"] * acc["cb"]
        mag = F.sqrt(ma) * F.sqrt(mb)
        return F.when(mag == 0, F.lit(0.0)).otherwise(dot / mag)

    return F.aggregate(
        tagged,
        acc0,
        lambda acc, e: F.when(
            acc["prev"].isNull() | (acc["prev"] == e["k"]), same(acc, e)
        ).otherwise(flush(acc, e)),
        _finish,
    )


def multiset_cosine_arrow(pa: Column, pb: Column) -> Column:
    """Counter-cosine over two prepared multiset arrays as an
    Arrow-batched pandas UDF — O(|a|+|b|) per row via hash counting.

    The JVM higher-order-function variant rescans the full array for
    every distinct element (O(u·n) — ~10⁸ comparisons per row on
    10k-term documents), so the word-frequency method uses this path;
    the number-frequency method keeps the JVM expression (few
    elements, no Python boundary in the flagship pipeline).

    Bit-identical to ``multiset_cosine_guarded``: counts are integers,
    so dot and magnitudes are exact in float64 regardless of iteration
    order, and the final sqrt/multiply/divide are the same
    correctly-rounded IEEE ops the JVM performs.
    """
    return _multiset_cosine_udf(pa, pb)


@F.pandas_udf(T.DoubleType())
def _multiset_cosine_udf(a: "pd.Series", b: "pd.Series") -> "pd.Series":
    import math
    from collections import Counter

    out = []
    for xa, xb in zip(a, b):
        if xa is None or xb is None:
            out.append(None)
            continue
        xa, xb = list(xa), list(xb)
        if not xa and not xb:
            out.append(1.0)
            continue
        if not xa or not xb:
            out.append(0.0)
            continue
        ca, cb = Counter(xa), Counter(xb)
        dot = 0.0
        for k, va in ca.items():
            vb = cb.get(k)
            if vb:
                dot += float(va) * float(vb)
        mag_a = math.sqrt(sum(float(v) * float(v) for v in ca.values()))
        mag_b = math.sqrt(sum(float(v) * float(v) for v in cb.values()))
        prod = mag_a * mag_b
        out.append(0.0 if prod == 0 else dot / prod)
    return pd.Series(out, dtype="float64")


def multiset_cosine_guarded(na: Column, nb: Column) -> Column:
    """Guarded counter-cosine over two PREPARED multiset arrays.

    Performance contract: pass *column attributes* (materialized by a
    prior select), not derived expressions — expressions passed here
    are re-evaluated per lambda element inside the interpreted
    higher-order functions, turning O(u·n) counting into
    O(u·n·cost(expr)). See prepare()/from_prepared below.
    """
    return (
        F.when((F.size(na) == 0) & (F.size(nb) == 0), F.lit(1.0))
        .when((F.size(na) == 0) | (F.size(nb) == 0), F.lit(0.0))
        .otherwise(_cosine_from_multisets(na, nb))
    )


def jaccard_terms_guarded(ta: Column, tb: Column) -> Column:
    """Guarded Jaccard over two prepared distinct-term arrays."""
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return (
        F.when((F.size(ta) == 0) & (F.size(tb) == 0), F.lit(1.0))
        .when((F.size(ta) == 0) | (F.size(tb) == 0), F.lit(0.0))
        .otherwise(inter / union)
    )


def levenshtein_prepared(na: Column, nb: Column) -> Column:
    """1 - dist/max_len over prepared (normalized + truncated) texts."""
    max_len = F.greatest(F.length(na), F.length(nb)).cast("double")
    return (
        F.when(na == nb, F.lit(1.0))
        .when((F.length(na) == 0) | (F.length(nb) == 0), F.lit(0.0))
        .otherwise(F.lit(1.0) - F.levenshtein(na, nb).cast("double") / max_len)
    )


def prepare(content, method: str) -> Column:
    """The per-method derived input (number multiset / term set /
    token multiset / normalized text) to materialize as a column
    before calling from_prepared."""
    c = _c(content)
    if method == "number_frequency":
        return extract_numbers(c)
    if method == "word_overlap":
        return key_terms(c)
    if method == "cosine":
        return F.filter(tokens(c), lambda w: F.length(w) >= 3)
    if method == "levenshtein":
        return F.substring(normalize_for_comparison(c), 1, LEVENSHTEIN_TRUNCATE)
    raise ValueError(f"Unknown similarity method: {method}")


def from_prepared(pa: Column, pb: Column, method: str) -> Column:
    if method == "number_frequency":
        return multiset_cosine_guarded(pa, pb)
    if method == "cosine":
        return multiset_cosine_arrow(pa, pb)
    if method == "word_overlap":
        return jaccard_terms_guarded(pa, pb)
    if method == "levenshtein":
        return levenshtein_prepared(pa, pb)
    raise ValueError(f"Unknown similarity method: {method}")


def number_frequency_similarity(a, b) -> Column:
    """Cosine over number-frequency multisets; 1.0 when both number-free,
    0.0 when exactly one is (similarity_calculator.py:69-107)."""
    return multiset_cosine_guarded(extract_numbers(_c(a)), extract_numbers(_c(b)))


def word_overlap_similarity(a, b) -> Column:
    """Jaccard index over key-term sets; 1.0 both empty, 0.0 one empty
    (similarity_calculator.py:109-143)."""
    return jaccard_terms_guarded(key_terms(_c(a)), key_terms(_c(b)))


def wordfreq_cosine_similarity(a, b, min_length: int = 3) -> Column:
    """Cosine of word-frequency vectors over terms of length >=3
    (similarity_calculator.py:145-177; term/count semantics
    content_normalizer.py:143-173)."""
    fa = F.filter(tokens(_c(a)), lambda w: F.length(w) >= min_length)
    fb = F.filter(tokens(_c(b)), lambda w: F.length(w) >= min_length)
    return multiset_cosine_arrow(fa, fb)


def levenshtein_similarity(a, b) -> Column:
    """1 - edit_distance/max_len over comparison-normalized texts,
    truncated at 10k chars; 1.0 if equal after truncation, 0.0 if
    either is empty (similarity_calculator.py:179-225). Uses the
    JVM built-in ``levenshtein`` instead of the reference's Python DP.
    """
    na = F.substring(normalize_for_comparison(_c(a)), 1, LEVENSHTEIN_TRUNCATE)
    nb = F.substring(normalize_for_comparison(_c(b)), 1, LEVENSHTEIN_TRUNCATE)
    return levenshtein_prepared(na, nb)


_METHODS = {
    "number_frequency": number_frequency_similarity,
    "word_overlap": word_overlap_similarity,
    "cosine": wordfreq_cosine_similarity,
    "levenshtein": levenshtein_similarity,
}


def similarity_by_method(a, b, method: str = "number_frequency") -> Column:
    """Dispatch on method name (similarity_calculator.py:33-67)."""
    try:
        return _METHODS[method.lower()](a, b)
    except KeyError:
        raise ValueError(
            f"Unknown similarity method: {method}. "
            f"Valid options: {', '.join(_METHODS)}"
        ) from None


def similarity_report(a, b) -> Column:
    """struct of all four scores; levenshtein null (skipped) unless
    both raw texts are shorter than 5000 chars
    (similarity_calculator.py:309-332)."""
    a, b = _c(a), _c(b)
    lev = F.when(
        (F.length(a) < LEVENSHTEIN_REPORT_MAX)
        & (F.length(b) < LEVENSHTEIN_REPORT_MAX),
        levenshtein_similarity(a, b),
    )
    return F.struct(
        number_frequency_similarity(a, b).alias("number_frequency"),
        word_overlap_similarity(a, b).alias("word_overlap"),
        wordfreq_cosine_similarity(a, b).alias("cosine"),
        lev.alias("levenshtein"),
    )
