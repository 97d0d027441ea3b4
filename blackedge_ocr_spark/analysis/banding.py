"""Shared OR-of-bands candidate enumeration.

Both LSH front-ends — MinHash band keys over shingled documents
(``dedup.lsh_candidate_pairs``) and sign-hyperplane buckets over
embeddings (``ann.neardup_bucket_pairs``) — reduce to the same
discipline once (band, key, id) rows exist: group buckets, cap each
to its lowest ids (the monster-bucket skew defense — sort→slice here,
the windowed ``row_number ≤ cap`` in the DuckDB oracles), enumerate
in-bucket pairs with an array comprehension, distinct across bands.
One implementation keeps the cap/determinism rules from drifting
between the two call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def in_bucket_pairs(
    banded: DataFrame, id_col: str, a_col: str, b_col: str, bucket_cap: int
) -> DataFrame:
    """(band, key, <id_col>) rows → DISTINCT capped in-bucket id pairs
    (<a_col> < <b_col>). NULL keys are dropped (join equality never
    matched them; grouping WOULD, so the filter preserves the
    self-join/oracle semantics). Each bucket keeps only its
    ``bucket_cap`` LOWEST ids before enumeration — deterministic, so
    the SQL oracle applies the identical rule via row_number."""
    buckets = (
        banded.filter(F.col("key").isNotNull())
        .groupBy("band", "key")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(id_col)), 1, bucket_cap
            ).alias("ids")
        )
        .filter(F.size("ids") > 1)
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.filter(
                F.transform(
                    F.col("ids"),
                    lambda y: F.struct(x.alias(a_col), y.alias(b_col)),
                ),
                lambda p: p[a_col] < p[b_col],
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select(f"p.{a_col}", f"p.{b_col}")
        .distinct()
    )
