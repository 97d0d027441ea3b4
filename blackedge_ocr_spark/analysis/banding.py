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
    self-join/oracle semantics).

    Enumeration per bucket (deterministic — the SQL oracles apply the
    identical rules via row_number over id order):

    - **full enumeration** among the bucket's ``bucket_cap`` LOWEST
      ids — C(cap, 2) pairs, the quadratic term bounded;
    - **star tail** (round 4): every id BEYOND the cap pairs with the
      bucket HEAD (the lowest id) — m − cap pairs, linear. Without
      it, a mirror-scale near-dup cluster whose minhashes are
      dominated by shared boilerplate concentrates into one hot
      bucket per band and every beyond-cap member silently loses ALL
      pairing chances (measured: 1.2% sampled pair recall on a
      10⁴-copy near-dup cluster — BENCH/SKEW.md). The star keeps
      every member connected to the head, so duplicate-CLUSTER
      assembly (union-find over verified pairs) still reaches the
      whole cluster — cluster recall is what dedup keeps, pair
      enumeration stays O(cap² + m) per bucket.
    """
    buckets = (
        banded.filter(F.col("key").isNotNull())
        .groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
        # materialized, multi-referenced column: an inlined slice
        # expression would be re-copied per lambda element (O(cap³)
        # per bucket) — the house HOF discipline
        .withColumn("ids_c", F.slice(F.col("ids"), 1, bucket_cap))
    )
    capped = F.col("ids_c")
    full_enum = F.flatten(
        F.transform(
            capped,
            lambda x: F.filter(
                F.transform(
                    capped,
                    lambda y: F.struct(x.alias(a_col), y.alias(b_col)),
                ),
                lambda p: p[a_col] < p[b_col],
            ),
        )
    )
    head = F.element_at(F.col("ids"), 1)
    if bucket_cap + 1 < (1 << 31):
        star = F.transform(
            F.slice(
                F.col("ids"),
                bucket_cap + 1,
                F.greatest(F.size("ids") - bucket_cap, F.lit(0)),
            ),
            lambda x: F.struct(head.alias(a_col), x.alias(b_col)),
        )
        pair_arr = F.concat(full_enum, star)
    else:
        # "uncapped" sentinel (cap ≥ INT_MAX): no tail can exist, and
        # the slice start would overflow the INT argument
        pair_arr = full_enum
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select(f"p.{a_col}", f"p.{b_col}")
        .distinct()
    )
