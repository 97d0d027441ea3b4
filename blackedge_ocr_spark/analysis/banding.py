"""Shared OR-of-bands candidate enumeration.

Both LSH front-ends — MinHash band keys over shingled documents
(``dedup.lsh_candidate_pairs``) and sign-hyperplane buckets over
embeddings (``ann.neardup_bucket_pairs``) — reduce to the same
discipline once (band, key, id) rows exist: group buckets, cap each
to its lowest ids (the monster-bucket skew defense — the windowed
``row_number ≤ cap``, exactly the rule the DuckDB oracles apply),
enumerate in-bucket pairs with an array comprehension, distinct
across bands. One implementation keeps the cap/determinism rules
from drifting between the two call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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

    Round 5 (hot-bucket state bound): the cap used to be applied by
    slicing an ``array_sort(collect_list(ids))`` — ONE ROW holding
    every id of the bucket, O(m) concentrated state that a 10⁸-member
    pathological bucket would turn into a multi-GB array row. The
    rank is now a ``row_number`` window over (band, key) ordered by
    id: the bucket's rows stay ROWS (Spark's window sort is external
    and spills), only the ≤ cap head set is ever collected into an
    array (for the C(cap, 2) comprehension), and the star tail
    streams as (head × beyond-cap row) join output without any array
    at all. Same pairs, bit-for-bit — the window rule IS the rule
    the oracles state. The window, the capped re-group and the star
    join all share one hash(band, key) partitioning, so the change
    adds no corpus-sized exchange.
    """
    ranked = (
        banded.filter(F.col("key").isNotNull())
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("band", "key").orderBy(F.col(id_col))
            ),
        )
    )
    capped = ranked.filter(F.col("_rn") <= bucket_cap)
    ids_c = F.col("ids_c")
    full_enum = (
        capped.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids_c"))
        .filter(F.size("ids_c") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        ids_c,
                        lambda x: F.filter(
                            F.transform(
                                ids_c,
                                lambda y: F.struct(
                                    x.alias(a_col), y.alias(b_col)
                                ),
                            ),
                            lambda p: p[a_col] < p[b_col],
                        ),
                    )
                )
            ).alias("p")
        )
        .select(f"p.{a_col}", f"p.{b_col}")
    )
    # star tail: head = rank-1 id; beyond-cap ids are already > head
    # (rank order), so (head, id) is (a < b) by construction
    heads = capped.filter(F.col("_rn") == 1).select(
        "band", "key", F.col(id_col).alias(a_col)
    )
    star = (
        ranked.filter(F.col("_rn") > bucket_cap)
        .select("band", "key", F.col(id_col).alias(b_col))
        .join(heads, ["band", "key"])
        .select(a_col, b_col)
    )
    return full_enum.unionByName(star).distinct()
