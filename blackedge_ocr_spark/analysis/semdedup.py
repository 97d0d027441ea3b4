"""Semantic deduplication over the embedding column (SemDeDup-style).

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): k-means
cluster the embeddings, then look for near-duplicate pairs ONLY
within a cluster — the cluster assignment replaces the O(n²) global
pair scan with O(Σ cluster²), and clusters are the natural unit of
distribution. This composes the engine's proven bricks:

- ``ann.kmeans_centroids`` — fixed-point-deterministic Lloyd training
  (micro-unit integer sums, bit-identical local/distributed engines);
- ``ann.assign_centroids`` — map-side numpy block assignment, the
  centroid matrix broadcast, the corpus never shuffles to be
  assigned;
- ``ann.pairwise_cosine`` — the dim-ordered block kernel whose fold
  order matches the JVM expression and the DuckDB oracle bit-for-bit.

Shuffle shape (the 100 TB contract): ONE exchange, on ``cid`` — the
capped cluster members co-locate, in-cluster pairs enumerate locally,
and only the O(duplicates) dropped-id set travels afterwards (as a
broadcast). No global all-pairs join, no corpus-sized broadcast: this
is exactly the published SemDeDup decomposition, where cluster size —
bounded here by ``cluster_cap``'s lowest-id rule, the same monster-
bucket defense the LSH paths use — is the tuned knob that keeps the
in-cluster quadratic term flat as n grows (C ≈ 4·√n lists via
``ann.centroid_stride``, so expected cluster size is O(√n) and the
cap is the tail guard, not the common case).

Keeper rule: within a cluster, a vector is a duplicate iff some
LOWER-id cluster member scores cosine ≥ threshold against it
(first-wins by vec_id — the same deterministic discipline as
``scrub.paragraph_dedup`` and ``dedup.exact_duplicates``). The rule
is a plain EXISTS, so the DuckDB oracle mirrors it exactly; it is
deliberately not transitive-closure (``clustering.dedup_clusters``
owns connected components when cluster-level grouping is wanted).

Reference analog: none — the reference's similarity surface
(services/text_analyzer.py) compares one primary/secondary pair; this
extends it corpus-wide per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis.ann import (
    NEARDUP_THRESHOLD,
    _load,
    kmeans_centroids,
    assign_centroids,
    pairwise_cosine,
)

SEMDEDUP_CLUSTER_CAP = 4096  # ids scored per cluster (skew tail guard)


def semantic_dedup_df(
    corpus: DataFrame,
    cents: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    cluster_cap: int = SEMDEDUP_CLUSTER_CAP,
) -> DataFrame:
    """(vec_id, v) × (cid, cv) → (vec_id, cid, is_dup).

    ``assigned`` never shuffles to get its cid (broadcast centroid
    matrix); the ONLY corpus-sized exchange is the cid hash partition
    feeding the window + self-join, and AQE handles a skewed cluster
    on top of the cap. The dropped-id set is O(duplicates) and joins
    back as a broadcast.

    ``assigned`` is persisted because THREE subtrees consume it (both
    self-join sides and the final output projection) — unpersisted,
    Spark re-runs the scan + the centroid-assignment kernel once per
    subtree (observed as 3× MapInPandas in the physical plan; the
    assignment is the corpus × centroids hot loop, so that triples
    the dominant cost). MEMORY_AND_DISK default = the disk-backed
    staging a fleet would use.

    ``prune=True`` (round 5): the assignment — this pipeline's
    n^1.5 term at C ≈ 4√n, measured 221.9 s at sf30 — runs through
    the exact triangle-inequality group prune
    (``ann._pruned_first_max_assign``): O(√C) group distances per
    vector plus only the winner-eligible candidate scans, results
    provably identical to the full scan (contract row still
    hash-green; growth re-measured in BENCH/BASELINE.md)."""
    assigned = assign_centroids(
        corpus, cents, keep=["vec_id", "v"], prune=True
    ).persist()

    # Cap each cluster to its lowest ids before pairing — identical
    # rule to banding.in_bucket_pairs, expressed as a window so the
    # vectors ride along (SQL mirror: row_number() ... <= cap).
    rn = F.row_number().over(Window.partitionBy("cid").orderBy("vec_id"))
    capped = (
        assigned.withColumn("rn", rn)
        .filter(F.col("rn") <= cluster_cap)
        .drop("rn")
    )
    a = capped.select(
        "cid", F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va")
    )
    b = capped.select(
        "cid", F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb")
    )
    pairs = a.join(b, "cid").filter(F.col("vec_id_a") < F.col("vec_id_b"))
    dropped = (
        pairwise_cosine(pairs, "va", "vb", keep=["vec_id_a", "vec_id_b"])
        .filter(F.round(F.col("cos"), 6) >= threshold)
        .select(F.col("vec_id_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        assigned.select("vec_id", "cid")
        .join(F.broadcast(dropped), "vec_id", "left")
        .select(
            "vec_id", "cid", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
        )
    )


def semantic_dedup(
    spark,
    sf_dir: str,
    threshold: float = NEARDUP_THRESHOLD,
    cluster_cap: int = SEMDEDUP_CLUSTER_CAP,
) -> DataFrame:
    """SemDeDup over the embeddings table: k-means (the trained-
    centroid path, same 3 fixed-point Lloyd iterations as
    ``ann_ivf_kmeans_topk``) → within-cluster first-wins near-dup."""
    corpus = _load(spark, sf_dir)
    cents = kmeans_centroids(corpus)
    return semantic_dedup_df(corpus, cents, threshold, cluster_cap)
