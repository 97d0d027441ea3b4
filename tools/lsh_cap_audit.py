"""Bucket-cap audit at mirror-cluster scale (round 4): make the
BUCKET_CAP=128 defense earn its keep on a 10⁴-copy cluster.

Two staged corpora over a distinct background:

- **identical**: D bit-identical copies of one boilerplate page (the
  mirrored-page pathology). All copies share every band signature, so
  uncapped LSH enumerates C(D,2) pairs in ONE bucket row — 5·10⁷
  structs at D=10⁴ in a single task.
- **near-dup**: D copies each carrying one doc-specific token (true
  near-duplicates, Jaccard ≈ 0.8 at 18 words / 3-shingles). Their
  MinHash signatures differ, so banding scatters them across many
  buckets — the regime the cap is NOT supposed to hurt.

Per corpus the audit reports wall + verified-pair count for
cap=128, and a SAMPLED pair recall: K systematic true pairs
(adjacent and far strides across the cluster) probed against the LSH
output. For the identical corpus it also reports recall of the
PRODUCTION composition (exact-md5 first — every copy maps to one
keeper, so a sampled pair is "recovered" iff both sides collapse to
the same keeper), which is the shipped ordering
(``dedup.production_dedup_pairs``).

Uncapped at D=10⁴ is run only with --uncapped (expect it to be
killed: the quadratic bucket row). Paste results into BENCH/SKEW.md.

Usage: python tools/lsh_cap_audit.py [D] [n_background] [--uncapped]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = (
    "quarterly revenue summary table for the northern region "
    "including adjusted operating margin and headcount detail "
    "prepared by finance"
)


def corpus(spark, n_dups: int, n_background: int, near: bool):
    import pyspark.sql.functions as F

    if near:
        text = F.concat(
            F.lit(BOILER + " variant token "),
            F.md5(F.col("id").cast("string")),
        )
    else:
        text = F.lit(BOILER)
    dups = spark.range(n_dups).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    bg = spark.range(n_dups, n_dups + n_background).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{i}")))
              for i in range(12)],
        ).alias("text"),
    )
    return dups.unionByName(bg)


def sample_pairs(spark, n_dups: int, k: int = 2000):
    """K deterministic true pairs: half adjacent (i, i+1), half far
    (i, i + D/2) — strided so the sample covers the whole cluster,
    not just the capped head."""
    half = k // 2
    stride = max(1, (n_dups - 1) // half)
    far = n_dups // 2
    pairs = [(i, i + 1) for i in range(0, n_dups - 1, stride)[:half]]
    pairs += [(i, i + far) for i in range(0, n_dups - far, stride)[:half]]
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def main() -> None:
    import pyspark.sql.functions as F

    from blackedge_ocr_spark.analysis import dedup
    from blackedge_ocr_spark.session import build_session

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_dups = int(args[0]) if args else 10_000
    n_bg = int(args[1]) if len(args) > 1 else 10_000
    run_uncapped = "--uncapped" in sys.argv

    spark = build_session()
    for mode in ("identical", "near-dup"):
        docs = corpus(spark, n_dups, n_bg, near=(mode == "near-dup")).persist()
        docs.count()
        sample = sample_pairs(spark, n_dups).persist()
        n_sample = sample.count()

        caps = [("cap=128", 128)]
        if run_uncapped:
            caps.append(("uncapped", (1 << 31) - 1))
        for label, cap in caps:
            t0 = time.time()
            out = dedup.lsh_candidate_pairs(docs, bucket_cap=cap).persist()
            n_pairs = out.count()
            dt = time.time() - t0
            hits = sample.join(out, ["doc_a", "doc_b"], "left_semi").count()
            # CLUSTER recall — the metric dedup actually keeps: union-
            # find over the verified pairs (driver-side: O(pairs),
            # bounded by the cap+star enumeration), fraction of
            # cluster members connected to the min-id component.
            parent = list(range(n_dups))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in out.filter(
                (F.col("doc_a") < n_dups) & (F.col("doc_b") < n_dups)
            ).collect():
                ra, rb = find(r["doc_a"]), find(r["doc_b"])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            root0 = find(0)
            connected = sum(1 for i in range(n_dups) if find(i) == root0)
            print(
                f"{mode} {label}: {dt:.2f} s, {n_pairs} verified pairs, "
                f"sampled pair recall {hits}/{n_sample} = "
                f"{hits / n_sample:.3f}, cluster connectivity "
                f"{connected}/{n_dups} = {connected / n_dups:.3f}",
                flush=True,
            )
            out.unpersist()
            spark.catalog.clearCache()
            docs.persist().count()
            sample.persist().count()

        if mode == "identical":
            # production composition: exact-md5 keepers first — a true
            # pair is recovered iff both sides collapse to ONE keeper.
            t0 = time.time()
            hmap = docs.select(
                "doc_id", dedup.content_hash(F.col("text")).alias("h")
            )
            keepers = hmap.groupBy("h").agg(F.min("doc_id").alias("keeper"))
            keep = hmap.join(F.broadcast(keepers), "h").select(
                "doc_id", "keeper"
            )
            j = (
                sample.join(
                    keep.select(
                        F.col("doc_id").alias("doc_a"),
                        F.col("keeper").alias("ka"),
                    ),
                    "doc_a",
                )
                .join(
                    keep.select(
                        F.col("doc_id").alias("doc_b"),
                        F.col("keeper").alias("kb"),
                    ),
                    "doc_b",
                )
            )
            hits = j.filter(F.col("ka") == F.col("kb")).count()
            dt = time.time() - t0
            print(
                f"{mode} exact-first composition: {dt:.2f} s, sampled "
                f"pair recall {hits}/{n_sample} = {hits / n_sample:.3f}",
                flush=True,
            )
        docs.unpersist()
        sample.unpersist()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
