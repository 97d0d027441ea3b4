"""LSH monster-bucket skew bench: a duplicate mega-cluster (D
bit-identical documents) injected into a distinct background corpus,
run through ``lsh_candidate_pairs`` with and without the band-bucket
cap.

Uncapped, the cluster lands in ONE (band, key) bucket per band and
enumerates D² candidate structs inside a single group row — one task
owns the quadratic blowup. With ``bucket_cap`` the same bucket
enumerates at most cap² candidates regardless of D. Reports wall time
and candidate/output counts per scenario; paste into BENCH/SKEW.md.

Usage: python tools/lsh_skew_bench.py [n_dups] [n_background]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus(spark, n_dups: int, n_background: int):
    import pyspark.sql.functions as F

    dup_text = (
        "quarterly revenue summary table for the northern region "
        "including adjusted operating margin and headcount detail"
    )
    dups = spark.range(n_dups).select(
        F.col("id").alias("doc_id"), F.lit(dup_text).alias("text")
    )
    # distinct background: md5-derived token soup, no shared shingles
    bg = spark.range(n_dups, n_dups + n_background).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{i}")))
              for i in range(12)],
        ).alias("text"),
    )
    return dups.unionByName(bg)


def main() -> None:
    from blackedge_ocr_spark.analysis import dedup
    from blackedge_ocr_spark.session import build_session

    n_dups = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    spark = build_session()
    docs = corpus(spark, n_dups, n_bg).persist()
    docs.count()

    for label, cap in (("uncapped", (1 << 31) - 1), ("cap=128", 128)):
        t0 = time.time()
        n_pairs = dedup.lsh_candidate_pairs(docs, bucket_cap=cap).count()
        dt = time.time() - t0
        print(
            f"{label}: {dt:.2f} s, {n_pairs} verified pairs "
            f"(cluster {n_dups}, background {n_bg})",
            flush=True,
        )
        # lsh_candidate_pairs persists its candidate tables; drop them
        # between scenarios so the second run is not warm-started
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
