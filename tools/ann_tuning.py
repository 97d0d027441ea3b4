"""ANN parameter sweep: recall@k vs cost for the approximate paths.

The contract queries pin ONE configuration each (oracle-checked); this
harness measures the tuning surface around them — the numbers a user
actually sets N_PLANES / probe / Lloyd iterations by — and writes the
table to BENCH/ANN.md.

recall@k is computed against the exact brute-force baseline in the
driver (result sets are O(queries x k), tiny by construction). Wall
times are warm-session best-of-``reps`` and indicative only — the
honest cost axis at scale is the expected scanned fraction, which is
printed per config (LSH: measured candidate rows / (n_q * N); IVF:
probe/C of the corpus).

Usage: python tools/ann_tuning.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def topk_sets(df) -> dict:
    rows = df.select("q_id", "neighbor_id").collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict, exact: dict, k: int) -> float:
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    return hits / (len(exact) * k)


def timed(fn, reps: int) -> tuple[float, object]:
    best, df = None, None
    for _ in range(reps):
        t0 = time.time()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from blackedge_ocr_spark.analysis import ann
    from blackedge_ocr_spark.session import build_session

    spark = build_session(master="local[8]")
    k = ann.DEFAULT_K
    corpus = ann._load(spark, sf_dir)
    n = corpus.count()
    n_q = corpus.filter(F.col("vec_id") % ann.QUERY_EVERY == 0).count()
    n_cents = corpus.filter(
        F.col("vec_id") % ann.CENTROID_EVERY == 0
    ).count()

    t_exact, exact_df = timed(
        lambda: ann.brute_force_topk(spark, sf_dir, k), reps
    )
    exact = topk_sets(exact_df)

    rows = []

    def sweep(label: str, fn, scan_frac: float) -> None:
        t, df = timed(fn, reps)
        r = recall(topk_sets(df), exact, k)
        rows.append((label, r, scan_frac, t))
        print(f"{label}: recall@{k} {r:.3f}  scan {scan_frac:.3f}  {t:.2f}s",
              flush=True)

    for planes in (4, 6, 8, 10):
        # expected scanned fraction under uniform buckets: probe set
        # is (planes+1) of 2^planes buckets; measure the REAL one —
        # sign buckets are never uniform on clustered data.
        weights = ann.hyperplane_weights(planes)
        bucketed = corpus.withColumn(
            "bucket", ann.sign_bucket(F.col("v"), weights)
        )
        qs = bucketed.filter(F.col("vec_id") % ann.QUERY_EVERY == 0).select(
            F.explode(
                ann.probe_buckets(F.col("bucket"), planes)
            ).alias("qb"),
            F.col("vec_id").alias("q_id"),
        )
        n_cand = bucketed.join(
            F.broadcast(qs), F.col("bucket") == F.col("qb")
        ).count()
        sweep(
            f"lsh planes={planes} (probe H<=1)",
            lambda p=planes: ann.lsh_bucketed_topk(
                spark, sf_dir, k, n_planes=p
            ),
            n_cand / (n_q * n),
        )

    for probe in (1, 2, 3, 4, 6):
        sweep(
            f"ivf flat probe={probe} (C={n_cents})",
            lambda p=probe: ann.ivf_topk(spark, sf_dir, k, probe=p),
            probe / n_cents,
        )

    for iters in (0, 1, 3, 5):
        sweep(
            f"ivf kmeans iters={iters} probe=3",
            lambda i=iters: ann.ivf_kmeans_topk(
                spark, sf_dir, k, iters=i
            ),
            3 / n_cents,
        )
    for probe in (1, 6):
        sweep(
            f"ivf kmeans iters=3 probe={probe}",
            lambda p=probe: ann.ivf_kmeans_topk(
                spark, sf_dir, k, probe=p
            ),
            probe / n_cents,
        )

    lines = [
        "# BENCH/ANN — recall/cost tuning sweep",
        "",
        f"Corpus: {n} vectors ({sf_dir}), {n_q} queries "
        f"(every {ann.QUERY_EVERY}th), k={k}. recall@{k} vs the exact "
        f"brute-force baseline (t={t_exact:.2f}s). 'scan' is the "
        "fraction of the corpus a query's candidate set covers — the "
        "cost axis that survives scale-up; wall times are warm "
        f"local[8] best-of-{reps} and sandbox-noisy.",
        "",
        "| config | recall@5 | scan frac | t (s) |",
        "|---|---|---|---|",
    ]
    for label, r, sf, t in rows:
        lines.append(f"| {label} | {r:.3f} | {sf:.3f} | {t:.2f} |")
    marker = "<!-- reading: preserved across regeneration -->"
    appendix = ""
    out_path = os.path.join(REPO, "BENCH", "ANN.md")
    if os.path.exists(out_path):
        old = open(out_path).read()
        if marker in old:
            appendix = old.split(marker, 1)[1]
    lines += ["", marker + appendix]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
