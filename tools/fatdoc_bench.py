"""Fat-document micro-bench: the two per-row paths that used to be
quadratic, measured old-vs-new on synthetic documents with a
controlled distinct-term / distinct-number count.

1. T4 word frequency — old: HOF rescan per distinct term
   (transform(distinct, t -> size(filter(toks, x==t)))); new (query):
   posexplode + groupBy hash agg; new (map API): Arrow hash counter.
2. Counter cosine (number_frequency similarity) — old: aggregate over
   the key union re-filtering the full array per key (O(u·n)); new:
   tag-sort-merge fold (O(n log n)), functions.similarity.
   _cosine_from_multisets.

Values are asserted equal between paths before timing is reported
(parity first, speed second). The old paths run under a watchdog that
cancels the job group after --timeout seconds and reports
">N s (cancelled)" — at the fat end they are quadratic enough to run
for hours.

Usage: python tools/fatdoc_bench.py [n_docs] [timeout_s]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pyspark.sql.functions as F

    from blackedge_ocr_spark.functions.similarity import (
        multiset_cosine_arrow,
        multiset_cosine_guarded,
    )
    from blackedge_ocr_spark.functions.text import _word_counter_udf
    from blackedge_ocr_spark.session import build_session

    # 8 docs = one task wave on local[8], so wall time IS per-row cost
    # — and the old quadratic paths stay within the watchdog window
    # instead of leaving uninterruptible codegen tasks behind (a
    # cancelled task only notices between rows; one fat row is minutes)
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    timeout_s = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0

    spark = build_session(master="local[8]", shuffle_partitions=8)
    sc = spark.sparkContext

    def timed(df, label: str):
        """Run to a noop sink inside a cancellable job group; returns
        seconds or the '>N s (cancelled)' marker."""
        sc.setJobGroup(label, label, interruptOnCancel=True)
        done = threading.Event()

        def watchdog():
            if not done.wait(timeout_s):
                sc.cancelJobGroup(label)

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            df.write.format("noop").mode("overwrite").save()
            return f"{time.time() - t0:.2f}"
        except Exception:
            return f">{timeout_s:.0f} (cancelled)"
        finally:
            done.set()
            # no clearJobGroup in PySpark — the next timed() call
            # overrides the group; reset the local property meanwhile
            sc.setLocalProperty("spark.jobGroup.id", None)

    def mk_docs(n_tok: int, n_dist: int):
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(n_tok - 1)),
            lambda i: F.concat(
                F.lit("term"), F.pmod(i * 2654435761 + F.col("id"), F.lit(n_dist))
            ),
        )
        d = spark.range(0, n_docs, 1, 8).select("id", toks.alias("toks")).cache()
        d.count()
        return d

    def old_wf(docs):
        dist = F.array_distinct(F.col("toks"))
        return docs.select(
            "id",
            F.map_from_arrays(
                dist,
                F.transform(
                    dist,
                    lambda term: F.size(F.filter(F.col("toks"), lambda x: x == term)),
                ),
            ).alias("wf"),
        )

    def old_cos(na, nb):
        count_in = lambda arr, k: F.size(F.filter(arr, lambda x: x == k)).cast(
            "double"
        )
        ka, kb = F.array_distinct(na), F.array_distinct(nb)
        dot = F.aggregate(
            F.array_union(ka, kb),
            F.lit(0.0),
            lambda acc, k: acc + count_in(na, k) * count_in(nb, k),
        )
        ma = F.sqrt(
            F.aggregate(
                ka, F.lit(0.0), lambda acc, k: acc + F.pow(count_in(na, k), 2)
            )
        )
        mb = F.sqrt(
            F.aggregate(
                kb, F.lit(0.0), lambda acc, k: acc + F.pow(count_in(nb, k), 2)
            )
        )
        return F.when(ma * mb == 0, F.lit(0.0)).otherwise(dot / (ma * mb))

    print(f"\nn_docs={n_docs}, local[8], timeout {timeout_s:.0f}s per cell")
    print("| tokens/doc | distinct/doc | path | seconds |")
    print("|---|---|---|---|")

    for n_tok, n_dist in ((3000, 1000), (30000, 10000)):
        docs = mk_docs(n_tok, n_dist)

        new_wf_query = (
            docs.select("id", F.explode("toks").alias("term"))
            .groupBy("id", "term")
            .agg(F.count("*").alias("n"))
        )
        new_wf_map = docs.select("id", _word_counter_udf(F.col("toks")).alias("wf"))
        # parity on one doc (old path is feasible on a single row)
        a = {
            r["term"]: r["n"]
            for r in new_wf_query.filter(F.col("id") == 0).collect()
        }
        c = dict(new_wf_map.filter(F.col("id") == 0).head()["wf"])
        assert a == c, "word-frequency paths disagree"
        if n_dist <= 1000:
            b = dict(old_wf(docs).filter(F.col("id") == 0).head()["wf"])
            assert a == b, "old word-frequency path disagrees"

        rows = [
            ("word_frequency HOF rescan (old)", timed(old_wf(docs), f"owf{n_dist}")),
            (
                "word_frequency explode+groupBy (query path)",
                timed(new_wf_query, f"nwfq{n_dist}"),
            ),
            (
                "word_frequency Arrow counter (map API)",
                timed(new_wf_map, f"nwfm{n_dist}"),
            ),
        ]

        pairs = (
            docs.alias("a")
            .join(docs.alias("b"), F.col("a.id") + 1 == F.col("b.id"))
            .select(
                F.col("a.id").alias("id"),
                F.col("a.toks").alias("ta"),
                F.col("b.toks").alias("tb"),
            )
            .cache()
        )
        pairs.count()

        new_c = pairs.select(
            "id", multiset_cosine_guarded(F.col("ta"), F.col("tb")).alias("cos")
        )
        arrow_c = pairs.select(
            "id", multiset_cosine_arrow(F.col("ta"), F.col("tb")).alias("cos")
        )
        va = new_c.filter(F.col("id") == 0).head()["cos"]
        vb = arrow_c.filter(F.col("id") == 0).head()["cos"]
        assert va == vb, (va, vb)  # bit-identical, not approx
        if n_dist <= 1000:
            vo = (
                pairs.filter(F.col("id") == 0)
                .select(old_cos(F.col("ta"), F.col("tb")).alias("cos"))
                .head()["cos"]
            )
            assert va == vo, (va, vo)

        rows += [
            (
                "counter cosine O(u·n) HOF (old)",
                timed(
                    pairs.select(
                        "id", old_cos(F.col("ta"), F.col("tb")).alias("cos")
                    ),
                    f"ocos{n_dist}",
                ),
            ),
            (
                "counter cosine sort-merge fold (new, JVM)",
                timed(new_c, f"ncos{n_dist}"),
            ),
            ("counter cosine Arrow hash counter", timed(arrow_c, f"acos{n_dist}")),
        ]
        for name, sec in rows:
            print(f"| {n_tok} | ~{n_dist} | {name} | {sec} |")
        docs.unpersist()
        pairs.unpersist()

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
