"""Paragraph-dedup skew probe: a boilerplate paragraph shared by
EVERY document (the classic web-corpus hot key — a copyright footer
in 10^9 pages) run through

  shipped — scrub.paragraph_dedup (min-struct hash-agg keeper,
            map-side combinable, + AQE join back)
  window  — the naive row_number() OVER (PARTITION BY hash) keeper,
            which sorts every copy of the hot paragraph in ONE task

Evidence: wall + per-task executorRunTime p50/p99/max via the Spark
UI REST API (reuses skew_bench helpers). Appends to BENCH/SKEW.md by
hand — this prints the JSON rows.

Usage: python tools/para_skew_bench.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.skew_bench import last_stage_id, scenario_stats  # noqa: E402

BOILER = "(c) example corp - all rights reserved - terms at example.com"


def main() -> int:
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from blackedge_ocr_spark.analysis import scrub
    from blackedge_ocr_spark.datagen import replicate_corpus
    from blackedge_ocr_spark.queries import _lined_text
    from blackedge_ocr_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    spark = build_session(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    base = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    corpus = replicate_corpus(
        base.repartition(cpus * 4, "doc_id"), rep
    ).select(
        "doc_id",
        # boilerplate first line on EVERY doc -> one paragraph hash
        # carries |corpus| copies
        F.concat(
            F.lit(BOILER + "\n"),
            _lined_text(F.col("doc_id"), F.col("text")),
        ).alias("text"),
    )

    def window_dedup(docs):
        """The naive keeper the shipped operator refuses to be."""
        lines = F.split(F.col("text"), scrub.LINE_SEP, -1)
        ex = docs.select(
            "doc_id", F.posexplode(lines).alias("idx", "para")
        ).select("doc_id", "idx", "para", F.md5("para").alias("h"))
        w = Window.partitionBy("h").orderBy("doc_id", "idx")
        ranked = ex.withColumn("rn", F.row_number().over(w))
        kept = F.col("rn") == 1
        # identical output columns to the shipped operator — the only
        # difference under comparison is the keeper mechanism
        return ranked.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_paras"),
            F.sum(kept.cast("int")).cast("long").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(kept, F.struct("idx", "para"))
                            )
                        ),
                        lambda s: s["para"],
                    ),
                    scrub.LINE_SEP,
                )
            ).alias("kept_md5"),
        )

    def run(name, build):
        mark = last_stage_id(ui, app_id)
        t0 = time.time()
        build(corpus).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        stats = scenario_stats(ui, app_id, mark)
        row = {
            "scenario": name,
            "wall_s": round(wall, 2),
            **{
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in stats.items()
            },
        }
        print(json.dumps(row))
        return row

    # warmup
    scrub.paragraph_dedup(corpus.limit(500)).write.format("noop").mode(
        "overwrite"
    ).save()

    n = corpus.count()
    print(json.dumps({"corpus_docs": n, "hot_paragraph_copies": n}))
    run("shipped min-struct agg", scrub.paragraph_dedup)
    run("naive window keeper", window_dedup)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
