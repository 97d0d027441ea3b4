"""Packing-skew probe: one mega source holding ~97% of the corpus.

Single-phase token_packing cumsums the whole mega source in ONE window
task; token_packing_2p distributes the prefix sum over doc_id-range
buckets. Prints wall time + task-tail rows (same Spark-UI REST
methodology as tools/skew_bench.py) and a parity check; paste into
BENCH/SKEW.md.

Usage: python tools/packing_skew_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skew_bench import last_stage_id, scenario_stats  # noqa: E402


def main() -> int:
    import pyspark.sql.functions as F

    from blackedge_ocr_spark.analysis import corpusops
    from blackedge_ocr_spark.session import build_session

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = build_session(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # 97% of docs in one "mega" source, the rest over 40 small ones;
    # ~12-token texts so the window (not the tokenizer) dominates.
    d_dir = tempfile.mkdtemp(prefix="pack_skew_")
    spark.range(0, n_docs, 1, cpus * 4).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta iota kappa "),
            (F.col("id") % 997).cast("string"),
        ).alias("text"),
        F.when(F.col("id") % 32 != 0, F.lit("mega"))
        .otherwise(F.concat(F.lit("src"), (F.col("id") % 40).cast("string")))
        .alias("source"),
    ).write.mode("overwrite").parquet(f"{d_dir}/documents.parquet")
    docs = spark.read.parquet(f"{d_dir}/documents.parquet")

    def run(name, fn) -> dict:
        mark = last_stage_id(ui, app_id)
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        stats = scenario_stats(ui, app_id, mark)
        row = {"scenario": name, "wall_s": round(wall, 2), **{
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in stats.items()
        }}
        print(json.dumps(row))
        return row

    # warmup
    corpusops.token_packing(docs.limit(1000)).write.format("noop").mode(
        "overwrite"
    ).save()

    run(f"mega-source {n_docs} docs, single-phase", corpusops.token_packing)
    run(
        f"mega-source {n_docs} docs, two-phase",
        lambda d: corpusops.token_packing_2p(d),
    )

    a = sorted(corpusops.token_packing(docs).collect())
    b = sorted(corpusops.token_packing_2p(docs).collect())
    print(f"parity: single={len(a)} rows, two-phase={len(b)} rows, "
          f"equal={a == b}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
