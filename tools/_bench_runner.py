"""Single-measurement child process for scaling_bench.py.

Usage: python tools/_bench_runner.py <cpus> <sf_dir> <query> [reps]
Prints one JSON line {"cpus":…, "query":…, "sec":…, "n_docs":…}.
A fresh process per measurement keeps JVMs independent (local[8] vs
local[32] really get different executor pools).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus, sf_dir, query = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "1"))

    import __spark_entry__ as se
    from blackedge_ocr_spark.session import build_session

    spark = build_session(master=f"local[{cpus}]")
    qs = se.queries()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count() * replicate

    # Warm up JVM + Python workers on the tiny corpus.
    qs[query](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    best = None
    for _ in range(reps):
        t0 = time.time()
        qs[query](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)

    print(json.dumps({"cpus": cpus, "query": query, "sec": round(best, 3),
                      "n_docs": n_docs}))
    spark.stop()


if __name__ == "__main__":
    main()
