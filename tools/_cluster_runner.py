"""Single-measurement child for cluster_bench.py — REAL standalone
cluster edition: connects to a running spark://127.0.0.1:7077 master
and takes `cores_max` cores as cores_max/2 SEPARATE 2-core executor
JVMs, so the measurement exercises real executor-to-executor netty
shuffles and per-executor Python worker pools (not local-mode
in-process threads). The engine package ships to executors via
addPyFile(engine.zip) — the same artifact spark-submit deploys.

Usage: python tools/_cluster_runner.py <cores_max> <sf_dir> <query> [reps]
Prints one JSON line {"cores":…, "execs":…, "query":…, "sec":…, "n_docs":…}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

MASTER = os.environ.get("SPARK_GRAFT_CLUSTER", "spark://127.0.0.1:7077")
EXEC_CORES = 2


def _engine_zip() -> str:
    # Rebuilt EVERY run (cheap — a few hundred KB of .py): a cached
    # zip would silently ship stale engine code to executors after a
    # source edit, attributing measurements to code that didn't run.
    path = "/tmp/engine_cluster.zip"
    if os.path.exists(path):
        os.unlink(path)
    subprocess.run(
        ["zip", "-qr", path, "blackedge_ocr_spark"],
        cwd=REPO, check=True,
    )
    return path


def main() -> None:
    cores, sf_dir, query = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "1"))

    import __spark_entry__ as se
    from blackedge_ocr_spark.session import build_session

    spark = build_session(
        master=MASTER,
        app_name=f"cluster-bench-{query}-{cores}",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.cores.max": str(cores),
            "spark.executor.cores": str(EXEC_CORES),
            "spark.executor.memory": "4g",
        },
    )
    spark.sparkContext.addPyFile(_engine_zip())

    qs = se.queries()
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count() * replicate
    )

    # Warm executor JVMs + Python workers on the tiny corpus first.
    qs[query](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    # Executor JVMs have registered by now (the warmup ran on them);
    # getExecutorInfos lists the driver too — exclude it.
    execs = (
        len(
            spark.sparkContext._jsc.sc()
            .statusTracker().getExecutorInfos()
        )
        - 1
    )

    best = None
    for _ in range(reps):
        t0 = time.time()
        qs[query](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)

    print(json.dumps({
        "cores": cores, "execs": execs, "query": query,
        "sec": round(best, 3), "n_docs": n_docs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
