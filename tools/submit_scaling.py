"""The north rule VERBATIM: `spark-submit --py-files` of the real
extraction job (job.py — spansify -> extract-then-validate ->
checkpointed parquet sink with lineage) on the live standalone
cluster at TWO cluster sizes, N and 4N executors, reporting
throughput at both plus the scaling efficiency.

Differs from tools/cluster_bench.py (in-process driver sessions,
noop sink, per-query) in being the full deployment artifact end to
end: cold spark-submit JVM, --py-files zip as the only import source,
real partitioned writes and lineage manifests included in the time.
Throughput uses the job's own compute wall (sum of per-batch walls
from the lineage manifest) so JVM/session startup does not distort
the ratio.

Prereq: master + 32-core worker running (see cluster_bench.py).
Usage: python tools/submit_scaling.py [sf_dir] [cycles]
Env:   SPARK_GRAFT_SIZES="2,8" (cores.max small,large; 2-core
       executors -> 1 vs 4 executor JVMs), SPARK_GRAFT_REPLICATE=24.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from submit_job import MASTER as _DEFAULT_LOCAL  # noqa: E402,F401
from submit_job import SPARK_SUBMIT, build_zip  # noqa: E402

CLUSTER = os.environ.get("SPARK_GRAFT_CLUSTER", "spark://127.0.0.1:7077")
SIZES = tuple(
    int(s) for s in os.environ.get("SPARK_GRAFT_SIZES", "2,8").split(",")
)
REPLICATE = os.environ.get("SPARK_GRAFT_REPLICATE", "24")
LOG = os.path.join(REPO, "BENCH", "logs", "submit_scaling_r3.jsonl")


def run_one(zpath: str, scratch: str, sf_dir: str, cores: int) -> dict:
    out = tempfile.mkdtemp(prefix=f"subscale_{cores}_", dir=scratch)
    cmd = [
        SPARK_SUBMIT,
        "--master", CLUSTER,
        "--conf", f"spark.cores.max={cores}",
        "--conf", "spark.executor.cores=2",
        "--conf", "spark.executor.memory=4g",
        "--conf", f"spark.sql.shuffle.partitions={4 * cores}",
        "--py-files", zpath,
        os.path.join(scratch, "job.py"),
        "--master", CLUSTER,
        "--sf-dir", sf_dir,
        "--output", os.path.join(out, "extract"),
        "--n-buckets", "8",
        "--buckets-per-batch", "8",
    ]
    env = dict(os.environ, SPARK_GRAFT_REPLICATE=REPLICATE)
    r = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=scratch,
        env=env,
    )
    rep = json.loads(
        [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    t = rep["totals"]
    return {
        "cores": cores,
        "execs": cores // 2,
        "n_docs": t["n_docs"],
        "wall_s": t["wall_s"],
        "docs_per_sec": round(t["n_docs"] / t["wall_s"], 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    scratch = tempfile.mkdtemp(prefix="submit_scaling_")
    best: dict[int, dict] = {}
    try:
        zpath = build_zip(scratch)
        shutil.copy(os.path.join(REPO, "job.py"), scratch)
        with open(LOG, "a") as log:
            for _ in range(cycles):
                for cores in SIZES:  # interleaved within the cycle
                    r = run_one(zpath, scratch, sf_dir, cores)
                    print(json.dumps(r), flush=True)
                    log.write(json.dumps(r) + "\n")
                    log.flush()
                    cur = best.get(cores)
                    if cur is None or r["wall_s"] < cur["wall_s"]:
                        best[cores] = r
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    small, large = best[SIZES[0]], best[SIZES[1]]
    sp = small["wall_s"] / large["wall_s"]
    eff = sp / (SIZES[1] / SIZES[0])
    print(f"\n| job | n_docs | t({small['execs']}x2) s "
          f"| t({large['execs']}x2) s | docs/s large | speedup "
          f"| efficiency |")
    print("|---|---|---|---|---|---|---|")
    print(f"| spark-submit extract | {small['n_docs']} "
          f"| {small['wall_s']} | {large['wall_s']} "
          f"| {large['docs_per_sec']} | {sp:.2f}x | {eff:.2f} |")


if __name__ == "__main__":
    main()
