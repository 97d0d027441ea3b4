"""REAL two-cluster-size scaling evidence → BENCH/logs/cluster_r4.jsonl.

The north rule's criterion is throughput scaling efficiency >= 0.8
between a cluster of N executors and one of 4N. local[K] models this
with in-process threads; this tool measures it on an actual
standalone cluster on this host — a live master at
spark://127.0.0.1:7077 with a 32-core worker — by capping
spark.cores.max so the SAME job runs as

  small: 2 executor JVMs x 2 cores =  4 cores   (N)
  large: 8 executor JVMs x 2 cores = 16 cores   (4N)

Executors are separate JVMs with their own Python worker pools;
shuffles cross process boundaries over netty exactly as on a
multi-machine fleet (minus the NIC). Both sizes stay within the
~16 physical cores, so SMT contention does not confound the ratio.

Measurements interleave small/large within each cycle (this VM's
noise is bursty; interleaving hits both sides equally — see
BENCH/BASELINE.md noise forensics), best-of across cycles.

Prereq (started once, outside this script):
  spark-class org.apache.spark.deploy.master.Master --host 127.0.0.1
  spark-class org.apache.spark.deploy.worker.Worker \
      spark://127.0.0.1:7077 --cores 32 --memory 64g
with PYSPARK_PYTHON set in the worker's env.

Usage: python tools/cluster_bench.py [sf_dir] [cycles]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOG = os.path.join(REPO, "BENCH", "logs", "cluster_r4.jsonl")

# Same per-query corpus blow-up as tools/scaling_bench.py, halved:
# the 4-core small cluster must finish in sane wall time.
QUERIES = {"pipeline_extract": 96, "extract_content": 384,
           "similarity_pairs": 12}
# cores.max N and 4N. Override: SPARK_GRAFT_SIZES="2,8".
# 4,16 uses 2 vs 8 executor JVMs (the 16-core size saturates the
# host's ~16 physical cores once 8 JVMs' GC/netty threads and Python
# pools stack on top — contention a real 4N-machine fleet would not
# pay); 2,8 (1 vs 4 executors) stays comfortably inside the physical
# cores and is the cleaner adding-machines proxy on one host.
SIZES = tuple(
    int(s) for s in os.environ.get("SPARK_GRAFT_SIZES", "4,16").split(",")
)


def run_one(cores: int, sf_dir: str, query: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_REPLICATE=str(QUERIES[query]))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "_cluster_runner.py"),
         str(cores), sf_dir, query],
        capture_output=True, text=True, check=True, cwd=REPO, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    best: dict[str, dict[int, dict]] = {q: {} for q in QUERIES}
    with open(LOG, "a") as log:
        for _ in range(cycles):
            for query in QUERIES:
                for cores in SIZES:  # interleaved within the cycle
                    r = run_one(cores, sf_dir, query)
                    print(json.dumps(r), flush=True)
                    log.write(json.dumps(r) + "\n")
                    log.flush()
                    cur = best[query].get(cores)
                    if cur is None or r["sec"] < cur["sec"]:
                        best[query][cores] = r

    print("\n| query | n_docs | execs x cores | t(N=4c) s | t(4N=16c) s "
          "| speedup | efficiency |")
    print("|---|---|---|---|---|---|---|")
    for query, by in best.items():
        small, large = by[SIZES[0]], by[SIZES[1]]
        sp = small["sec"] / large["sec"]
        eff = sp / (SIZES[1] / SIZES[0])
        print(f"| {query} | {small['n_docs']} "
              f"| {small['execs']}x2 -> {large['execs']}x2 "
              f"| {small['sec']} | {large['sec']} "
              f"| {sp:.2f}x | {eff:.2f} |")


if __name__ == "__main__":
    main()
