"""Interleaved A/B scaling comparison: HEAD vs an old worktree.

Alternates (code, cpus) measurements within the same minutes so this
VM's bursty drift hits both sides equally. Appends JSON lines with a
"code" field to BENCH/logs/ab_r3.jsonl.

Usage: python tools/ab_scaling.py <query> <replicate> <cycles> [levels...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OLD = os.path.join(REPO, ".ab_old")
LOG = os.path.join(REPO, "BENCH", "logs", "ab_r3.jsonl")


def run_one(tree: str, cpus: int, query: str, replicate: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_REPLICATE=str(replicate))
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "tools", "_bench_runner.py"),
         str(cpus), "/root/testdata/sf0.1", query, "1"],
        capture_output=True, text=True, check=True, cwd=tree, env=env,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["code"] = "new" if tree == REPO else "old"
    r["t_wall"] = round(time.time())
    return r


def main() -> None:
    query = sys.argv[1]
    replicate = int(sys.argv[2])
    cycles = int(sys.argv[3])
    levels = [int(x) for x in sys.argv[4:]] or [4]
    with open(LOG, "a") as f:
        for _ in range(cycles):
            for cpus in levels:
                for tree in (REPO, OLD):
                    r = run_one(tree, cpus, query, replicate)
                    print(json.dumps(r), flush=True)
                    f.write(json.dumps(r) + "\n")
                    f.flush()


if __name__ == "__main__":
    main()
