"""Evidence run for the north rule's launch mode: package the engine
as a zip and drive it through REAL ``spark-submit --py-files``, twice —
an interrupted first pass (--max-batches) and a resuming second pass —
then verify the checkpoint/lineage contract on the output.

The driver-side library tests (tests/test_lineage.py) already prove
resume semantics in-process; this script proves the DEPLOYMENT shape:
the package importing from a --py-files zip only (cwd is a scratch
dir, so nothing resolves from the repo checkout), per-partition
lineage written by a cold spark-submit JVM, and a kill/rerun cycle
that skips completed buckets.

Usage: python tools/submit_job.py [sf_dir]
Prints a summary JSON line; exits nonzero on any contract violation.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
# Default: cold local[8] JVM. Point at a live standalone master
# (SPARK_GRAFT_MASTER=spark://127.0.0.1:7077) to run the identical
# deployment against REAL remote executor JVMs — the package then
# reaches executors only through spark-submit's --py-files shipping.
MASTER = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "engine.zip")
    pkg = os.path.join(REPO, "blackedge_ocr_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def submit(zpath: str, scratch: str, out: str, extra: list[str]) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", MASTER,
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.cores.max=8",
        "--conf", "spark.executor.cores=2",
        "--conf", "spark.executor.memory=4g",
        "--py-files", zpath,
        os.path.join(scratch, "job.py"),
        "--output", out,
        "--n-buckets", "8",
        "--buckets-per-batch", "2",
        # job.py must receive the master EXPLICITLY: build_session
        # falls back to local[n] when none is passed, which would
        # silently override spark-submit's --master and run the
        # whole job in-process (caught by checking the standalone
        # master's log for the app registration).
        "--master", MASTER,
    ] + extra
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd=scratch, check=True
    )
    last = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    scratch = tempfile.mkdtemp(prefix="submit_evidence_")
    out = os.path.join(scratch, "extract_out")
    try:
        zpath = build_zip(scratch)
        # job.py rides NEXT TO the zip (the submitted script is not
        # importable from --py-files); the package itself must come
        # from the zip — scratch cwd guarantees no repo fallback.
        shutil.copy(os.path.join(REPO, "job.py"), scratch)

        first = submit(zpath, scratch, out,
                       ["--sf-dir", sf_dir, "--max-batches", "2"])
        second = submit(zpath, scratch, out, ["--sf-dir", sf_dir])

        ok = (
            first["processed"] == 4 and first["skipped"] == 0
            and second["processed"] == 4 and second["skipped"] == 4
            and second["totals"]["n_docs"] > 0
            and second["totals"]["n_errors"] == 0
        )
        print(json.dumps({
            "launch": "spark-submit --py-files engine.zip",
            "zip_kb": os.path.getsize(zpath) // 1024,
            "first_pass": first,
            "resume_pass": second,
            "contract_ok": ok,
        }))
        return 0 if ok else 1
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    return_code = main()
    sys.exit(return_code)
