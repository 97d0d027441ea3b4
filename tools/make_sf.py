"""Deterministic scale-up of a driver testdata dir for benchmarking.

Replicates the three engine-facing tables (documents, embeddings,
events) K times with disjoint id ranges — replica k of doc_id d gets
doc_id d + k*stride — and copies the remaining tables verbatim. The
result is a directory bench.py can point at (name it ``sfX`` so the
harness parses the scale factor from the path).

Replication semantics, chosen on purpose:
- documents: text is replicated UNCHANGED, so the corpus contains
  duplicate clusters of size K. That is the shape web-scale corpora
  actually have (boilerplate, mirrors, syndication) and exactly what
  the dedup operators exist for; LSH pair counts grow with cluster
  size C(K,2) per group, which is the honest cost of deduping such a
  corpus, not a benchmark artifact.
- events: user_id is offset per replica (u + k*stride), so the user
  population grows 10x while per-user session structure is preserved
  — horizontal growth, no artificial hot keys.
- embeddings: vec_id offset per replica; vectors unchanged (ANN cost
  scales as queries x corpus = K^2, the true brute-force scaling).

Everything is a pure function of the input dir — no RNG, no clock.

Usage: python tools/make_sf.py [src_dir] [dst_dir] [K]
       defaults: /root/testdata/sf0.1 .data/sf1 10
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPLICATED = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".data/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    con = duckdb.connect()
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        table = fn[: -len(".parquet")]
        sp, dp = f"{src}/{fn}", f"{dst}/{fn}"
        if table not in REPLICATED:
            shutil.copyfile(sp, dp)
            print(f"copied   {table}")
            continue
        id_cols = REPLICATED[table]
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{sp}'").fetchall()]
        # stride = next power of 10 above the max id, so replica ids
        # are disjoint AND human-readable (replica k = leading digit).
        strides = {}
        for c in id_cols:
            m = con.sql(f"SELECT max({c}) FROM '{sp}'").fetchone()[0]
            s = 10
            while s <= m:
                s *= 10
            strides[c] = s
        sel = ", ".join(
            f"({c} + r.k * {strides[c]})::BIGINT AS {c}" if c in id_cols else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{sp}', "
            f"(SELECT unnest(range({k})) AS k) r ORDER BY r.k) "
            f"TO '{dp}' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dp}'").fetchone()[0]
        print(f"scaled   {table} x{k} -> {n} rows (strides {strides})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
