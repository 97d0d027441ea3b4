"""Local simulation of the driver's correctness gate.

For each entry in ``__spark_entry__.queries()``: run the Spark
DataFrame at the given sf dir, run the matching ``oracle_sql()`` in
DuckDB over the same parquet tables, and compare row count, column
names, and order-insensitive values. Floats are compared exactly
(both sides are expected to round); near-misses are reported.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if v is None:
        return "<NULL>"
    return str(v)


def main() -> int:
    import duckdb

    import __spark_entry__ as se
    from blackedge_ocr_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = se.queries(), se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spd = sdf.toPandas()
        t1 = time.time()
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(spd)} rows  ({t1 - t0:.1f}s)")
            if len(spd) == 0:
                print(f"  !! EMPTY result")
                failures += 1
            continue
        try:
            opd = con.sql(sql).df()
        except Exception as exc:
            print(f"[FAIL oracle-sql] {name}: {exc}")
            failures += 1
            continue
        t2 = time.time()
        ok = True
        if sorted(spd.columns) != sorted(opd.columns):
            print(f"[FAIL cols] {name}: spark={sorted(spd.columns)} "
                  f"oracle={sorted(opd.columns)}")
            ok = False
        if len(spd) != len(opd):
            print(f"[FAIL rows] {name}: spark={len(spd)} oracle={len(opd)}")
            ok = False
        if ok:
            cols = sorted(spd.columns)
            a = sorted(tuple(canon(v) for v in row)
                       for row in spd[cols].itertuples(index=False))
            b = sorted(tuple(canon(v) for v in row)
                       for row in opd[cols].itertuples(index=False))
            if a != b:
                ok = False
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                print(f"[FAIL values] {name}: {len(diffs)} differing "
                      f"(of {len(a)}) — first 3:")
                for x, y in diffs[:3]:
                    print(f"   spark : {x}\n   oracle: {y}")
        if ok:
            print(f"[OK] {name}: {len(spd)} rows "
                  f"(spark {t1 - t0:.1f}s, duckdb {t2 - t1:.1f}s)")
        else:
            failures += 1
    print(f"\n{'PASS' if failures == 0 else f'FAILURES: {failures}'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
