"""Substring-dedup mega-doc probe: the worst per-row shape for the
interval machinery — ONE long document built as alternating
[k duplicated tokens | k unique tokens] blocks, so every other k-gram
window duplicates and the merged runs are as NUMEROUS as possible
(n_runs ~ n_tokens / 2k).

Measures the shipped gap-slice reassembly (O(n + runs) per row)
against the per-position exists() mask it replaced (O(n * runs) —
the word_frequency per-row-quadratic class). Prints JSON rows for
BENCH/SKEW.md.

Usage: python tools/substring_skew_bench.py [n_tokens]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pyspark.sql.functions as F

    from blackedge_ocr_spark.analysis import scrub
    from blackedge_ocr_spark.session import build_session

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    k = scrub.SUB_GRAM_K
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus)

    # Monster doc: blocks of k shared tokens (verbatim in doc 1) and k
    # unique tokens. Every shared block is a duplicated k-gram; the
    # unique spacers stop runs from merging -> maximal run count.
    blocks = n // (2 * k)
    shared = ["dup%d w%d x%d y%d a%d b%d c%d d%d" % ((i % 7,) * 8)
              for i in range(blocks)]
    monster = []
    for i in range(blocks):
        monster.append(shared[i])
        monster.append(" ".join(f"u{i}q{j}" for j in range(k)))
    rows = [
        (0, " ".join(monster)),
        (1, " ".join(shared)),  # the other copy of every shared block
        (2, "plain unique filler document nothing here repeats"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    out = scrub.substring_dedup(d)
    wall = timed(out)
    stats = {r["doc_id"]: r for r in out.collect()}
    m = stats[0]
    print(json.dumps({"stage": "shipped", "wall_s": wall,
                      "n_tokens": m["n_tokens"], "n_runs": m["n_runs"]}),
          flush=True)
    if os.environ.get("SKIP_MASK"):
        return 0

    # The replaced per-position mask rebuilt inline (mirrors the
    # pre-fix code path, INCLUDING its persisted gram table — the
    # comparison isolates the reassembly step, not pipeline reuse).
    corpus = scrub.with_quote_injection(d)
    from blackedge_ocr_spark.functions.text import tokens as _toks

    t = corpus.select("doc_id", _toks(F.col("text")).alias("toks"))
    nn = F.size("toks")
    starts = F.when(
        nn >= k, F.sequence(F.lit(1), nn - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    ex = (
        t.select("doc_id", "toks", F.explode(starts).alias("p"))
        .select("doc_id", "p", F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("p"), k))
        ).alias("g"))
        .persist()
    )
    dup = ex.groupBy("g").count().filter("count >= 2").select("g")
    perdoc = ex.join(dup, "g").groupBy("doc_id").agg(
        F.array_sort(F.collect_list("p")).alias("ps"))
    j = t.join(perdoc, "doc_id", "left").select(
        "doc_id", "toks",
        F.coalesce("ps", F.array().cast("array<int>")).alias("ps"))
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    ivs = F.aggregate(
        F.col("ps"), F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= last(acc)["e"]),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.struct(
                last(acc)["s"].alias("s"),
                F.greatest(last(acc)["e"], p + k).alias("e")))),
        ).otherwise(F.concat(acc, F.array(
            F.struct(p.alias("s"), (p + k).alias("e"))))))
    staged = j.select("doc_id", "toks", ivs.alias("ivs"))
    kept_mask = F.filter(
        F.col("toks"),
        lambda x, i: ~F.exists(
            F.col("ivs"),
            lambda iv: (iv["s"] <= i + 1) & (i + 1 < iv["e"])),
    )
    masked = staged.select(
        "doc_id", F.md5(F.concat_ws(" ", kept_mask)).alias("kept_md5"))
    wall_mask = timed(masked)
    mask_rows = {r["doc_id"]: r["kept_md5"] for r in masked.collect()}
    same = all(
        mask_rows[i] == stats[i]["kept_md5"] for i in mask_rows
    )

    print(json.dumps({
        "n_tokens": m["n_tokens"], "n_runs": m["n_runs"],
        "dup_tokens": m["dup_tokens"],
        "shipped_gap_slice_s": wall,
        "exists_mask_s": wall_mask,
        "outputs_identical": same,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
