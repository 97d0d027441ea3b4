"""Streaming MinHash-LSH near-dup: survivors match the batch pair
semantics (drop b iff some earlier a shares a capped bucket AND true
shingle Jaccard >= threshold), and the persistent registries make a
restarted query suppress near-dups of pre-restart documents.
"""

from __future__ import annotations

import os
import shutil
import time

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _write_in_order(tmp_path, inp, frames):
    """One parquet file per frame, mtimes ascending so the file
    stream delivers them in id order (the cap-parity assumption)."""
    inp.mkdir(exist_ok=True)
    for i, df in enumerate(frames):
        stage = tmp_path / f"s{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        src = next(p for p in stage.iterdir() if p.suffix == ".parquet")
        dst = inp / f"file{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (time.time() + i, time.time() + i))


def _batch_dropped(full, min_jaccard=0.5):
    from blackedge_ocr_spark.analysis import dedup

    pairs = dedup.lsh_candidate_pairs(full, min_jaccard=min_jaccard)
    return {r["doc_b"] for r in pairs.select("doc_b").distinct().collect()}


def test_stream_neardup_matches_batch_pairs_and_survives_restart(
    spark, tmp_path
):
    from blackedge_ocr_spark.streaming import stream_neardup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # near-copies: every 10th doc with a short appended tail — high
    # but non-1.0 shingle Jaccard; plus one exact copy and one
    # genuinely new doc
    near = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail word")))
    )
    exact = (
        docs.filter(F.col("doc_id") == 3)
        .withColumn("doc_id", F.lit(1_500_000).cast("long"))
    )
    fresh = docs.limit(1).select(
        F.lit(2_000_000).cast("long").alias("doc_id"),
        F.lit(
            "completely unrelated brand new content about nothing else"
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    inp = tmp_path / "nin"
    _write_in_order(
        tmp_path, inp, [docs, near.unionByName(exact).unionByName(fresh)]
    )
    out, ckpt = str(tmp_path / "nout"), str(tmp_path / "nckpt")
    bands, sigs = str(tmp_path / "nbands"), str(tmp_path / "nsigs")

    q = stream_neardup(spark, str(inp), out, ckpt, bands, sigs)
    q.awaitTermination(300)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    full = docs.unionByName(near).unionByName(exact).unionByName(fresh)
    expect = {
        r["doc_id"] for r in full.select("doc_id").collect()
    } - _batch_dropped(full)
    assert got == expect
    assert 2_000_000 in got  # the new doc always survives
    assert 1_500_000 not in got  # the exact copy never does

    # restart: late near-copies of pre-restart docs + one new doc —
    # the registries (not the checkpoint) must carry the history
    late = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 3_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail word")))
    )
    fresh2 = docs.limit(1).select(
        F.lit(4_000_000).cast("long").alias("doc_id"),
        F.lit("another never before seen unique late document").alias(
            "text"
        ),
        "lang", "source", "n_chars",
    )
    stage = tmp_path / "s9"
    late.unionByName(fresh2).coalesce(1).write.mode("overwrite").parquet(
        str(stage)
    )
    src = next(p for p in stage.iterdir() if p.suffix == ".parquet")
    dst = inp / "file9.parquet"
    shutil.copy(src, dst)
    os.utime(dst, (time.time() + 9, time.time() + 9))

    q2 = stream_neardup(spark, str(inp), out, ckpt, bands, sigs)
    q2.awaitTermination(300)

    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    full2 = full.unionByName(late).unionByName(fresh2)
    expect2 = {
        r["doc_id"] for r in full2.select("doc_id").collect()
    } - _batch_dropped(full2)
    assert got2 == expect2
    assert 4_000_000 in got2


def test_stream_neardup_monster_bucket_star_tail(spark, tmp_path):
    """A hot bucket BEYOND the cap must not leak duplicates through
    the stream (the round-4 star-tail parity): 30 identical docs with
    bucket_cap=8 — in-batch beyond-cap copies AND a later batch's
    copies all pair with the bucket head and are suppressed, exactly
    like the batch path's capped+star enumeration."""
    from blackedge_ocr_spark.streaming import stream_neardup

    text = (
        "quarterly revenue summary table northern region adjusted "
        "operating margin headcount detail prepared by finance"
    )
    other = "entirely different content about rivers gardens and stars"
    rows1 = [(i, text, "en", "crawl", len(text)) for i in range(20)]
    rows1.append((90, other, "en", "crawl", len(other)))
    rows2 = [(100 + i, text, "en", "crawl", len(text)) for i in range(10)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inp = tmp_path / "in"
    _write_in_order(
        tmp_path,
        inp,
        [spark.createDataFrame(rows1, schema),
         spark.createDataFrame(rows2, schema)],
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    bands, sigs = str(tmp_path / "bands"), str(tmp_path / "sigs")
    q = stream_neardup(
        spark, str(inp), out, ckpt, bands, sigs, bucket_cap=8
    )
    q.awaitTermination()
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    # head 0 survives; every other copy — within cap (1..7), beyond
    # cap in-batch (8..19), and cross-batch (100..109) — suppressed
    assert got == [0, 90], got


def test_stream_neardup_reads_legacy_plain_append_registries(
    spark, tmp_path
):
    """Pre-round-4 registries were plain ``mode('append')`` parquet
    with NO run/batch_id partition columns; ``_read_prior`` must
    treat such a table as pure prior history (nothing in it can be a
    failed attempt of THIS run) instead of raising an
    unresolved-column AnalysisException (round-4 advice)."""
    from blackedge_ocr_spark.analysis.dedup import (
        lsh_band_keys,
        minhash_signature_arrow,
        word_shingles,
    )
    from blackedge_ocr_spark.streaming import stream_neardup

    text = (
        "annual compliance report southern district itemized expense "
        "ledger reviewed by the audit committee in closed session"
    )
    other = "fresh unrelated prose about tidepools lanterns and maps"
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    seed = spark.createDataFrame(
        [(1, text, "en", "crawl", len(text))], schema
    )
    bands, sigs = str(tmp_path / "lbands"), str(tmp_path / "lsigs")
    # register the seed doc in the LEGACY layout (no partitions)
    sh = seed.withColumn(
        "shingles", word_shingles(F.col("text"))
    ).withColumn("sig", minhash_signature_arrow(F.col("shingles")))
    sh.select("doc_id", "shingles").write.mode("append").parquet(sigs)
    (
        sh.select(
            "doc_id", F.explode(lsh_band_keys(F.col("sig"))).alias("bk")
        )
        .select("bk.band", "bk.key", "doc_id")
        .filter(F.col("key").isNotNull())
        .write.mode("append")
        .parquet(bands)
    )

    # stream a copy of the registered doc plus one genuinely new doc
    batch = spark.createDataFrame(
        [
            (50, text, "en", "crawl", len(text)),
            (60, other, "en", "crawl", len(other)),
        ],
        schema,
    )
    inp = tmp_path / "lin"
    _write_in_order(tmp_path, inp, [batch])
    out, ckpt = str(tmp_path / "lout"), str(tmp_path / "lckpt")
    q = stream_neardup(spark, str(inp), out, ckpt, bands, sigs)
    q.awaitTermination()
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(out).select("doc_id").collect()
    )
    # the copy of the legacy-registered doc is suppressed; the new
    # doc survives — and no AnalysisException was raised
    assert got == [60], got
