"""Training-shard sink: write → manifest → verify round trip, plus
the failure modes the manifest exists to catch (missing shard,
tampered payload)."""

import json
import shutil

from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis.corpusops import corpus_shuffle
from blackedge_ocr_spark.queries import _docs
from blackedge_ocr_spark.sinks import (
    verify_training_shards,
    write_training_shards,
)

SF = "/root/testdata/sf0.001"


def _assigned(spark):
    d = _docs(spark, SF).select("doc_id", "text")
    return corpus_shuffle(d).join(d, "doc_id").select(
        "shard", "pos", "doc_id", "text"
    )


def test_shard_write_manifest_and_verify_roundtrip(spark, tmp_path):
    out = str(tmp_path / "shards")
    a = _assigned(spark)
    manifest = write_training_shards(a, out)

    # manifest totals equal the frame's own aggregates
    assert manifest["n_docs"] == a.count()
    assert manifest["n_shards"] == a.select("shard").distinct().count()
    on_disk = json.load(open(f"{out}/_manifest.json"))
    assert on_disk == manifest

    # verify passes on the untouched store
    v = verify_training_shards(spark, out)
    assert v["ok"], v

    # each shard read back ordered by pos is a contiguous 1..n run
    # (the training order contract)
    back = spark.read.parquet(out)
    bad = (
        back.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.count_distinct("pos").alias("nd"),
        )
        .filter(
            ~((F.col("lo") == 1) & (F.col("hi") == F.col("n"))
              & (F.col("nd") == F.col("n")))
        )
        .count()
    )
    assert bad == 0


def test_shard_verify_catches_missing_shard(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(_assigned(spark), out)
    victim = sorted(manifest["shards"])[0]
    shutil.rmtree(f"{out}/shard={victim}")
    v = verify_training_shards(spark, out)
    assert not v["ok"]
    assert victim in v["missing"] and not v["mismatched"]


def test_shard_checksum_is_content_sensitive(spark, tmp_path):
    out = str(tmp_path / "shards")
    a = _assigned(spark)
    write_training_shards(a, out)
    # rewrite ONE shard with one doc's text perturbed, same row count
    manifest = json.load(open(f"{out}/_manifest.json"))
    victim = sorted(manifest["shards"])[-1]
    # materialize before overwriting the path being read from
    rows = spark.read.parquet(f"{out}/shard={victim}").collect()
    lo = min(r["doc_id"] for r in rows)
    tampered = spark.createDataFrame(
        [
            (r["pos"], r["doc_id"],
             r["text"] + "!" if r["doc_id"] == lo else r["text"])
            for r in rows
        ],
        "pos long, doc_id long, text string",
    )
    tampered.write.mode("overwrite").parquet(f"{out}/shard={victim}")
    v = verify_training_shards(spark, out)
    assert not v["ok"] and v["mismatched"] == [victim], v
