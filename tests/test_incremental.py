"""Incremental extraction (CDC merge across corpus snapshots): the
incremental result must be bit-equal to a full re-extract of the new
snapshot, while the expensive transform only ever sees the delta."""

from pyspark.sql import functions as F

from blackedge_ocr_spark import incremental
from blackedge_ocr_spark.datagen import spansify_documents
from blackedge_ocr_spark.pipeline import extract_documents


def _snapshots(spark):
    base = spansify_documents(spark, "/root/testdata/sf0.001").filter(
        F.col("doc_id").cast("long") < 150
    )
    # Snapshot A: docs ending in 3 absent (they are "added" in B).
    snap_a = base.filter(F.col("doc_id").cast("long") % 10 != 3)
    # Snapshot B: all docs, every 7th revised (span text edited).
    revised = F.transform(
        "spans",
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(
                s["kind"] == "text", F.concat(s["text"], F.lit(" rev"))
            )
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    snap_b = base.withColumn(
        "spans",
        F.when(F.col("doc_id").cast("long") % 7 == 0, revised).otherwise(
            F.col("spans")
        ),
    )
    return snap_a, snap_b


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        df.select(F.to_json(F.struct(*cols)).alias("j")).collect()
    )


def test_incremental_equals_full_and_only_processes_delta(spark):
    snap_a, snap_b = _snapshots(spark)
    seen = {}

    def transform(d):
        seen["n"] = d.count()
        return extract_documents(d, query_col="query")

    out_a = incremental.incremental_extract(snap_a, transform, None).cache()
    n_a = out_a.count()
    assert n_a == snap_a.count()
    assert seen["n"] == n_a  # first run extracts everything

    out_b = incremental.incremental_extract(
        snap_b, transform, prev=out_a
    ).cache()

    a_ids = {r["doc_id"] for r in snap_a.select("doc_id").collect()}
    b_ids = {r["doc_id"] for r in snap_b.select("doc_id").collect()}
    added = b_ids - a_ids
    # changed = docs whose span content actually differs (a doc with
    # no text-kind spans is untouched by the revision and must be
    # carried, not recomputed)
    ja = snap_a.select("doc_id", F.to_json("spans").alias("ja"))
    jb = snap_b.select("doc_id", F.to_json("spans").alias("jb"))
    changed = {
        r["doc_id"]
        for r in ja.join(jb, "doc_id")
        .filter(F.col("ja") != F.col("jb"))
        .collect()
    }
    # the transform saw exactly the delta, never the carried majority
    assert seen["n"] == len(added | changed)

    refreshed = {
        r["doc_id"]
        for r in out_b.filter(F.col("refreshed")).select("doc_id").collect()
    }
    assert refreshed == added | changed

    # end state == full re-extract of snapshot B (same columns incl.
    # the fingerprint; refreshed differs by definition, so drop it)
    full_b = incremental.incremental_extract(snap_b, transform, None)
    assert _canon(out_b.drop("refreshed")) == _canon(
        full_b.drop("refreshed")
    )


def test_removed_docs_drop_out(spark):
    _, snap_b = _snapshots(spark)

    def transform(d):
        return extract_documents(d, query_col="query")

    out_b = incremental.incremental_extract(snap_b, transform, None).cache()
    shrunk = snap_b.filter(F.col("doc_id").cast("long") % 5 != 0)
    out_c = incremental.incremental_extract(shrunk, transform, prev=out_b)
    assert out_c.count() == shrunk.count()
    assert (
        out_c.filter(F.col("doc_id").cast("long") % 5 == 0).count() == 0
    )
    # nothing needed recomputation: pure deletion
    assert out_c.filter(F.col("refreshed")).count() == 0
