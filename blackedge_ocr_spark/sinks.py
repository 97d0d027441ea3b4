"""Result sinks: the reference's response shapes as columns/writes.

S9 (JSON response, reference: src/services/response_builder.py:27-71)
becomes a ``to_json(struct(...))`` column — one JSON document per row,
writable to any sink. S10 (ZIP with per-page files,
response_builder.py:73-138) has no file-per-page analog at table
scale; its information content (full content + per-section texts +
metadata + validation report) is preserved as typed columns in the
same row, and ``doc_bundle``/``write_bundle_zip`` materialize one
document's archive for a human, file-for-file. S11 (error response)
is the nullable ``error`` column convention.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_response(result: DataFrame) -> DataFrame:
    """RESULT_SCHEMA rows → (doc_id, response:string JSON) matching the
    reference's {status, content, metadata, validation_report,
    sections} shape."""
    metadata = F.struct(
        F.col("workflow"),
        F.col("provider"),
        F.col("pages"),
        F.col("used_secondary"),
    )
    validation_report = F.when(
        F.col("used_secondary") | F.col("similarity").isNotNull(),
        F.struct(
            F.col("used_secondary"),
            F.col("similarity"),
            F.col("reason"),
            F.transform(
                F.col("problems"),
                # 1-indexed like sections.page_number and page_NNNN.md
                # (reference keys problems_by_page by section.page_number,
                # problem_detector.py:67) — a consumer cross-referencing
                # the report must land on the right page file
                lambda p: F.struct((p["offset"] + 1).alias("page"),
                                   p["labels"].alias("problems")),
            ).alias("problem_pages"),
        ),
    )
    sections = F.transform(
        F.col("out_spans"),
        lambda s: F.struct(
            (s["offset"] + 1).alias("page_number"),  # reference is 1-indexed
            s["text"].alias("content"),
            s["kind"].alias("kind"),
        ),
    )
    success = F.to_json(
        F.struct(
            F.lit("success").alias("status"),
            F.col("content"),
            metadata.alias("metadata"),
            validation_report.alias("validation_report"),
            sections.alias("sections"),
        )
    )
    # workflow NULL is the error convention (routing.py; lineage counts
    # it as n_errors) — the reference returns build_error_response
    # ({status: error, error}, response_builder.py:190-210) for these,
    # never a success envelope around null metadata.
    error = F.to_json(
        F.struct(
            F.lit("error").alias("status"),
            F.lit("Unknown workflow type").alias("error"),
        )
    )
    response = F.when(F.col("workflow").isNull(), error).otherwise(success)
    return result.select("doc_id", response.alias("response"))


def doc_bundle(result: DataFrame, doc_id: str) -> dict[str, str]:
    """One document's ZIP-archive contents as {filename: text} —
    field-for-field what the reference's build_zip_response packs
    (response_builder.py:73-188): full_content.md, page_NNNN.md per
    section (1-indexed, zero-padded), metadata.json,
    validation_report.json when validation ran, and the generated
    README.md. Driver-side single-row materialization is the point —
    this is the human-facing escape hatch from the table
    representation, not a distributed sink.
    """
    rows = result.filter(F.col("doc_id") == doc_id).limit(1).collect()
    if not rows:
        raise KeyError(f"doc_id not found: {doc_id}")
    r = rows[0]

    # workflow NULL is the error convention (routing.py) — mirror
    # json_response's S11 envelope: the reference returns
    # build_error_response for these (response_builder.py:190-210),
    # never a success-shaped archive around null metadata.
    if r["workflow"] is None:
        return {
            "error.json": json.dumps(
                {"status": "error", "error": "Unknown workflow type"},
                indent=2,
            )
        }

    metadata = {
        "workflow": r["workflow"],
        "provider": r["provider"],
        "pages": r["pages"],
        "used_secondary": r["used_secondary"],
    }
    files: dict[str, str] = {"full_content.md": r["content"]}
    for s in r["out_spans"]:
        files[f"page_{s['offset'] + 1:04d}.md"] = s["text"]
    files["metadata.json"] = json.dumps(metadata, indent=2)

    validation = None
    if r["used_secondary"] or r["similarity"] is not None:
        validation = {
            "used_secondary": r["used_secondary"],
            "similarity": r["similarity"],
            "reason": r["reason"],
            "problem_pages": [
                # 1-indexed like page_NNNN.md (problem_detector.py:67)
                {"page": p["offset"] + 1, "problems": list(p["labels"])}
                for p in r["problems"]
            ],
        }
        files["validation_report.json"] = json.dumps(validation, indent=2)

    files["README.md"] = _bundle_readme(
        metadata, r["content"], len(r["out_spans"]), validation
    )
    return files


def _bundle_readme(metadata, content, n_sections, validation) -> str:
    """README text mirroring response_builder._generate_readme:141-188."""
    readme = f"""# PDF Extraction Results

## Summary
- **Workflow**: {metadata["workflow"]}
- **Provider**: {metadata["provider"]}
- **Pages Processed**: {metadata["pages"]}
- **Content Length**: {len(content):,} characters

## Files Included

- `full_content.md`: Complete extracted text from all pages
- `metadata.json`: Extraction metadata and processing information
"""
    if n_sections:
        readme += (
            f"- `page_NNNN.md`: Individual page content ({n_sections} files)\n"
        )
    if validation:
        readme += (
            "- `validation_report.json`: Validation and quality check results\n"
        )
        if validation.get("used_secondary"):
            reason = validation.get("reason") or "unknown reason"
            readme += (
                "\n⚠️ **Note**: Secondary extraction was used due to "
                f"{reason}\n"
            )
    readme += "\n## Metadata Details\n\n"
    for key, value in metadata.items():
        if key not in ("workflow", "provider", "pages"):
            readme += f"- **{key}**: {value}\n"
    return readme


def write_bundle_zip(result: DataFrame, doc_id: str, path: str) -> None:
    """Materialize ``doc_bundle`` as an actual .zip on local disk
    (ZIP_DEFLATED, like the reference's in-memory archive)."""
    import zipfile

    files = doc_bundle(result, doc_id)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, text in files.items():
            zf.writestr(name, text)


def write_results(result: DataFrame, path: str, partition_col: str | None = None) -> None:
    """Parquet sink (Iceberg stand-in) — partitioned when asked."""
    w = result.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path)


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int = 16, key: str = "doc_id"
) -> None:
    """Catalog-managed bucketed table (hash-bucketed + sorted on the
    join key). Two tables bucketed the same way join WITHOUT any
    exchange — the shuffle is paid once at write time instead of on
    every join, which is the 100 TB pattern for repeatedly-joined
    extraction outputs (results ⋈ problems ⋈ lineage on doc_id).
    Asserted by ``test_plans.py::test_bucketed_join_has_no_exchange``.
    Maps 1:1 onto Iceberg's bucket partition transform (README ADR-1).
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def _shard_stats(df: DataFrame):
    """Per-shard (n_docs, n_tokens, checksum) aggregate over a frame
    with (shard, doc_id, text). The checksum is ORDER-FREE — a
    decimal(38,0) sum of a 60-bit md5 prefix of 'doc_id:text' — so
    shards written by different task layouts (or merged across
    resumed writes) reproduce it exactly; tokens are the guarded
    whitespace count (empty text costs 0)."""
    ws = F.when(F.length("text") == 0, F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), " "))
    ).cast("long")
    chk = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text"))), 1, 15
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return df.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(ws).alias("n_tokens"),
        F.sum(chk).cast("decimal(38,0)").alias("checksum"),
    )


def write_training_shards(assigned: DataFrame, path: str) -> dict:
    """Training-shard sink — the deliverable of the assembly chain:
    the shuffled corpus (corpusops.corpus_shuffle output joined with
    its payload: shard, pos, doc_id, text) lands parquet-partitioned
    by shard (each shard read back ordered by pos IS the training
    order), with a ``_manifest.json`` next to the data (the
    underscore prefix keeps Spark's parquet reader from treating it
    as data) recording per-shard doc counts, token sums and the
    order-free content checksum plus totals. Returns the manifest.

    Scale shape: the stats pass is ONE combinable hash agg on shard
    (256 rows reach the driver — bounded regardless of corpus size);
    the write itself is the partitionBy parquet pattern every shard
    store (and the Iceberg swap per ADR-1) uses. The manifest is what
    makes the artifact consumable without trust: a dataloader fleet
    (or a resumed writer) runs ``verify_training_shards`` before
    training instead of discovering truncation mid-epoch.
    """
    stats = {
        r["shard"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "checksum": str(r["checksum"]),
        }
        for r in _shard_stats(assigned).collect()
    }
    assigned.write.mode("overwrite").partitionBy("shard").parquet(path)
    manifest = {
        "shards": stats,
        "n_shards": len(stats),
        "n_docs": sum(s["n_docs"] for s in stats.values()),
        "n_tokens": sum(s["n_tokens"] for s in stats.values()),
    }
    with open(f"{path.rstrip('/')}/_manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_training_shards(spark, path: str) -> dict:
    """Integrity check of a shard store against its manifest: re-derive
    every per-shard statistic from the written files and report
    missing/extra/mismatching shards. Returns {"ok": bool,
    "missing": [...], "extra": [...], "mismatched": [...]}.
    The checksum's order-freeness makes this pass/fail exact — not a
    row-count heuristic: one flipped byte in one doc flips a shard's
    checksum."""
    with open(f"{path.rstrip('/')}/_manifest.json") as f:
        manifest = json.load(f)
    got = {
        r["shard"]: (r["n_docs"], r["n_tokens"], str(r["checksum"]))
        for r in _shard_stats(spark.read.parquet(path)).collect()
    }
    want = {
        s: (v["n_docs"], v["n_tokens"], v["checksum"])
        for s, v in manifest["shards"].items()
    }
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = sorted(
        s for s in set(want) & set(got) if want[s] != got[s]
    )
    return {
        "ok": not (missing or extra or mismatched),
        "missing": missing,
        "extra": extra,
        "mismatched": mismatched,
    }
