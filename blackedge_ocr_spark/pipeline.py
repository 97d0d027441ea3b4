"""The extract-then-validate pipeline over interleaved span documents.

Spark-first re-expression of the reference's workflow lifecycle
(reference: src/services/workflow_orchestrator.py:68-150 and the five
handlers under src/services/workflows/): routing, extraction,
problem detection, ordered reassembly, cross-validation, decision —
as ONE declarative projection over
``documents(doc_id, spans)``.

Scale shape: the whole pipeline is map-side. Span ordering is an
in-array sort, content assembly an in-array fold, similarity a
per-row expression — zero shuffles end-to-end, so throughput scales
linearly with executors; the only Arrow boundary is the embedded
OCR-classify stage. Skew from mega-documents is defused by an
explicit hash repartition on doc_id before the Arrow stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blackedge_ocr_spark.constants import (
    CONTENT_SEPARATOR,
    PRIMARY_PROVIDER,
    SECONDARY_PROVIDER,
    SIMILARITY_THRESHOLD,
    VALIDATING_WORKFLOWS,
)
from blackedge_ocr_spark.functions.problems import problems_array
from blackedge_ocr_spark.operators.ocr import (
    _is_media as _is_media_span,
    fill_media_text,
    fill_media_text_mega,
    filter_media,
    first_per_offset,
    ocr_media_map,
    ocr_media_map_jvm,
)
from blackedge_ocr_spark.operators.routing import route_workflow


def sort_spans(spans: Column) -> Column:
    """Order spans by offset inside the array — the reference's page
    order (W1; reference: text_extraction_handler.py:115, join at :71).
    In-array comparator sort: no shuffle, no window.
    """
    return F.array_sort(
        spans,
        lambda l, r: F.when(l["offset"] < r["offset"], -1)
        .when(l["offset"] > r["offset"], 1)
        .otherwise(0),
    )


def assemble_content(spans: Column) -> Column:
    """CONTENT_SEPARATOR-joined span texts, in span order (A1;
    reference: default_handler.py:87 et al.). Empty texts are kept,
    like ``str.join`` over empty page contents.
    """
    return F.concat_ws(CONTENT_SEPARATOR, F.transform(spans, lambda s: s["text"]))


def span_problems(spans: Column) -> Column:
    """Per-span quality labels, pages with >=1 problem only, page order
    (reference: problem_detector.py:36-70)."""
    tagged = F.transform(
        spans,
        lambda s: F.struct(
            s["offset"].alias("offset"),
            problems_array(s["text"]).alias("labels"),
        ),
    )
    return F.filter(tagged, lambda p: F.size(p["labels"]) > 0)


def _map_literal(col: Column, mapping: dict, default=None) -> Column:
    out = F.when(F.lit(False), F.lit(""))
    for k, v in mapping.items():
        out = out.when(col == k, F.lit(v))
    return out.otherwise(F.lit(default))


def _chunked(arr: Column, size: int) -> Column:
    """array<x> → array<array<x>> of ``size``-sized slices (last one
    ragged). ``arr`` must be a materialized column attribute — the
    lambda indexes back into it per element."""
    n = F.ceil(F.size(arr) / F.lit(size)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n, F.lit(1)) - 1),
        lambda i: F.slice(arr, i * size + 1, size),
    )


def _ocr_map_chunked(
    df: DataFrame,
    media_col: str,
    provider: Column,
    media_map,
    chunk: int,
    maps_col: str,
) -> DataFrame:
    """Mega-document straggler defense: split one document's media
    array into ``chunk``-sized slices, explode them to rows, shuffle
    on (doc_id, chunk_idx) so the slices of ONE document land in
    DIFFERENT tasks, run the Arrow OCR stage per slice, and regroup.

    Returns (doc_id, ``maps_col``: array<map<int,string>> in chunk
    order) for exactly the rows of ``df`` — NOT one merged map: a
    JVM merge (aggregate + map_concat) re-copies the accumulator per
    fold step, O(chunks²·chunk); the downstream Arrow fill merges the
    chunk dicts in Python in one O(entries) pass instead.

    Without this path, a 100k-media document is one Arrow batch entry
    in one task — the whole stage waits on it; with it, p99 task time
    is bounded by ``chunk`` model calls (BENCH/SKEW.md). The extra
    shuffle moves only (doc_id, media slice) for the mega minority,
    and the ride back is offset→text only.
    """
    # EXPLICIT partition count: chunk rows are tiny (refs only), so
    # AQE's small-partition coalescing would glue every chunk back
    # into ONE task (measured: the whole monster's model work
    # serialized again, 14 s task) — a user-specified repartition N
    # is exempt from coalescing. Sized to spread chunks one-ish per
    # core slot; model cost per task stays ~chunks_per_task × chunk.
    npart = df.sparkSession.sparkContext.defaultParallelism * 4
    chunks = df.select(
        "doc_id",
        provider.alias("_prov"),
        F.posexplode(_chunked(F.col(media_col), chunk)).alias("_ci", "_mchunk"),
    ).repartition(npart, "doc_id", "_ci")
    pmaps = chunks.select(
        "doc_id",
        "_ci",
        media_map(F.col("_mchunk"), F.col("_prov")).alias("_pmap"),
    )
    # comparator sort (structs holding maps are not naturally
    # orderable); map_keys order == insertion order == offset order
    agg = pmaps.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_ci").alias("ci"), F.col("_pmap").alias("m"))),
            lambda l, r: F.when(l["ci"] < r["ci"], -1)
            .when(l["ci"] > r["ci"], 1)
            .otherwise(0),
        ).alias("_chunks")
    )
    return agg.select(
        "doc_id", F.transform("_chunks", lambda c: c["m"]).alias(maps_col)
    )


def extract_documents(
    df: DataFrame,
    query_col: str | None = "query",
    explicit_col: str | None = None,
    enable_validation=True,
    similarity_method: str = "number_frequency",
    similarity_threshold: float = SIMILARITY_THRESHOLD,
    repartition: int | None = None,
    ocr_impl: str = "arrow",
    mega_media_chunk: int | None = None,
    ocr_burn: int = 0,
) -> DataFrame:
    """documents(doc_id, spans [, query [, explicit_workflow]]) →
    RESULT_SCHEMA rows. ``enable_validation`` may be a bool or the
    name of a boolean column (per-request flag, reference:
    src/api/models.py ExtractionRequest.enable_validation).

    ``ocr_impl``: 'arrow' routes media refs through the Arrow-batched
    inference UDF (the real-model architecture); 'jvm' uses the
    bit-identical md5 stand-in as built-ins (no Python boundary —
    for benchmarking the non-inference stages in isolation).

    ``mega_media_chunk``: when set, documents with more than this many
    media spans take a split-process-reassemble OCR path (explode into
    chunks, infer per chunk across tasks, merge in the Arrow fill — see
    ``_ocr_map_chunked``) instead of one Arrow batch entry in one
    task. Output is IDENTICAL (pytest parity); the default keeps the
    zero-shuffle single-projection plan. Size it to the per-task model
    budget — e.g. 256 on a cluster where one model call is ~50 ms.

    ``ocr_burn``: bench-only per-page latency emulation for the md5
    stand-in (see ``operators.ocr.fake_ocr_text``); 0 = production.
    """
    if repartition:
        # Spread mega-documents before the Arrow stage: hash on doc_id
        # balances docs across tasks; Arrow batch size (configured in
        # session.py) bounds per-batch memory for fat span arrays.
        df = df.repartition(repartition, "doc_id")

    query = F.col(query_col) if query_col and query_col in df.columns else F.lit("")
    explicit = explicit_col if explicit_col and explicit_col in df.columns else None
    if isinstance(enable_validation, str):
        validation_requested = F.col(enable_validation)
    else:
        validation_requested = F.lit(bool(enable_validation))

    workflow = route_workflow(query, explicit)
    provider = _map_literal(workflow, PRIMARY_PROVIDER)
    secondary_provider = _map_literal(workflow, SECONDARY_PROVIDER)

    df = (
        df.withColumn("workflow", workflow)
        .withColumn("provider", provider)
        .withColumn("_sorted", sort_spans(F.col("spans")))
    )

    # Embedded extraction: media refs go through the Arrow-batched
    # OCR-classify stage (§2.14-2) producing an offset→text map; the
    # span array is rebuilt JVM-side, so text spans never cross the
    # Python boundary. (The UDF must sit in its own projection —
    # Spark rejects Python UDFs nested inside HOF lambdas.)
    #
    # Every array consumed inside a downstream HOF lambda is staged
    # as a column first: inlined expressions are re-evaluated per
    # array element, which turns the fill stage quadratic in span
    # count — a 2,500-span mega-document cost 15 s/row before, linear
    # after (BENCH/SKEW.md). The OCR map comes back as a UDF output
    # attribute ('arrow') precisely so the optimizer CANNOT inline it
    # into the fill lambda; the 'jvm' stand-in accepts the per-element
    # map rebuild (bench-only path, documented).
    if ocr_impl == "arrow":
        media_map = lambda m, p: ocr_media_map(m, p, burn=ocr_burn)
    else:
        media_map = ocr_media_map_jvm
    df = df.withColumn("_media", filter_media(F.col("_sorted"))).withColumn(
        "_media", first_per_offset(F.col("_media"))
    )

    # Validation only exists for workflows whose handler wires a
    # secondary client (constants.VALIDATING_WORKFLOWS).
    validating = validation_requested & F.col("workflow").isin(
        list(VALIDATING_WORKFLOWS)
    )

    if mega_media_chunk:
        # Straggler defense: docs above the media threshold get their
        # OCR maps from the chunked split path and feed the direct UDF
        # an EMPTY array (input gating — a CASE WHEN around the UDF
        # would be hoisted and still run it). The join back is
        # broadcast: mega docs are by definition the skewed minority.
        #
        # _is_mega counts media in the RAW spans array, NOT in _media:
        # a Filter predicate cannot reference projection outputs, so
        # pushdown would substitute _media's full derivation into the
        # condition — and first_per_offset's self-referencing lambda
        # then re-evaluates filter_media(sort_spans(spans)) PER
        # ELEMENT, O(n² log n) on every row (thread-dumped: ArraySort
        # under ArrayFilter inside the filter predicate). The raw
        # count is a single O(n) pass, and pre-dedup vs post-dedup
        # only shifts which path borderline docs take — both paths
        # are byte-identical. It is a MATERIALIZED, multi-referenced
        # column: a once-referenced boolean expression would be
        # inlined into the fill transform by projection collapsing and
        # re-evaluated per span element — O(spans·spans) on a mega
        # row (thread-dumped as ArrayFilter/In under the fill lambda,
        # ~100 s on a 20k-media document with the model cost at zero).
        df = df.withColumn(
            "_is_mega",
            F.size(F.filter(F.col("spans"), _is_media_span)) > mega_media_chunk,
        )
        is_mega = F.col("_is_mega")
        mega = df.filter(is_mega)
        maps = _ocr_map_chunked(
            mega, "_media", F.col("provider"), media_map,
            mega_media_chunk, "_maps_pri",
        ).join(
            _ocr_map_chunked(
                mega.filter(validating), "_media", secondary_provider,
                media_map, mega_media_chunk, "_maps_sec",
            ),
            "doc_id",
            "left",
        )
        # NO broadcast hint: the mega maps carry the LARGEST
        # transcripts in the job (a 100k-media doc is ~20 MB per
        # provider) — forcing a broadcast would collect exactly that
        # to the driver. AQE broadcasts at runtime while the maps are
        # small and falls back to a shuffled join when they are not;
        # mega rows are few either way.
        df = df.join(maps, "doc_id", "left")
        gated_media = F.when(~is_mega, F.col("_media")).otherwise(
            F.slice(F.col("_media"), 1, 0)
        )
    else:
        is_mega = F.lit(False)
        gated_media = F.col("_media")

    df = df.withColumn("_media_pri", gated_media).withColumn(
        "_ocr_direct", media_map(F.col("_media_pri"), F.col("provider"))
    )
    # The fill branches OUTSIDE the transform (CASE WHEN picks one
    # whole-array fill per row, lazily): the mega branch reads the
    # Arrow-filled spans, the normal branch the direct UDF map. The
    # mega fill is itself a Python UDF with a GATED INPUT (non-mega
    # rows ship empty arrays — the UDF is hoisted out of the CASE and
    # runs for every row, but empty batch entries cost nothing); no
    # JVM fill survives a 20k-entry map in one row, see
    # operators.ocr._fill_spans_arrow.
    out_spans_col = fill_media_text(F.col("_sorted"), F.col("_ocr_direct"))
    if mega_media_chunk:
        df = df.withColumn(
            "_mega_filled_pri",
            fill_media_text_mega(
                F.when(is_mega, F.col("_sorted")).otherwise(
                    F.slice(F.col("_sorted"), 1, 0)
                ),
                F.col("_maps_pri"),
            ),
        )
        out_spans_col = F.when(
            is_mega, F.col("_mega_filled_pri")
        ).otherwise(out_spans_col)
    df = df.withColumn("out_spans", out_spans_col)

    # Gate the UDF's INPUT, not its output: Spark hoists Python UDFs
    # out of CASE WHEN into an unconditional ArrowEvalPython stage, so
    # `F.when(validating, media_map(...))` would still run secondary
    # inference for every row. Feeding non-validating rows an empty
    # media array makes their Arrow batch entries empty (zero media
    # refs → zero model calls), which is the real cost gate.
    df = df.withColumn(
        "_media_sec",
        F.when(validating & ~is_mega, F.col("_media")).otherwise(
            F.slice(F.col("_media"), 1, 0)
        ),
    ).withColumn(
        "_ocr_sec_direct", media_map(F.col("_media_sec"), secondary_provider)
    )
    sec_spans_col = F.when(
        validating, fill_media_text(F.col("_sorted"), F.col("_ocr_sec_direct"))
    )
    if mega_media_chunk:
        df = df.withColumn(
            "_mega_filled_sec",
            fill_media_text_mega(
                F.when(validating & is_mega, F.col("_sorted")).otherwise(
                    F.slice(F.col("_sorted"), 1, 0)
                ),
                F.col("_maps_sec"),
            ),
        )
        sec_spans_col = F.when(
            validating & is_mega, F.col("_mega_filled_sec")
        ).otherwise(sec_spans_col)
    df = df.withColumn("_secondary_spans", sec_spans_col)

    primary_content = assemble_content(F.col("out_spans"))
    secondary_content = assemble_content(F.col("_secondary_spans"))
    problems = span_problems(F.col("out_spans"))

    df = (
        df.withColumn("problems", problems)
        .withColumn("_primary_content", primary_content)
        .withColumn("_secondary_content", secondary_content)
    )

    has_problems = F.size(F.col("problems")) > 0
    # Stage 2 similarity runs only when stage 1 found no problems
    # (reference: validation_service.py:90-145). The per-method derived
    # arrays are materialized as columns first so the interpreted
    # higher-order cosine doesn't re-extract numbers per element —
    # and GATED at the input, so rows that skip validation never pay
    # the regex extraction (JVM methods) or the Arrow transfer
    # ('cosine' method, whose UDF is hoisted out of CASE WHEN like any
    # Python UDF and sees null inputs for gated rows).
    from blackedge_ocr_spark.functions import similarity as S

    sim_gate = validating & ~has_problems
    df = df.withColumn(
        "_sim_a",
        F.when(sim_gate, S.prepare(F.col("_primary_content"), similarity_method)),
    ).withColumn(
        "_sim_b",
        F.when(sim_gate, S.prepare(F.col("_secondary_content"), similarity_method)),
    )
    similarity = F.when(
        sim_gate,
        S.from_prepared(F.col("_sim_a"), F.col("_sim_b"), similarity_method),
    )
    df = df.withColumn("similarity", similarity)

    used_secondary = validating & (
        has_problems | (F.col("similarity") < F.lit(similarity_threshold))
    )
    reason = F.when(validating & has_problems, F.lit("quality_issues")).when(
        validating & (F.col("similarity") < F.lit(similarity_threshold)),
        F.lit("low_similarity"),
    )
    content = F.when(
        used_secondary, F.col("_secondary_content")
    ).otherwise(F.col("_primary_content"))

    return df.select(
        "doc_id",
        "workflow",
        "out_spans",
        "problems",
        content.alias("content"),
        F.coalesce(used_secondary, F.lit(False)).alias("used_secondary"),
        "similarity",
        reason.alias("reason"),
        F.size("spans").cast("int").alias("pages"),
        "provider",
    )
