"""Multimodal span plumbing: decode/feature-extract for media spans.

Image/audio/video payloads are opaque ``media_ref`` handles (binary
columns in a real deployment). The decode step itself is STUBBED — no
imaging libraries exist in this container — behind
``decode_media_batch``: a deterministic md5-derived metadata record
per media_ref, with the real Spark plumbing (explode media spans →
``mapInPandas`` over Arrow batches → typed metadata rows) fully in
place. Swapping the stub body for PIL/ffmpeg changes nothing in the
plan shape.

Scale: the explode + mapInPandas stage is a pure map — no shuffle;
media-heavy docs are already spread by the doc_id repartition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blackedge_ocr_spark.constants import MEDIA_KINDS

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)

FORMATS = ("png", "jpeg", "tiff")


def fake_decode(media_ref: str) -> tuple[int, int, str, int]:
    """Deterministic stand-in for a real image/video probe.

    width/height/format/frames are md5-quad functions of the ref —
    mirrored exactly by the DuckDB oracle. A real implementation
    would read the binary payload here (PIL.Image.open etc.); it is
    NOT implemented in this container by design.
    """
    h = hashlib.md5(media_ref.encode("utf-8")).hexdigest()
    q = [int(h[i : i + 4], 16) for i in range(0, 16, 4)]
    return (
        320 + q[0] % 1600,
        240 + q[1] % 900,
        FORMATS[q[2] % len(FORMATS)],
        1 + q[3] % 30,
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        meta = [fake_decode(r) for r in pdf["media_ref"]]
        out = pd.DataFrame(
            meta, columns=["width", "height", "format", "n_frames"]
        )
        out.insert(0, "media_ref", pdf["media_ref"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def media_spans(docs_spans: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one (doc_id, media_ref) row per
    media span — the shared explode front of every media operator."""
    # doc_id is STRING per the input-table contract (BASELINE.json
    # input_hint: doc_id:string) — the cast normalizes the numeric
    # test-corpus ids to the contract type instead of coercing contract
    # string ids to long (which would NULL any non-numeric id).
    return (
        docs_spans.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.explode("spans").alias("s"),
        )
        .filter(F.col("s.kind").isin(list(MEDIA_KINDS)))
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )


def media_metadata(docs_spans: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one typed metadata row per media
    span, via Arrow-batched mapInPandas."""
    return media_spans(docs_spans).mapInPandas(
        _decode_batches, MEDIA_META_SCHEMA
    )


FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField(
            "features", T.ArrayType(T.DoubleType(), False), False
        ),
    ]
)


def fake_features(media_ref: str, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a vision-model embedding of one
    media payload: dim values in [0, 1), each an md5-derived quad of
    (ref, index) — mirrored exactly by the DuckDB oracle. A real
    implementation decodes the binary and runs the encoder here; the
    Arrow batch shape (one array<double> per row) is the real one."""
    return [
        int(hashlib.md5(f"{media_ref}:{i}".encode()).hexdigest()[:4], 16)
        / 65536.0
        for i in range(dim)
    ]


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "media_ref": pdf["media_ref"].values,
                "features": [fake_features(r) for r in pdf["media_ref"]],
            }
        )


def media_features(docs_spans: DataFrame) -> DataFrame:
    """Feature extraction over media spans: explode → Arrow-batched
    mapInPandas → (doc_id, media_ref, features array<double>). The
    output feeds the ANN operators (analysis.ann) directly; no
    shuffle — a pure map stage like the decode."""
    return media_spans(docs_spans).mapInPandas(
        _feature_batches, MEDIA_FEATURES_SCHEMA
    )


def media_resize(
    docs_spans: DataFrame, target_w: int = 512, target_h: int = 512
) -> DataFrame:
    """Fit-within resize planning for media spans: scale = min(tw/w,
    th/h, 1) on the decoded dimensions, floor to pixels (min 1), and a
    derived output handle. The dimension arithmetic is pure JVM
    expression over the metadata — only the decode (and, in a real
    deployment, the pixel resample writing the new payload) needs
    Python, which is the right cost split at scale."""
    meta = media_metadata(docs_spans)
    scale = F.least(
        F.lit(float(target_w)) / F.col("width").cast("double"),
        F.lit(float(target_h)) / F.col("height").cast("double"),
        F.lit(1.0),
    )
    out_w = F.greatest(
        F.floor(F.col("width").cast("double") * scale), F.lit(1)
    ).cast("int")
    out_h = F.greatest(
        F.floor(F.col("height").cast("double") * scale), F.lit(1)
    ).cast("int")
    return meta.select(
        "doc_id",
        "media_ref",
        "width",
        "height",
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        F.concat(
            F.lit("resized-"), F.col("media_ref"), F.lit("-"),
            out_w.cast("string"), F.lit("x"), out_h.cast("string"),
        ).alias("resized_ref"),
    )


def frame_sample(docs_spans: DataFrame, n: int = 4) -> DataFrame:
    """Evenly-spaced frame sampling for multi-frame media: take
    min(n, n_frames) frames at indices floor(k * n_frames / n) and
    emit one row per sampled frame with a per-frame handle. Pure JVM
    sequence/transform over the metadata — the frame DECODE would be
    the Python stage, sampling is not."""
    meta = media_metadata(docs_spans)
    take = F.least(F.lit(n), F.col("n_frames"))
    # sequence(0, -1) is DESCENDING [0, -1] in Spark — a 0-frame row
    # would emit two bogus frames where the oracle (range(0)) emits
    # none. fake_decode currently guarantees n_frames >= 1, but the
    # schema doesn't, so guard explicitly.
    seq = F.when(take > 0, F.sequence(F.lit(0), take - 1)).otherwise(
        F.array().cast("array<int>")
    )
    idx = F.transform(
        seq,
        # <= n frames: take them all; otherwise evenly spaced (the
        # guard also prevents duplicate indices from the floor)
        lambda k: F.when(F.col("n_frames") <= n, k.cast("int")).otherwise(
            F.floor(
                k.cast("double")
                * F.col("n_frames").cast("double")
                / F.lit(float(n))
            ).cast("int")
        ),
    )
    return (
        meta.select(
            "doc_id", "media_ref", "n_frames",
            F.explode(idx).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "media_ref",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.concat(
                F.col("media_ref"), F.lit("#f"),
                F.col("frame_idx").cast("string"),
            ).alias("frame_ref"),
        )
    )


PHASH_CELL = 64  # perceptual bucket cell width (px)


def media_dedup(docs_spans: DataFrame) -> DataFrame:
    """Cross-document media near-dup buckets: assets whose decoded
    shape lands in the same (width//CELL, height//CELL, format) cell
    are dedup candidates — the bucketing step of perceptual-hash
    image dedup at web scale, where the same asset (logo, stock
    photo, scanned form) is embedded in millions of pages. In
    production the bucket key is a pHash / md5(bytes); the container
    ships no imaging libs, so the decode-stub's deterministic
    metadata stands in — the plumbing (media-span explode, Arrow
    decode stage, combinable bucket agg, deterministic keeper) is
    the real part.

    Shape at scale: decode is the existing mapInPandas stage over
    exploded media spans; then ONE combinable hash agg on the bucket
    key — map-side combine absorbs hot buckets (the mirrored-logo
    case), no join, no window. Keeper = lexicographic min of
    'doc_id:media_ref', deterministic across engines, reruns and
    partitionings.
    """
    meta = media_metadata(docs_spans)
    key = F.md5(
        F.concat_ws(
            ":",
            F.floor(F.col("width").cast("double") / PHASH_CELL).cast("long"),
            F.floor(F.col("height").cast("double") / PHASH_CELL).cast(
                "long"
            ),
            F.col("format"),
        )
    )
    tagged = meta.select(
        key.alias("bucket"),
        F.concat_ws(":", "doc_id", "media_ref").alias("asset"),
    )
    return tagged.groupBy("bucket").agg(
        F.count("*").alias("n_assets"),
        F.min("asset").alias("keeper"),
    )
