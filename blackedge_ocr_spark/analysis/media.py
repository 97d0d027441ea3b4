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
        T.StructField("doc_id", T.LongType(), False),
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


def media_metadata(docs_spans: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one typed metadata row per media
    span, via Arrow-batched mapInPandas."""
    media = (
        docs_spans.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode("spans").alias("s"),
        )
        .filter(F.col("s.kind").isin(list(MEDIA_KINDS)))
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    return media.mapInPandas(_decode_batches, MEDIA_META_SCHEMA)
