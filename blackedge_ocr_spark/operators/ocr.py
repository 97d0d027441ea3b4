"""Embedded OCR-classify stage for media spans.

Replaces the reference's per-page HTTP provider calls
(reference: src/services/clients/mistral_client.py:88-162,
openai_client.py:132-209, gemini_client.py:84-156) with an
Arrow-batched inference UDF running inside executors — the north
star's "embedded OCR-classify stage". The real model decode is not
available in this container, so the inference body is a
deterministic, seedable stand-in keyed on (provider, media_ref).

Boundary-minimization design: ONLY the media refs cross the Python
boundary (array<string> per row), never the text spans — the merged
span array is rebuilt JVM-side via an offset-keyed map lookup. On a
media-sparse corpus (~1 media span in 9) this shrinks the Arrow
payload ~10x versus shipping whole span arrays, which is what keeps
the stage scaling with cores instead of with serialization.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blackedge_ocr_spark.constants import MEDIA_KINDS


def fake_ocr_text(provider: str, media_ref: str) -> str:
    """Deterministic stand-in for model inference on one media span.

    Shaped like a real page transcript (>=100 chars, >=20 words,
    punctuation) so it does not itself trip the quality checks; the
    embedded values are a hash of (provider, media_ref), so two
    providers disagree on numbers — which is exactly what the
    number-frequency cross-validation is built to catch.
    """
    h = hashlib.md5(f"{provider}:{media_ref}".encode("utf-8")).hexdigest()
    nums = [int(h[i : i + 4], 16) for i in range(0, 16, 4)]
    return (
        f"Extracted by {provider} ocr engine from {media_ref}. "
        f"The image region reports values {nums[0]}, {nums[1]}, "
        f"{nums[2]} and {nums[3]}. Confidence stays high for every "
        f"block detected in this scan."
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def _ocr_texts(media_refs: pd.Series, provider: pd.Series) -> pd.Series:
    """Arrow-batched: media_refs array<string> per row → OCR text per
    ref. A real model runner would flatten the batch into one tensor
    here; the stand-in maps the deterministic transcript."""
    out = []
    for refs, prov in zip(media_refs, provider):
        refs = list(refs) if refs is not None else []
        out.append([fake_ocr_text(prov, r) for r in refs])
    return pd.Series(out)


def _is_media(s) -> Column:
    return s["kind"].isin(list(MEDIA_KINDS))


def _first_per_offset(media: Column) -> Column:
    """Keep only the first media span of each offset run.

    The documents(doc_id, spans) schema does not enforce offset
    uniqueness, and ``map_from_arrays`` under Spark's default
    ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` fails at runtime on a
    duplicate key — so an externally supplied document with two media
    spans at one offset must be disambiguated here. The input is
    offset-sorted, so duplicates are adjacent: element i survives iff
    it is first or differs from its predecessor (O(n), in-array).
    ``fill_media_text`` then gives every span at that offset the first
    ref's OCR text — documented first-wins semantics.
    """
    return F.filter(
        media,
        lambda s, i: (i == F.lit(0))
        | (s["offset"] != F.element_at(media, F.greatest(i, F.lit(1)))["offset"]),
    )


def ocr_media_map(sorted_spans: Column, provider: Column) -> Column:
    """map<offset, ocr_text> for the media spans of a document.

    Materialize this as its OWN column (withColumn) — Spark rejects
    Python UDFs nested inside higher-order-function lambdas, and only
    the media refs should cross the Arrow boundary anyway.

    Under the ``pdfplumber`` provider (text_extraction workflow) media
    spans yield empty text: pdfplumber cannot OCR (reference:
    src/services/workflows/text_extraction_handler.py:96-150). The
    refs fed to the inference UDF are gated to empty for that branch —
    the UDF itself is hoisted out of CASE WHEN and always runs, so
    cost is controlled by emptying its input, not wrapping its output.
    """
    media = _first_per_offset(F.filter(sorted_spans, _is_media))
    is_plumber = provider == "pdfplumber"
    refs = F.when(
        is_plumber, F.array().cast("array<string>")
    ).otherwise(F.transform(media, lambda s: s["media_ref"]))
    offsets = F.transform(media, lambda s: s["offset"])
    texts = F.when(
        is_plumber, F.transform(media, lambda s: F.lit(""))
    ).otherwise(_ocr_texts(refs, provider))
    return F.map_from_arrays(offsets, texts)


def fill_media_text(sorted_spans: Column, ocr_map: Column) -> Column:
    """Rebuild the span array with media texts from the OCR map —
    pure JVM higher-order function; pass ocr_map as a materialized
    column attribute."""
    return F.transform(
        sorted_spans,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(
                _is_media(s),
                F.coalesce(F.try_element_at(ocr_map, s["offset"]), F.lit("")),
            ).otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )


def fake_ocr_text_jvm(provider: Column, media_ref: Column) -> Column:
    """The deterministic stand-in as pure JVM built-ins (md5 + conv +
    concat) — bit-identical to ``fake_ocr_text``. Used by the
    ``ocr_impl='jvm'`` path: when the classifier is a hash stand-in
    (tests, benchmarks of the non-inference stages), the Python
    boundary can be elided entirely. A real model keeps the Arrow
    path."""
    h = F.md5(F.concat(provider, F.lit(":"), media_ref))
    num = lambda i: F.conv(F.substring(h, 1 + 4 * i, 4), 16, 10).cast(
        "long"
    ).cast("string")
    return F.concat(
        F.lit("Extracted by "), provider, F.lit(" ocr engine from "), media_ref,
        F.lit(". The image region reports values "), num(0), F.lit(", "),
        num(1), F.lit(", "), num(2), F.lit(" and "), num(3),
        F.lit(". Confidence stays high for every block detected in this scan."),
    )


def ocr_media_map_jvm(sorted_spans: Column, provider: Column) -> Column:
    """ocr_media_map with the JVM stand-in classifier (no Arrow
    boundary). Identical output."""
    media = _first_per_offset(F.filter(sorted_spans, _is_media))
    offsets = F.transform(media, lambda s: s["offset"])
    texts = F.when(
        provider == "pdfplumber", F.transform(media, lambda s: F.lit(""))
    ).otherwise(
        F.transform(media, lambda s: fake_ocr_text_jvm(provider, s["media_ref"]))
    )
    return F.map_from_arrays(offsets, texts)
