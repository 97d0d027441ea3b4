"""Embedded OCR-classify stage for media spans.

Replaces the reference's per-page HTTP provider calls
(reference: src/services/clients/mistral_client.py:88-162,
openai_client.py:132-209, gemini_client.py:84-156) with an
Arrow-batched inference UDF running inside executors — the north
star's "embedded OCR-classify stage". The real model decode is not
available in this container, so the inference body is a
deterministic, seedable stand-in: ``[{provider}:{md5(media_ref)[:12]}]``.
The Spark-side plumbing — Arrow batch transfer of list<struct> span
arrays, flatten→vectorize→scatter batch shape, provider routing — is
real and what the tests exercise.

Text spans pass through unchanged (the reference's LLM prompt echoes
page text back as extracted content; identity is the deterministic
parity choice). Under the ``pdfplumber`` provider (text_extraction
workflow) media spans yield empty text: pdfplumber cannot OCR
(reference: src/services/workflows/text_extraction_handler.py:96-150).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blackedge_ocr_spark.constants import MEDIA_KINDS
from blackedge_ocr_spark.schema import SPAN_STRUCT

_OUT_TYPE = T.ArrayType(SPAN_STRUCT)


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


@F.pandas_udf(_OUT_TYPE)
def ocr_classify_spans(spans: pd.Series, provider: pd.Series) -> pd.Series:
    """Arrow-batched: fill media-span text via the embedded classifier.

    Batch shape: each Arrow batch arrives as a pandas Series of
    list<dict> span arrays. Media refs across the whole batch are
    flattened into one vector, classified in one vectorized pass, and
    scattered back — the shape a real Arrow-native model runner needs.
    """
    flat_refs: list[str] = []
    flat_providers: list[str] = []
    slots: list[tuple[int, int]] = []
    out: list[list[dict]] = []

    for row_idx, (row_spans, prov) in enumerate(zip(spans, provider)):
        row_spans = list(row_spans) if row_spans is not None else []
        new_row = []
        for span_idx, s in enumerate(row_spans):
            s = dict(s)
            if s["kind"] in MEDIA_KINDS:
                if prov == "pdfplumber":
                    s["text"] = ""
                else:
                    flat_refs.append(s["media_ref"])
                    flat_providers.append(prov)
                    slots.append((row_idx, span_idx))
            new_row.append(s)
        out.append(new_row)

    if flat_refs:
        texts = pd.Series(flat_refs).combine(
            pd.Series(flat_providers), lambda ref, p: fake_ocr_text(p, ref)
        )
        for (row_idx, span_idx), text in zip(slots, texts):
            out[row_idx][span_idx]["text"] = text

    return pd.Series(out)
