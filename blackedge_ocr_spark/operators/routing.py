"""Workflow routing as a constant-foldable when-chain.

reference: src/services/workflow_router.py:16-128 (priority-ordered
keyword containment over the lowercased query) and
src/workflows/workflow_types.py:28-66 (explicit-override alias map).
The keyword lists are literals, so Catalyst folds the chain once at
plan time — the reference re-scans the lists per request.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blackedge_ocr_spark.constants import (
    AZURE_DI_KEYWORDS,
    GEMINI_KEYWORDS,
    OCR_KEYWORDS,
    TEXT_EXTRACTION_KEYWORDS,
    WF_AZURE,
    WF_GEMINI,
    WF_MISTRAL,
    WF_OCR,
    WF_TEXT,
    WORKFLOW_ALIASES,
    WORKFLOWS,
)


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _any_keyword(q: Column, keywords) -> Column:
    pred = F.lit(False)
    for kw in keywords:
        pred = pred | q.contains(kw)
    return pred


def route_workflow(query_col, explicit_col=None) -> Column:
    """Workflow name for each row.

    Keyword routing priority (workflow_router.py:68-128):
    text_extraction → azure_di → ocr_images → gemini → mistral default.
    When ``explicit_col`` is given, a recognized explicit workflow wins
    (router :52-57); unrecognized explicit values yield NULL so callers
    can surface them as errors (the reference raises ValueError,
    router :58-63) — pair with ``explicit_workflow_col``.
    """
    q = F.lower(F.coalesce(_c(query_col), F.lit("")))
    routed = (
        F.when(_any_keyword(q, TEXT_EXTRACTION_KEYWORDS), F.lit(WF_TEXT))
        .when(_any_keyword(q, AZURE_DI_KEYWORDS), F.lit(WF_AZURE))
        .when(_any_keyword(q, OCR_KEYWORDS), F.lit(WF_OCR))
        .when(_any_keyword(q, GEMINI_KEYWORDS), F.lit(WF_GEMINI))
        .otherwise(F.lit(WF_MISTRAL))
    )
    if explicit_col is None:
        return routed
    explicit = explicit_workflow_col(explicit_col)
    # Reference gate is `if explicit_workflow:` — truthiness BEFORE
    # any strip (router :52-57), so a whitespace-only explicit value
    # takes the explicit path and errors (from_string strips, finds
    # nothing, raises) instead of silently keyword-routing.
    has_explicit = F.coalesce(_c(explicit_col), F.lit("")) != ""
    return F.when(has_explicit, explicit).otherwise(routed)


def explicit_workflow_col(explicit_col) -> Column:
    """Resolve an explicit workflow string via the alias map +
    exact-value match (workflow_types.py:41-61); NULL when invalid.
    Strip is Python ``str.strip()`` parity (py_strip: Unicode
    whitespace, both ends) — ``F.trim`` removes ASCII spaces only, so
    a tab-padded valid workflow would have become a NULL error.
    """
    from blackedge_ocr_spark.functions.text import py_strip

    e = F.lower(py_strip(_c(explicit_col)))
    out = F.lit(None).cast("string")
    resolved = F.when(F.lit(False), F.lit(""))
    mapping = dict(WORKFLOW_ALIASES)
    for wf in WORKFLOWS:
        mapping.setdefault(wf, wf)
    for alias, target in mapping.items():
        resolved = resolved.when(e == alias, F.lit(target))
    return resolved.otherwise(out)
