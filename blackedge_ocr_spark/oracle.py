"""Pure-Python oracle: the reference's semantics, reimplemented
independently for test-time ground truth.

This module is the per-row invariant source for pytest: the Spark
pipeline's output must match these functions exactly — span sequence
``(kind, text, media_ref, offset)``, problem labels, contents,
similarity scores, and the validation decision. Behavior contracts
cite the reference (/root/reference) file:line they encode; the code
is written from those contracts, not copied.
"""

from __future__ import annotations

import hashlib
import re

from blackedge_ocr_spark.constants import (
    AZURE_DI_KEYWORDS,
    CONTENT_SEPARATOR,
    ENCODING_ERROR_MARKERS,
    GEMINI_KEYWORDS,
    LEVENSHTEIN_REPORT_MAX,
    MAX_GIBBERISH_RATIO,
    MAX_REPEATED_CHAR_LENGTH,
    MEDIA_KINDS,
    MIN_CONTENT_LENGTH,
    MIN_WORD_COUNT,
    OCR_KEYWORDS,
    PAGE_BREAK_MARKERS,
    PRIMARY_PROVIDER,
    SECONDARY_PROVIDER,
    SIMILARITY_THRESHOLD,
    TEXT_EXTRACTION_KEYWORDS,
    VALIDATING_WORKFLOWS,
    WF_AZURE,
    WF_GEMINI,
    WF_MISTRAL,
    WF_OCR,
    WF_TEXT,
    WORKFLOW_ALIASES,
    WORKFLOWS,
)

# ---------------------------------------------------------------- text

# (?a) pins \d to ASCII — a DOCUMENTED deviation from the Python
# reference, whose unicode \d also matches exotic numerals like 𝟏𝟐
# (Nd category). Java regex and RE2 (\d = [0-9]) cannot match those
# without also breaking value conversion, so the engine, the DuckDB
# oracle and this model all agree on ASCII-digit semantics; \b/\w/\s
# stay unicode on every side via Java's (?U).
_NUM_RE = re.compile(r"(?a)-?\d+(?:,\d{3})*(?:\.\d+)?%?")
_TERM_RE = re.compile(r"\b[a-z0-9]+\b")
_WORD_RE = re.compile(r"\b\w+\b")


def normalize_text(text: str, preserve_case: bool = False) -> str:
    """content_normalizer.py:26-64."""
    if not text:
        return ""
    out = text if preserve_case else text.lower()
    out = out.replace("\r\n", " ").replace("\n", " ").replace("\r", " ")
    return re.sub(r"\s+", " ", out).strip()


def extract_numbers(text: str) -> list[float]:
    """content_normalizer.py:67-113."""
    if not text:
        return []
    out = []
    for m in _NUM_RE.findall(text):
        try:
            out.append(float(m.replace(",", "").rstrip("%")))
        except ValueError:
            continue
    return out


def extract_key_terms(text: str, min_length: int = 3) -> set[str]:
    """content_normalizer.py:116-140."""
    if not text:
        return set()
    return {
        w
        for w in _TERM_RE.findall(normalize_text(text))
        if len(w) >= min_length
    }


def calculate_word_frequency(text: str) -> dict[str, int]:
    """content_normalizer.py:143-173 — term counts with word
    boundaries over the normalized text."""
    if not text:
        return {}
    normalized = normalize_text(text)
    return {
        t: len(re.findall(rf"\b{re.escape(t)}\b", normalized))
        for t in extract_key_terms(text)
    }


def remove_page_breaks(text: str) -> str:
    """content_normalizer.py:176-196."""
    if not text:
        return ""
    for marker in PAGE_BREAK_MARKERS:
        text = text.replace(marker, " ")
    return re.sub(r"\s+", " ", text).strip()


def normalize_for_comparison(text: str) -> str:
    """content_normalizer.py:199-229."""
    if not text:
        return ""
    out = normalize_text(remove_page_breaks(text))
    out = re.sub(r"[^a-z0-9\s]", " ", out)
    return re.sub(r"\s+", " ", out).strip()


# ------------------------------------------------------------ problems


def detect_problems(content: str) -> list[str]:
    """The ten checks, fixed order (problem_detector.py:85-124)."""
    labels = []
    if len(content.strip()) < MIN_CONTENT_LENGTH:
        labels.append("low_content_density")
    has_table = "|" in content or "TABLE" in content.upper()
    if has_table and not re.search(r"(?a)\d", content):  # ASCII \d, see _NUM_RE
        labels.append("missing_numbers")
    if re.search(r"(.)\1{%d,}" % MAX_REPEATED_CHAR_LENGTH, content):
        labels.append("repeated_characters")
    words = _WORD_RE.findall(content)
    if len(words) < MIN_WORD_COUNT:
        labels.append("low_word_count")
    if _gibberish(content):
        labels.append("high_gibberish")
    if (
        re.search(r"[^\x00-\x7F]{5,}", content)
        or re.search("�{2,}", content)
        or re.search(r"[\x00-\x08\x0B\x0C\x0E-\x1F]", content)
    ):
        labels.append("suspicious_characters")
    if _incomplete_tables(content):
        labels.append("incomplete_tables")
    if re.search(r" {20,}", content) or content.count("\n\n\n") > 5:
        labels.append("excessive_whitespace")
    if any(m in content for m in ENCODING_ERROR_MARKERS):
        labels.append("encoding_issues")
    punct = re.findall(r"[.,!?;:]", content)
    if len(words) >= 50 and len(punct) < len(words) / 30:
        labels.append("missing_punctuation")
    return labels


def _gibberish(content: str) -> bool:
    """problem_detector.py:189-218."""
    ws = re.findall(r"\b[a-zA-Z]{4,}\b", content)
    if len(ws) < 10:
        return False
    bad = sum(
        1
        for w in ws
        if not re.search(r"[aeiou]", w.lower())
        or re.search(r"[bcdfghjklmnpqrstvwxyz]{5,}", w.lower())
    )
    return bad / len(ws) > MAX_GIBBERISH_RATIO


def _incomplete_tables(content: str) -> bool:
    """problem_detector.py:242-269."""
    if "TABLE" not in content.upper() and "|" not in content:
        return False
    table_lines = [l for l in content.split("\n") if "|" in l]
    if len(table_lines) < 2:
        return False
    return len({l.count("|") for l in table_lines}) > 2


# ---------------------------------------------------------- similarity


def _cosine(freq_a: dict, freq_b: dict) -> float:
    """similarity_calculator.py:227-258."""
    keys = set(freq_a) | set(freq_b)
    if not keys:
        return 0.0
    dot = sum(freq_a.get(k, 0) * freq_b.get(k, 0) for k in keys)
    mag_a = sum(v * v for v in freq_a.values()) ** 0.5
    mag_b = sum(v * v for v in freq_b.values()) ** 0.5
    if mag_a * mag_b == 0:
        return 0.0
    return dot / (mag_a * mag_b)


def _multiset(values) -> dict:
    out: dict = {}
    for v in values:
        out[v] = out.get(v, 0) + 1
    return out


def number_frequency_similarity(a: str, b: str) -> float:
    """similarity_calculator.py:69-107."""
    na, nb = extract_numbers(a), extract_numbers(b)
    if not na and not nb:
        return 1.0
    if not na or not nb:
        return 0.0
    return _cosine(_multiset(na), _multiset(nb))


def word_overlap_similarity(a: str, b: str) -> float:
    """similarity_calculator.py:109-143."""
    ta, tb = extract_key_terms(a), extract_key_terms(b)
    if not ta and not tb:
        return 1.0
    if not ta or not tb:
        return 0.0
    union = len(ta | tb)
    return len(ta & tb) / union if union else 0.0


def wordfreq_cosine_similarity(a: str, b: str) -> float:
    """similarity_calculator.py:145-177."""
    fa, fb = calculate_word_frequency(a), calculate_word_frequency(b)
    if not fa and not fb:
        return 1.0
    if not fa or not fb:
        return 0.0
    return _cosine(fa, fb)


def _edit_distance(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
        prev = cur
    return prev[-1]


def levenshtein_similarity(a: str, b: str) -> float:
    """similarity_calculator.py:179-225 (normalize → truncate 10k →
    1 - d/max_len)."""
    a = normalize_for_comparison(a)[:10000]
    b = normalize_for_comparison(b)[:10000]
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return 1.0 - _edit_distance(a, b) / max(len(a), len(b))


SIMILARITY_FNS = {
    "number_frequency": number_frequency_similarity,
    "word_overlap": word_overlap_similarity,
    "cosine": wordfreq_cosine_similarity,
    "levenshtein": levenshtein_similarity,
}


def similarity_report(a: str, b: str) -> dict:
    """similarity_calculator.py:309-332 (levenshtein skipped at >=5k
    raw chars)."""
    report = {
        "number_frequency": number_frequency_similarity(a, b),
        "word_overlap": word_overlap_similarity(a, b),
        "cosine": wordfreq_cosine_similarity(a, b),
    }
    report["levenshtein"] = (
        levenshtein_similarity(a, b)
        if len(a) < LEVENSHTEIN_REPORT_MAX and len(b) < LEVENSHTEIN_REPORT_MAX
        else None
    )
    return report


# ------------------------------------------------------------- routing


def route_workflow(query: str | None, explicit: str | None = None) -> str | None:
    """workflow_router.py:16-128 + workflow_types.py:28-66. Returns
    None for an invalid explicit workflow (the reference raises).

    The gate is raw truthiness (`if explicit_workflow:`,
    workflow_router.py:53) — strip happens only inside from_string —
    so a whitespace-only explicit takes the explicit path and errors
    rather than falling back to keyword routing.
    """
    if explicit:
        e = explicit.lower().strip()
        if e in WORKFLOW_ALIASES:
            return WORKFLOW_ALIASES[e]
        if e in WORKFLOWS:
            return e
        return None
    q = (query or "").lower()
    if any(k in q for k in TEXT_EXTRACTION_KEYWORDS):
        return WF_TEXT
    if any(k in q for k in AZURE_DI_KEYWORDS):
        return WF_AZURE
    if any(k in q for k in OCR_KEYWORDS):
        return WF_OCR
    if any(k in q for k in GEMINI_KEYWORDS):
        return WF_GEMINI
    return WF_MISTRAL


# ------------------------------------------------- pipeline end-to-end


def fake_ocr_text(provider: str, media_ref: str) -> str:
    """Mirror of operators/ocr.py:fake_ocr_text (the embedded
    classifier's deterministic stand-in)."""
    h = hashlib.md5(f"{provider}:{media_ref}".encode("utf-8")).hexdigest()
    nums = [int(h[i : i + 4], 16) for i in range(0, 16, 4)]
    return (
        f"Extracted by {provider} ocr engine from {media_ref}. "
        f"The image region reports values {nums[0]}, {nums[1]}, "
        f"{nums[2]} and {nums[3]}. Confidence stays high for every "
        f"block detected in this scan."
    )


def _extract_spans(spans, provider: str):
    out = []
    first_ref: dict = {}
    for kind, text, media_ref, offset in sorted(spans, key=lambda s: s[3]):
        if kind in MEDIA_KINDS:
            # duplicate-offset media: EVERY span of the run gets the
            # FIRST ref's OCR text (operators/ocr.first_per_offset —
            # first-wins, asserted by test_edge_cases.py)
            ref = first_ref.setdefault(offset, media_ref)
            text = (
                "" if provider == "pdfplumber"
                else fake_ocr_text(provider, ref)
            )
        out.append((kind, text, media_ref, offset))
    return out


def expected_result(
    doc_id: str,
    spans,
    query: str = "",
    explicit: str | None = None,
    enable_validation: bool = True,
    similarity_method: str = "number_frequency",
    similarity_threshold: float = SIMILARITY_THRESHOLD,
) -> dict:
    """Ground-truth pipeline row for one document (FIXTURES.md §6).

    spans: iterable of (kind, text, media_ref, offset) tuples.
    """
    workflow = route_workflow(query, explicit)
    # invalid explicit → workflow None → NULL-provider error row (the
    # engine still fills media text with the stringified provider,
    # "None:" — .get mirrors that instead of raising KeyError)
    provider = PRIMARY_PROVIDER.get(workflow)
    out_spans = _extract_spans(spans, provider)
    content = CONTENT_SEPARATOR.join(s[1] for s in out_spans)
    problems = []
    for s in out_spans:
        labels = detect_problems(s[1])  # ten regex checks — run once
        if labels:
            problems.append((s[3], labels))
    validating = enable_validation and workflow in VALIDATING_WORKFLOWS
    similarity = None
    used_secondary = False
    reason = None
    final_content = content
    if validating:
        secondary = _extract_spans(spans, SECONDARY_PROVIDER[workflow])
        secondary_content = CONTENT_SEPARATOR.join(s[1] for s in secondary)
        if problems:
            used_secondary, reason = True, "quality_issues"
            final_content = secondary_content
        else:
            similarity = SIMILARITY_FNS[similarity_method](
                content, secondary_content
            )
            if similarity < similarity_threshold:
                used_secondary, reason = True, "low_similarity"
                final_content = secondary_content
    return {
        "doc_id": doc_id,
        "workflow": workflow,
        "out_spans": out_spans,
        "problems": problems,
        "content": final_content,
        "used_secondary": used_secondary,
        "similarity": similarity,
        "reason": reason,
        "pages": len(spans),
        "provider": provider,
    }
