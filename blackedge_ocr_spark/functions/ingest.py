"""Ingest-boundary utilities: base64 payloads, header validation,
filename sanitizing, size caps.

Reference: src/services/pdf_input_handler.py (S1/S2/P3),
src/core/utils.py (S5/S6/P4). The service's temp-file spooling has no
table-scale analog; what remains is pure column logic: decode,
validate, sanitize, cap — all JVM built-ins, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PDF_MAGIC = "%PDF-"
MAX_FILE_MB = 50  # reference: src/core/constants.py:43
UNSAFE_FILENAME_CHARS = r'[/\\:*?"<>|\x00]'
MAX_FILENAME_LEN = 255


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def encode_payload(col) -> Column:
    """bytes/string → base64 string (S6, utils.py:21-47)."""
    return F.base64(_c(col).cast("binary"))


def decode_payload(col) -> Column:
    """base64 string → binary payload (S2, pdf_input_handler.py:89-147)."""
    return F.unbase64(_c(col))


def is_pdf_header(col) -> Column:
    """P3 — payload starts with %PDF- (pdf_input_handler.py:149-159)."""
    return F.startswith(
        _c(col).cast("string"), F.lit(PDF_MAGIC)
    )


def sanitize_filename(col) -> Column:
    """P4 — unsafe chars → '_', truncate to 255 PRESERVING the
    extension (utils.py:193-221: the reference truncates the stem via
    ``Path.stem``/``Path.suffix`` and re-appends the suffix, so a
    300-char name ending '.pdf' keeps '.pdf' — a plain substring would
    chop the extension and change downstream type handling).
    ``ext`` mirrors ``Path.suffix``: the final '.xxx' run with at
    least one char before it ('.hidden' and 'name.' have no suffix).

    Edge parity: when the extension alone exceeds 255, the reference's
    ``name[:max_length - len(ext)]`` is a NEGATIVE Python slice —
    it drops ``len(ext) - 255`` chars off the END of the stem, it
    does not keep zero — so ``keep`` switches to ``len(stem) + k``
    (floored at 0) exactly like a negative slice bound.
    """
    s = F.regexp_replace(_c(col), UNSAFE_FILENAME_CHARS, "_")
    ext = F.regexp_extract(s, r"^.+(\.[^.]+)$", 1)
    stem = s.substr(F.lit(1), F.length(s) - F.length(ext))
    k = F.lit(MAX_FILENAME_LEN) - F.length(ext)
    keep = F.when(k >= 0, k).otherwise(
        F.greatest(F.lit(0), F.length(stem) + k)
    )
    return F.when(
        F.length(s) > MAX_FILENAME_LEN,
        F.concat(stem.substr(F.lit(1), keep), ext),
    ).otherwise(s)


def within_size_cap(col, max_mb: int = MAX_FILE_MB) -> Column:
    """S5 — payload byte length <= cap (utils.py:115-141)."""
    return F.octet_length(_c(col).cast("binary")) <= max_mb * 1024 * 1024


def validate_payloads(df, payload_col: str, filename_col: str):
    """S1-shaped validation projection: decoded payload + header/size
    validity + sanitized name — the reference's upload gate as one
    fused filterable projection."""
    payload = decode_payload(payload_col)
    return df.withColumn("_payload", payload).select(
        "*",
        is_pdf_header(F.col("_payload")).alias("valid_header"),
        within_size_cap(F.col("_payload")).alias("valid_size"),
        sanitize_filename(filename_col).alias("safe_filename"),
    ).drop("_payload")
