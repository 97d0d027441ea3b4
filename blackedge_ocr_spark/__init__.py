"""blackedge_ocr_spark — a PySpark-native document-extraction engine.

From-scratch re-expression of the extract-then-validate capabilities
of avichay-be/Blackedge-OCR (reference at /root/reference) over
interleaved text+media span tables: routing, embedded OCR-classify,
quality problem detection, similarity cross-validation, ordered
reassembly — declarative DataFrame expressions end-to-end, Arrow UDFs
only at the inference boundary.
"""

from blackedge_ocr_spark.incremental import incremental_extract  # noqa: F401
from blackedge_ocr_spark.pipeline import extract_documents  # noqa: F401
from blackedge_ocr_spark.session import build_session  # noqa: F401

__version__ = "0.1.0"
