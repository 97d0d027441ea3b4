"""Router vectors (reference: tests/unit/services/test_workflow_router.py
and src/services/workflow_router.py:16-128)."""

import pytest

from blackedge_ocr_spark import oracle
from blackedge_ocr_spark.operators.routing import route_workflow

CASES = [
    ("extract all tables with azure di", None, "azure_di"),
    ("use gemini for high quality extraction", None, "gemini"),
    ("extract text from scanned document", None, "ocr_images"),
    ("extract data", None, "mistral"),
    ("", None, "mistral"),
    (None, None, "mistral"),
    ("plain text only please", None, "text_extraction"),
    ("PDFPLUMBER run", None, "text_extraction"),
    # priority: text_extraction beats azure_di beats ocr beats gemini
    ("text extraction of smart tables", None, "text_extraction"),
    ("smart tables in scanned charts", None, "azure_di"),
    ("scanned charts with google", None, "ocr_images"),
    ("HIGH QUALITY extraction", None, "gemini"),
    ("process the invoice", None, "azure_di"),
    ("handwritten notes", None, "ocr_images"),
    # explicit overrides (alias map, workflow_types.py:44-53)
    ("whatever", "default", "mistral"),
    ("whatever", "text", "text_extraction"),
    ("whatever", "azure", "azure_di"),
    ("whatever", " AZURE-DI ", "azure_di"),
    ("whatever", "azuredi", "azure_di"),
    ("whatever", "ocr", "ocr_images"),
    ("whatever", "ocr_images", "ocr_images"),
    ("whatever", "gemini", "gemini"),
    ("whatever", "mistral", "mistral"),
    ("scanned", "text_extraction", "text_extraction"),
    # invalid explicit → NULL (reference raises ValueError)
    ("whatever", "nonsense", None),
    # gate is raw truthiness (router :53): whitespace-only takes the
    # explicit path and errors; empty string keyword-routes
    ("scanned charts", "   ", None),
    ("scanned charts", "", "ocr_images"),
    # from_string strips Unicode whitespace (str.strip), not just ASCII
    ("whatever", "\tgemini ", "gemini"),
]


def test_routing_vectors(spark):
    df = spark.createDataFrame(
        [(i, q, e) for i, (q, e, _) in enumerate(CASES)],
        "id int, query string, explicit string",
    )
    rows = (
        df.select("id", route_workflow("query", "explicit").alias("wf"))
        .orderBy("id")
        .collect()
    )
    for row, (query, explicit, expected) in zip(rows, CASES):
        assert row["wf"] == expected, (query, explicit)
        assert row["wf"] == oracle.route_workflow(query, explicit)


def test_unknown_method_raises():
    from blackedge_ocr_spark.functions import similarity_by_method

    with pytest.raises(ValueError, match="Unknown similarity method"):
        similarity_by_method("a", "b", "bogus")
