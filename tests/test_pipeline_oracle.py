"""End-to-end per-row invariant: the Spark pipeline's output must
equal the pure-Python oracle on the adversarial fixture corpus —
exact span-sequence equality (kind, text, media_ref, offset) plus all
derived columns (BASELINE.json per-row invariant; FIXTURES.md §6)."""

import pytest

from blackedge_ocr_spark import extract_documents, oracle
from blackedge_ocr_spark.datagen import fixture_dataframe, fixture_documents


@pytest.fixture(scope="module")
def results(spark):
    df = fixture_dataframe(spark)
    out = extract_documents(
        df, query_col="query", explicit_col="explicit_workflow"
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_every_document_matches_oracle(results):
    docs = fixture_documents()
    assert len(results) == len(docs)
    for doc_id, spans, query, explicit in docs:
        expected = oracle.expected_result(doc_id, spans, query, explicit)
        got = results[doc_id]

        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in got["out_spans"]
        ]
        assert got_spans == expected["out_spans"], doc_id

        got_problems = [(p["offset"], list(p["labels"])) for p in got["problems"]]
        assert got_problems == expected["problems"], doc_id

        assert got["workflow"] == expected["workflow"], doc_id
        assert got["content"] == expected["content"], doc_id
        assert got["used_secondary"] == expected["used_secondary"], doc_id
        assert got["reason"] == expected["reason"], doc_id
        assert got["pages"] == expected["pages"], doc_id
        assert got["provider"] == expected["provider"], doc_id
        if expected["similarity"] is None:
            assert got["similarity"] is None, doc_id
        else:
            assert got["similarity"] == pytest.approx(
                expected["similarity"], abs=1e-12
            ), doc_id


def test_scrambled_spans_resorted(results):
    """d002 stores spans out of order; output must be offset-ordered."""
    offsets = [s["offset"] for s in results["d002"]["out_spans"]]
    assert offsets == [0, 1, 2]
    assert "Page one." in results["d002"]["out_spans"][0]["text"]


def test_media_spans_ocr_classified(results):
    """d020 routes to mistral: media spans carry deterministic
    embedded-OCR text; validation flips to secondary (openai hex
    differs → low number-frequency similarity)."""
    row = results["d020"]
    media = [s for s in row["out_spans"] if s["kind"] in ("image", "page")]
    assert all(s["text"].startswith("Extracted by mistral ocr") for s in media)
    assert row["used_secondary"] is True
    assert row["reason"] == "low_similarity"
    assert "Extracted by openai ocr" in row["content"]


def test_text_extraction_blanks_media(spark):
    """Under text_extraction, media spans extract to '' (pdfplumber
    cannot OCR) and no validation ever runs."""
    import pyspark.sql.functions as F

    df = fixture_dataframe(spark)
    forced = extract_documents(
        df.filter("doc_id = 'd020'").withColumn("explicit_workflow", F.lit("text")),
        query_col="query",
        explicit_col="explicit_workflow",
    ).head()
    media_texts = [
        s["text"] for s in forced["out_spans"] if s["kind"] in ("image", "page")
    ]
    assert media_texts == ["", ""]
    assert forced["used_secondary"] is False
    assert forced["similarity"] is None
    assert forced["provider"] == "pdfplumber"


def test_validation_disabled(spark):
    df = fixture_dataframe(spark)
    out = extract_documents(df, enable_validation=False).collect()
    for r in out:
        assert r["used_secondary"] is False
        assert r["similarity"] is None
        assert r["reason"] is None
