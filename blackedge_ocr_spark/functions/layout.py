"""Layout-analysis JSON parsing: Azure-DI-shaped analyzeResult →
ordered page texts with tables pivoted and appended.

Reference semantics (all re-expressed as JVM built-ins):
- pages in ``analyzeResult.pages`` order, page text =
  ``"\\n".join(line.content)`` (azure_di_client.py:297-325);
- each table attaches to the page where
  ``boundingRegions[0].pageNumber`` matches (J3,
  azure_di_client.py:309-311) — an array-level filter, no join/shuffle;
- table cells grouped by rowIndex, columns sorted by columnIndex,
  cells joined ``" | "``, rows joined ``"\\n"``, block prefixed
  ``"\\nTABLE:\\n"`` (T9, azure_di_client.py:327-368);
- W2 ordering via array_sort on struct arrays.

The document enters as a JSON string column (the shape a layout
service would emit); ``from_json`` with an explicit schema replaces
the reference's dict walking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANALYZE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField(
            "analyzeResult",
            T.StructType(
                [
                    T.StructField(
                        "pages",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("pageNumber", T.IntegerType()),
                                    T.StructField(
                                        "lines",
                                        T.ArrayType(
                                            T.StructType(
                                                [T.StructField("content", T.StringType())]
                                            )
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "tables",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "boundingRegions",
                                        T.ArrayType(
                                            T.StructType(
                                                [T.StructField("pageNumber", T.IntegerType())]
                                            )
                                        ),
                                    ),
                                    T.StructField(
                                        "cells",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("rowIndex", T.IntegerType()),
                                                    T.StructField("columnIndex", T.IntegerType()),
                                                    T.StructField("content", T.StringType()),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


def _sort_by_int(arr: Column, key) -> Column:
    return F.array_sort(
        arr,
        lambda l, r: F.when(key(l) < key(r), -1)
        .when(key(l) > key(r), 1)
        .otherwise(0),
    )


def format_table(cells: Column) -> Column:
    """cells array<struct<rowIndex,columnIndex,content>> → pivoted
    text block (T9): rows by rowIndex, cols sorted by columnIndex,
    ' | '-joined cells, newline-joined rows."""
    row_ids = F.array_sort(
        F.array_distinct(F.transform(cells, lambda c: c["rowIndex"]))
    )
    row_text = lambda rid: F.concat_ws(
        " | ",
        F.transform(
            _sort_by_int(
                F.filter(cells, lambda c: c["rowIndex"] == rid),
                lambda c: c["columnIndex"],
            ),
            lambda c: F.coalesce(c["content"], F.lit("")),
        ),
    )
    return F.concat_ws("\n", F.transform(row_ids, row_text))


def parse_layout_struct(doc_json: Column) -> Column:
    """The from_json parse alone. MATERIALIZE this as a column
    attribute (withColumn) before calling ``layout_pages`` — an
    inlined parse referenced inside the per-page lambda is re-parsed
    once per page element (O(pages x json_size); two JsonToStructs in
    the optimized plan), the same inlined-expression trap documented
    in operators/ocr.py."""
    return F.from_json(doc_json, ANALYZE_RESULT_SCHEMA)["analyzeResult"]


def parse_layout_json(doc_json: Column) -> Column:
    """One-shot convenience (json in, pages out) for tests and small
    payloads. Production materializes ``parse_layout_struct`` first
    and calls ``layout_pages`` on the attribute."""
    return layout_pages(parse_layout_struct(doc_json))


def layout_pages(parsed: Column) -> Column:
    """parsed analyzeResult struct (a MATERIALIZED attribute) →
    array<struct<offset:int, text:string>> of page texts in page
    order, tables appended to their page (T10 + J3)."""
    pages = parsed["pages"]
    tables = parsed["tables"]

    def page_text(p):
        lines = F.concat_ws(
            "\n", F.transform(p["lines"], lambda l: l["content"])
        )
        no_tables = F.array().cast(
            "array<struct<boundingRegions:array<struct<pageNumber:int>>,"
            "cells:array<struct<rowIndex:int,columnIndex:int,content:string>>>>"
        )
        page_tables = F.filter(
            F.coalesce(tables, no_tables),
            lambda t: t["boundingRegions"][0]["pageNumber"] == p["pageNumber"],
        )
        tables_text = F.concat_ws(
            "",
            F.transform(
                page_tables,
                # gate the marker on a non-empty body: a table with
                # null/empty cells otherwise emits a dangling
                # '\nTABLE:\n' that pollutes content and can trip the
                # downstream whitespace/incomplete-table detectors
                lambda t: F.when(
                    F.length(format_table(t["cells"])) > 0,
                    F.concat(
                        F.lit("\nTABLE:\n"), format_table(t["cells"])
                    ),
                ).otherwise(F.lit("")),
            ),
        )
        return F.concat(lines, tables_text)

    return F.transform(
        _sort_by_int(pages, lambda p: p["pageNumber"]),
        lambda p: F.struct(
            (p["pageNumber"] - 1).cast("int").alias("offset"),
            page_text(p).alias("text"),
        ),
    )
