"""Bisect pipeline scaling: time sub-plans at a given core count.

Usage: python tools/profile_stages.py <cpus> [replicate]
Stages: A=spansify (JVM), B=+sort+problems (JVM), C=+primary OCR (1
Arrow boundary), D=full pipeline (2 boundaries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    os.environ["SPARK_GRAFT_REPLICATE"] = str(replicate)

    from pyspark.sql import functions as F

    from blackedge_ocr_spark.datagen import spansify_documents
    from blackedge_ocr_spark.operators.ocr import (
        fill_media_text,
        filter_media,
        first_per_offset,
        ocr_media_map,
    )
    from blackedge_ocr_spark.pipeline import extract_documents, sort_spans, span_problems
    from blackedge_ocr_spark.session import build_session

    spark = build_session(master=f"local[{cpus}]")
    sf = "/root/testdata/sf0.1"

    def t(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(json.dumps({"stage": name, "cpus": cpus,
                          "sec": round(time.time() - t0, 2)}), flush=True)

    base = spansify_documents(spark, sf)
    t("A_spansify", base)
    b = base.withColumn("_sorted", sort_spans(F.col("spans")))
    b = b.withColumn("problems", span_problems(F.col("_sorted")))
    t("B_jvm_problems", b)
    c = (
        base.withColumn("_sorted", sort_spans(F.col("spans")))
        .withColumn("_media", filter_media(F.col("_sorted")))
        .withColumn("_media", first_per_offset(F.col("_media")))
        .withColumn("_m", ocr_media_map(F.col("_media"), F.lit("mistral")))
        .withColumn("out", fill_media_text(F.col("_sorted"), F.col("_m")))
    )
    t("C_one_ocr", c)
    d = extract_documents(base, query_col="query")
    t("D_full_arrow", d)
    e = extract_documents(base, query_col="query", ocr_impl="jvm")
    t("E_full_jvm", e)
    spark.stop()


if __name__ == "__main__":
    main()
