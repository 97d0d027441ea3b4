"""Distributed quality-classifier training: logistic regression by
batch gradient descent, entirely as DataFrame aggregations.

The fastText-style curation move (train a cheap classifier on weak
labels, score the whole corpus) re-expressed Spark-first: each GD
iteration is ONE map-side-combinable aggregation over the persisted
feature table, and the 1-row weight state rides forward as a
broadcast crossJoin — the full loop is a single chained logical plan
with no driver-side collect. Reference analog: the validation
scoring chain in /root/reference/src/services/extraction_service.py
picks a served result from extraction signals; this trains the
analogous decision function from corpus-derived signals instead of
hard-coding it.

Determinism discipline (the textstats micro-unit house rule): every
per-row gradient contribution is micro-unit-rounded ONCE to a long,
iteration gradients are exact long sums (order-free under any
partitioning), and the weights themselves live as micro-unit longs —
so all three iterations and the final scores are bit-identical in
DuckDB with the same unrolled CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis.textstats import (
    predict_lang,
    quality_col,
    ws_tokens_col,
    _r6,
)

LR_ITERS = 3
LR_RATE = 0.5
LR_X1_SCALE = 100.0  # ws_tokens saturation for the length feature
LR_POS_LANG = "en"  # weak label: language-ID says English


def feature_table(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x1, x2): weak label + bounded length feature +
    composite quality — one zero-shuffle projection over the scan
    (every constituent is a proven standalone expression)."""
    return docs.select(
        "doc_id",
        F.when(predict_lang(F.col("text")) == LR_POS_LANG, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
        F.least(
            ws_tokens_col(F.col("text")).cast("double") / F.lit(LR_X1_SCALE),
            F.lit(1.0),
        ).alias("x1"),
        quality_col(F.col("text")).alias("x2"),
    )


def train_quality_classifier(
    docs: DataFrame, iters: int = LR_ITERS, lr: float = LR_RATE
) -> DataFrame:
    """Per-doc scores under ``iters`` exact GD steps from w = 0:

        z   = w0 + w1*x1 + w2*x2        (w_j = w_j_u / 1e6)
        p   = 1 / (1 + exp(-z))
        g_j = sum_rows round_u((p - y) * x_j)   (exact long)
        w_j_u <- w_j_u - round(lr * g_j / n)

    Output: (doc_id, label, score) with score = r6(p) at the final
    weights.

    Shape at scale: the feature table is ONE projection, persisted
    and scanned ``iters + 1`` times; each iteration is one combinable
    agg to a single row that broadcasts into the next pass — no
    driver collect, no shuffle of the corpus, the whole loop is one
    chained plan (the same pattern MLlib's own LBFGS uses, minus the
    treeAggregate driver hop). Iteration count is fixed and small,
    exactly like a production curation-classifier bootstrap.
    """
    feats = feature_table(docs).persist()
    spark = feats.sparkSession
    w = spark.range(1).select(
        F.lit(0).cast("long").alias("w0_u"),
        F.lit(0).cast("long").alias("w1_u"),
        F.lit(0).cast("long").alias("w2_u"),
    )

    def z_col():
        return (
            (F.col("w0_u").cast("double") / F.lit(1e6))
            + (F.col("w1_u").cast("double") / F.lit(1e6)) * F.col("x1")
            + (F.col("w2_u").cast("double") / F.lit(1e6)) * F.col("x2")
        )

    def p_col():
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z_col()))

    for _ in range(iters):
        err = p_col() - F.col("y")
        g = feats.crossJoin(F.broadcast(w)).agg(
            *[
                F.sum(
                    F.floor((err * xj) * F.lit(1e6) + F.lit(0.5)).cast("long")
                ).alias(f"g{j}")
                for j, xj in enumerate(
                    (F.lit(1.0), F.col("x1"), F.col("x2"))
                )
            ],
            F.count("*").alias("n"),
            F.max("w0_u").alias("w0_u"),
            F.max("w1_u").alias("w1_u"),
            F.max("w2_u").alias("w2_u"),
        )
        w = g.select(
            *[
                (
                    F.col(f"w{j}_u")
                    - F.floor(
                        F.lit(lr)
                        * (
                            F.col(f"g{j}").cast("double")
                            / F.col("n").cast("double")
                        )
                        + F.lit(0.5)
                    ).cast("long")
                ).alias(f"w{j}_u")
                for j in range(3)
            ]
        )

    return feats.crossJoin(F.broadcast(w)).select(
        "doc_id",
        F.col("y").cast("long").alias("label"),
        _r6(p_col()).alias("score"),
    )


CAL_BINS = 10  # score deciles


def calibration_report(scored: DataFrame) -> DataFrame:
    """(bin, n, n_pos, pos_rate): decile calibration of the trained
    scores against the weak labels — the table a curation team reads
    before trusting the classifier's threshold (a well-calibrated
    bootstrap shows pos_rate rising monotonically with the bin).

    bin = least(9, floor(score·10)) so score 1.0 lands in the top
    decile; pos_rate is the micro-unit-rounded exact ratio of two
    long counts. One combinable agg over ≤ 10 groups — nothing
    about the corpus shuffles beyond the 10-row exchange."""
    b = F.least(
        F.lit(CAL_BINS - 1).cast("long"),
        F.floor(F.col("score") * CAL_BINS),
    )
    return (
        scored.groupBy(b.alias("bin"))
        .agg(F.count("*").alias("n"), F.sum("label").alias("n_pos"))
        .select(
            "bin",
            "n",
            "n_pos",
            (
                F.floor(
                    F.col("n_pos").cast("double")
                    / F.col("n").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("pos_rate"),
        )
    )
