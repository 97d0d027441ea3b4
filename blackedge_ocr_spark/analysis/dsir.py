"""DSIR-style importance resampling over hashed n-gram features.

Implements the data-selection method of Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling" (DSIR —
public paper): represent every document as a bag of hashed n-gram
features (unigrams + adjacent bigrams), fit two add-one-smoothed
categorical distributions over the hashed buckets — one on a TARGET
corpus slice (the distribution you want more of), one on the RAW
corpus — and weight each document by the log likelihood ratio
``sum_f log(p_target[f] / p_raw[f])``. Selection takes the top-k
documents by that weight: the paper's Gumbel-perturbed sampling
degrades to the deterministic argmax top-k when bit-reproducibility
is required; at production scale a large-k selection would instead
threshold on a hash-sample quantile of the weight column
(sketches.sampled_quantiles) — never a global sort.

Determinism/parity discipline (the lm_scores twin):
- features hash with md5("dsir:" + feat); the bucket is the FIRST
  TWO HEX CHARS kept as a STRING (256 buckets, no integer
  conversion) — the sketches.py discipline, engine-portable;
- per-bucket log-ratios are micro-unit-rounded ONCE on the O(256)
  bucket table; per-doc sums are exact long adds, order-free under
  any partitioning; one division at the end.

Shape at scale: pass 1 = ONE combinable conditional hash agg over
the exploded feature stream (raw + target counts come out of the
SAME 256-row agg — the target membership is a column predicate, not
a second corpus scan); the 256-row ratio table BROADCASTS; pass 2 =
explode + map-side broadcast join + combinable per-doc agg. The
corpus never shuffles on a feature key. The top-k select is
TakeOrderedAndProject (map-side partial top-k, k rows total) — no
single-partition window over the corpus.

Reference analog: none (the reference is a per-doc OCR service) —
extends the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blackedge_ocr_spark.functions.text import tokens

# Hashed feature space: 2 hex chars = 256 buckets. Small enough that
# the ratio table broadcasts trivially; large enough that the testdata
# corpus populates every bucket with mixed-language mass.
DSIR_BUCKET_HEX = 2
DSIR_BUCKETS = 16**DSIR_BUCKET_HEX
# Target slice: the ground-truth-English documents stand in for the
# paper's high-quality target corpus (Wikipedia/books in the paper).
DSIR_TARGET_LANG = "en"
# Deterministic resample head size.
DSIR_SELECT_K = 100


def ngram_features(text: Column) -> Column:
    """Unigrams + adjacent bigrams of the normalized token stream —
    the paper's hashed n-gram feature bag (n=2), order preserved,
    repeats kept (it is a bag, not a set)."""
    toks = tokens(text)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def feature_bucket(feat: Column) -> Column:
    """md5("dsir:" + feat) hex prefix — the hashed feature id, kept
    as a string (no integer conversion; sketches.py discipline)."""
    return F.substring(
        F.md5(F.concat(F.lit("dsir:"), feat)), 1, DSIR_BUCKET_HEX
    )


def _exploded(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_t"),
        F.explode(ngram_features(F.col("text"))).alias("feat"),
    ).select("doc_id", "is_t", feature_bucket(F.col("feat")).alias("bucket"))


def dsir_weights(docs: DataFrame) -> DataFrame:
    """Per-document DSIR log importance weight.

    Returns (doc_id, n_feats, logw) where ``logw`` is the exact long
    micro-unit sum of per-bucket log-ratios divided once by 1e6.
    Feature-less documents survive with (0, 0.0) via the final left
    join from the un-exploded side (the dup_ngrams discipline).
    """
    ex = _exploded(docs)
    # ONE corpus pass: raw and target counts from the same hash agg.
    c = ex.groupBy("bucket").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.when(F.col("is_t"), F.lit(1)).otherwise(F.lit(0))).alias(
            "n_tgt"
        ),
    )
    tot = c.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    # Add-one smoothing over the full 256-bucket space, micro-unit
    # rounded ONCE per bucket (identical IEEE divide/ln/subtract on
    # both engines — the lm_scores-proven ln discipline).
    li = F.floor(
        (
            F.log(
                (F.col("n_tgt") + 1).cast("double")
                / (F.col("t_tgt") + DSIR_BUCKETS).cast("double")
            )
            - F.log(
                (F.col("n_raw") + 1).cast("double")
                / (F.col("t_raw") + DSIR_BUCKETS).cast("double")
            )
        )
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    ratio = c.crossJoin(F.broadcast(tot)).select("bucket", li.alias("li"))
    # Pass 2: every observed bucket is in `ratio` by construction
    # (same corpus trained the counts), so the broadcast join is
    # inner without loss.
    per_doc = (
        ex.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("li").alias("s"))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.when(
                F.col("n_feats") > 0,
                F.col("s").cast("double") / F.lit(1e6),
            )
            .otherwise(F.lit(0.0))
            .alias("logw"),
        )
    )


def dsir_select(docs: DataFrame, k: int = DSIR_SELECT_K) -> DataFrame:
    """Deterministic top-``k`` resample head: (rank, doc_id, n_feats,
    logw) ordered by (logw desc, doc_id). TakeOrderedAndProject shape
    — map-side partial top-k, k rows total; the rank window runs on
    the k-row result, never the corpus."""
    head = (
        dsir_weights(docs)
        .orderBy(F.col("logw").desc(), F.col("doc_id"))
        .limit(k)
    )
    from pyspark.sql.window import Window

    # Single-partition window over an input bounded at k rows by the
    # limit above. The partition key is constant-per-row but NOT
    # foldable (a literal — even via withColumn — gets propagated and
    # stripped from the spec by Catalyst, re-triggering the "No
    # Partition Defined" WARN); keeping the spec non-empty keeps that
    # WARN channel clean for catching genuinely unbounded windows.
    w = Window.partitionBy(F.least(F.length("doc_id"), F.lit(0))).orderBy(
        F.col("logw").desc(), F.col("doc_id")
    )
    return head.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "n_feats",
        "logw",
    )
