"""Cardinality and frequency sketches with exact-audit reporting.

At 100 TB, exact `COUNT(DISTINCT)` and exact heavy-hitter tables are
the profiling queries a fleet runs FIRST — and the sketch versions
(HyperLogLog registers, count-min counters) are what it actually
keeps, because their state is O(registers), mergeable map-side, and
shippable between jobs. Spark's own `approx_count_distinct` IS an
HLL++; this module implements the sketch arithmetic explicitly so
(a) the register tables are first-class DataFrames a pipeline can
persist/merge across corpus deltas, and (b) every number is
bit-reproducible in the DuckDB oracle — the same determinism
discipline as the rest of the engine (Spark's built-in sketch is
not cross-engine mirrorable).

Both operators follow the ann_recall audit pattern: emit the sketch
estimate NEXT TO the exact value, so the report itself quantifies
the error a user would accept before switching the big corpus to
sketch-only mode.

Cross-engine determinism:
- hashing is md5-hex, consumed as STRINGS (bucket = hex prefix) and
  leading-zero runs (regexp over the hex window + a nibble CASE) —
  no integer conversion, no platform hash;
- HLL's Σ2^(-M_j) is computed SCALED as Σ2^(53-M_j) in exact int64
  arithmetic (max 256·2^53 = 2^61 — order-free, the same
  fixed-point trick the k-means/lm paths use), with ONE double
  division at the end;
- the small-range correction's ln() is micro-unit-rounded once (the
  lm_scores house rule);
- count-min is pure integer counting end-to-end.

Reference analog: none — the reference has no corpus-profiling
surface; this extends the training-data-pipeline brief
(corpus_stats / top_terms are the exact twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blackedge_ocr_spark.functions.text import tokens

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_WINDOW = 13                # hex chars scanned for the zero run: 52 bits
HLL_RHO_CAP = 4 * HLL_WINDOW + 1
# alpha_m·m²·2^53-scaled numerator, computed ONCE here and inlined as
# the identical double literal in the SQL oracle (sqloracle imports
# it) — the engines never re-derive it. The scale is 2^HLL_RHO_CAP so
# the per-register shift 53-m stays in [0, 52] even when a register
# saturates at the cap (52-m would shift by -1 there: Long.MIN_VALUE
# in Spark, an OutOfRange error in DuckDB).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_CAP)
CMS_DEPTH = 4                  # independent hash rows
CMS_SLOT_HEX = 3               # 3 hex chars → 4096 slots per row
CMS_TOP_K = 20                 # audited heavy hitters


def _rho(col) -> "F.Column":
    """Leading-zero-run rank over the 52-bit hex window following the
    register prefix: 4·(leading '0' hex chars) + the first non-zero
    nibble's own leading zeros + 1, capped when the window is all
    zeros. String ops + one CASE — identical in DuckDB."""
    win = F.substring(col, HLL_P // 4 + 1, HLL_WINDOW)
    zeros = F.length(F.regexp_extract(win, "^(0*)", 1))
    nib = F.substring(win, zeros + 1, 1)
    extra = (
        F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(zeros == HLL_WINDOW, F.lit(HLL_RHO_CAP)).otherwise(
        zeros * 4 + extra + 1
    )


def hll_registers(docs: DataFrame) -> DataFrame:
    """(source, bucket, m) HLL register table over the corpus term
    stream — the persistable/mergeable sketch state. NO distinct
    pass: max-rho absorbs duplicate terms, so the input is the raw
    token explode and the only exchange is the O(sources × 256)
    register agg (map-side combinable max)."""
    h = F.md5(F.col("term"))
    return (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .select(
            "source",
            F.substring(h, 1, HLL_P // 4).alias("bucket"),
            _rho(h).alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_distinct(docs: DataFrame) -> DataFrame:
    """Per-source distinct-term cardinality: HLL estimate audited
    against the exact count — (source, n_exact, n_hll, rel_err).

    The exact side costs the O(distinct) shuffle the sketch exists to
    avoid; it is part of the REPORT (the audit pattern), not of the
    production sketch path, which is ``hll_registers`` alone."""
    regs = hll_registers(docs)
    agg = regs.groupBy("source").agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {HLL_RHO_CAP} - m)")
        ).alias("s_present"),
        F.count("*").alias("n_regs"),
    )
    v = (F.lit(HLL_M) - F.col("n_regs")).cast("long")
    s = (
        F.col("s_present")
        + v * F.lit(1 << HLL_RHO_CAP).cast("long")
    ).cast("double")
    e_raw = F.lit(HLL_NUMER) / s
    # small-range (linear counting) branch: micro-rounded ln, the
    # lm_scores discipline
    ln_mv = (
        F.floor(F.log(F.lit(float(HLL_M)) / v.cast("double")) * 1e6 + 0.5)
        / 1e6
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0), F.lit(float(HLL_M)) * ln_mv
    ).otherwise(e_raw)
    sketch = agg.select(
        "source", (F.floor(est * 1e6 + F.lit(0.5)) / 1e6).alias("n_hll")
    )
    exact = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("source")
        .agg(F.countDistinct("term").alias("n_exact"))
    )
    rel = (
        F.floor(
            F.abs(F.col("n_hll") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return exact.join(sketch, "source").select(
        "source", "n_exact", "n_hll", rel.alias("rel_err")
    )


def _cms_slot(term, row: int) -> "F.Column":
    """Row-``row``'s slot key: 3-hex-char prefix of the salted md5 —
    kept as a string, no integer conversion."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{row}:"), term)), 1, CMS_SLOT_HEX
    )


def cms_counters(docs: DataFrame) -> DataFrame:
    """(row, slot, n) count-min counter table over the corpus token
    stream — CMS_DEPTH rows × 4096 slots of exact int64 counts. The
    token explode fans out ×CMS_DEPTH before ONE combinable agg;
    counter state is O(depth × width), mergeable by addition."""
    keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_slot(F.col("term"), i).alias("slot")
            )
            for i in range(CMS_DEPTH)
        ]
    )
    return (
        docs.select(
            F.explode(tokens(F.col("text"))).alias("term")
        )
        .select(F.explode(keys).alias("k"))
        .groupBy("k.row", "k.slot")
        .agg(F.count("*").alias("n"))
    )


def cms_topk(docs: DataFrame, k: int = CMS_TOP_K) -> DataFrame:
    """Heavy-hitter audit: the exact top-``k`` corpus terms (the
    top_terms total order) with their count-min estimates —
    (term, n_exact, n_cms, overcount). n_cms = min over the term's
    CMS_DEPTH counters ≥ n_exact always (pure integer arithmetic, so
    the inequality is structural, not numeric). The probe side is k
    terms × depth keys — it broadcasts into the counter table."""
    counters = cms_counters(docs)
    exact = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("term"))
        .limit(k)
    )
    probes = exact.select(
        "term",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_slot(F.col("term"), i).alias("slot"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("k"),
    ).select("term", "n_exact", "k.row", "k.slot")
    est = (
        probes.join(counters, ["row", "slot"])
        .groupBy("term", "n_exact")
        .agg(F.min("n").alias("n_cms"))
    )
    return est.select(
        "term",
        "n_exact",
        "n_cms",
        (F.col("n_cms") - F.col("n_exact")).alias("overcount"),
    )


# ------------------------------------------------- Bloom membership

BLOOM_DEPTH = 2      # hash functions (rows)
BLOOM_SLOT_HEX = 3   # 3 hex chars → 4096 slots per row (audit sizing)
BLOOM_GATE_HEX = 5   # 5 hex chars → 1M slots per row (streaming-dedup
                     # registry gate sizing)


def _bloom_slot(key, row: int, hex_chars: int = BLOOM_SLOT_HEX) -> "F.Column":
    """Row-``row``'s bit address for a content key: ``hex_chars``-hex
    prefix of the salted md5 — string-keyed like the CMS slots, no
    integer conversion. The audit filter uses 3 chars (4096 slots,
    observable FP rate at contract scale); the streaming dedup gate
    uses 5 (1M slots/row — sized so a million-hash registry stays
    ~mid-load instead of saturating)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"bf{row}:"), key)), 1, hex_chars
    )


def bloom_bits(docs: DataFrame) -> DataFrame:
    """(row, slot) occupancy table of a partitioned Bloom filter over
    the corpus CONTENT-HASH keys (dedup.content_hash — the exact-dedup
    identity). This is the persistable membership pre-filter a
    100 TB incremental ingest asks before shuffling anything: "has
    this content been seen?" State is at most BLOOM_DEPTH × 4096
    rows, built by ONE map-side-combinable distinct, mergeable across
    corpus deltas by union+distinct, and broadcastable into every
    probe join. Sized for the audit corpus (~12% per-row load at 500
    keys → observable FP rate); a production filter scales
    BLOOM_SLOT_HEX up, nothing else changes."""
    from blackedge_ocr_spark.analysis.dedup import content_hash

    key = content_hash(F.col("text"))
    ks = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _bloom_slot(key, i).alias("slot")
            )
            for i in range(BLOOM_DEPTH)
        ]
    )
    return (
        docs.select(F.explode(ks).alias("k"))
        .select("k.row", "k.slot")
        .distinct()
    )


def bloom_probe(docs: DataFrame) -> DataFrame:
    """Membership audit (the hll/cms pattern): probe the Bloom filter
    with every corpus content key ('member' — must hit, structurally)
    and one derived absent key per document ('absent' — any hit is a
    false positive), emitting (doc_id, kind, hit, false_pos) so the
    report itself measures the FP rate a user would accept before
    trusting the filter as a dedup pre-screen.

    Shape: the bit table BROADCASTS (<= depth x 4096 rows) into one
    left join per depth row — the probe stream never shuffles and
    there is no aggregation: hit = AND over the depth presence
    flags, a pure projection after the broadcasts."""
    from blackedge_ocr_spark.analysis.dedup import content_hash

    # The bit table is consumed once per depth row (two broadcast
    # builds); persist + eager count so the distinct-build shuffle
    # runs once, not once per consumer (the lsh_candidate_pairs
    # staging discipline — concurrent broadcast builds both miss a
    # cold cache).
    bits = bloom_bits(docs).persist()
    bits.count()
    key = content_hash(F.col("text"))
    probes = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit("member").alias("kind"), key.alias("key")),
                F.struct(
                    F.lit("absent").alias("kind"),
                    F.md5(F.concat(key, F.lit(":absent"))).alias("key"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.kind", "p.key")
    out = probes
    flags = []
    for i in range(BLOOM_DEPTH):
        b = bits.filter(F.col("row") == i).select(
            F.col("slot").alias(f"_slot{i}"), F.lit(True).alias(f"_hit{i}")
        )
        out = out.withColumn(
            f"_slot{i}", _bloom_slot(F.col("key"), i)
        ).join(F.broadcast(b), f"_slot{i}", "left")
        flags.append(F.coalesce(F.col(f"_hit{i}"), F.lit(False)))
    hit = flags[0]
    for fcol in flags[1:]:
        hit = hit & fcol
    return out.select(
        "doc_id",
        "kind",
        hit.alias("hit"),
        ((F.col("kind") == "absent") & hit).alias("false_pos"),
    )


# -------------------------------------------------- sampled quantiles

QSAMPLE_SALT = "qs:"   # sample-membership hash salt
QSAMPLE_KEEP = 4       # keep docs whose first salted-md5 hex char is
                       # < this bound → a deterministic 4/16 sample
                       # (contract scale; a 100 TB corpus drops this
                       # to 1/16 or lower — only the literal changes)


def quantile_sample(docs: DataFrame) -> DataFrame:
    """The quantile 'sketch' state: a DETERMINISTIC hash-sample
    of (source, v=ws_tokens, doc_id) rows. Membership is a pure
    predicate on md5(salt || doc_id) — the same doc is sampled in
    every run and every corpus delta, so sample tables merge by plain
    union (the property reservoir sampling lacks) and the state is
    O(n·keep/16), shippable between jobs like the HLL/CMS/Bloom tables."""
    from blackedge_ocr_spark.analysis.textstats import ws_tokens_col

    vals = docs.select(
        "source",
        ws_tokens_col(F.col("text")).alias("v"),
        "doc_id",
    )
    member = (
        F.substring(
            F.md5(
                F.concat(F.lit(QSAMPLE_SALT), F.col("doc_id").cast("string"))
            ),
            1,
            1,
        )
        < F.lit(f"{QSAMPLE_KEEP:x}")
    )
    return vals.filter(member)


def sampled_quantiles(docs: DataFrame) -> DataFrame:
    """Quantile estimation audit (the hll/cms/bloom pattern): per-
    source p50/p90/p99 token-count percentiles from the hash
    sample NEXT TO the exact rank-selection values, long format
    (source, pct, n_docs, n_sample, exact, est, abs_err) — the table
    a user reads before replacing the exact per-source sort with the
    sample at 100 TB (a 16/keep× cut of the ranked-window input; the
    percentile DEFINITION is shared code, textstats.rank_percentiles,
    so the two paths cannot drift). Sources with an empty sample keep
    NULL est/abs_err — the audit exposes coverage gaps instead of
    masking them."""
    from blackedge_ocr_spark.analysis.textstats import (
        PCTS,
        rank_percentiles,
        ws_tokens_col,
    )

    vals = docs.select(
        "source",
        ws_tokens_col(F.col("text")).alias("v"),
        "doc_id",
    )
    exact = rank_percentiles(vals)
    est = rank_percentiles(quantile_sample(docs)).select(
        "source",
        F.col("n_docs").alias("n_sample"),
        *[
            F.col(f"p{int(p * 100)}_tokens").alias(f"e{int(p * 100)}")
            for p in PCTS
        ],
    )
    j = exact.join(est, "source", "left")
    longf = j.select(
        "source",
        "n_docs",
        F.coalesce("n_sample", F.lit(0)).alias("n_sample"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(p * 100)).alias("pct"),
                        F.col(f"p{int(p * 100)}_tokens").alias("exact"),
                        F.col(f"e{int(p * 100)}").alias("est"),
                    )
                    for p in PCTS
                ]
            )
        ).alias("q"),
    )
    err = F.floor(F.abs(F.col("q.est") - F.col("q.exact")) * 1e6 + F.lit(0.5)) / 1e6
    return longf.select(
        "source",
        "n_docs",
        "n_sample",
        "q.pct",
        "q.exact",
        "q.est",
        err.alias("abs_err"),
    )
