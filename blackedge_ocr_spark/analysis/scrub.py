"""Safety/quality curation operators between ingestion and
tokenization in a web-scale training-data pipeline: PII detection and
redaction, Gopher-style repetition statistics, corpus-wide
paragraph-level deduplication, and broadcast domain-blocklist
filtering (CCNet / Gopher / Dolma-style stages, alongside
analysis/corpusops.py).

Everything is Spark built-ins (regexp / array / hash-agg expressions)
except the single Arrow-batched NFC map in ``unicode_scrub`` — the
one step Spark has no built-in for; every constant is shared with the
sqloracle mirrors so the two engines cannot drift.

Regex dialect note: the PII patterns deliberately use only syntax with
identical semantics in Java regex (Spark) and RE2 (DuckDB) — ASCII
classes, bounded quantifiers, ASCII ``\\b``; no backreferences or
lookaround.

Reference analog: none (the reference is a per-document extraction
service, src/workflows/*) — these extend the engine per the brief's
training-data pipeline requirement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blackedge_ocr_spark.analysis.textstats import _r6
from blackedge_ocr_spark.functions.text import tokens

# (name, pattern, replacement). RULES APPLY IN TUPLE ORDER and each
# rule's count is taken AFTER the earlier rules redacted (sequential
# semantics): a span matched by an earlier rule can't be re-counted
# by a later one — e.g. an IP-shaped run inside an email's domain
# ("a@10.1.2.3.com") counts once, as email — so n_pii always equals
# the number of replacements actually performed.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    # (?i): local-parts and hosts are case-preserving in the wild —
    # 'JOHN@EXAMPLE.COM' must not escape redaction (and a mixed-case
    # 'John@…' must not half-match from the second letter). Inline
    # case-folding over ASCII classes is identical in Java and RE2.
    ("email", r"(?i)[a-z0-9][a-z0-9._%+-]*@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4} \d{4} \d{4} \d{4}\b", "<CARD>"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)

# Domain blocklist filter. The demo list is tiny, but the OPERATOR is
# the scale path for real blocklists (10^5–10^7 domains: far too big
# for a literal IN, far too small to shuffle the corpus for) — an
# explicit broadcast LEFT ANTI join keeps the corpus scan in place.
BLOCKED_DOMAINS: tuple[str, ...] = ("spam-mill.biz", "tracker.adnet.io")
# Host = everything after the scheme up to (not including) the first
# path/query/fragment/port/userinfo delimiter or whitespace — no
# trailing slash required ("https://spam-mill.biz" must not fail
# open), port and userinfo stripped, matched on the lowercased URL
# (scheme and host are case-insensitive per RFC 3986).
DOMAIN_RE = r"https?://(?:[^/?#\s@]*@)?([^/?#:\s@]+)"

# Host pool for the staged demo corpus (2 of 5 blocklisted) — shared
# with queries._url_col and sqloracle.url_sql.
URL_HOSTS: tuple[str, ...] = (
    "spam-mill.biz",
    "news.example.org",
    "tracker.adnet.io",
    "blog.example.com",
    "docs.sparkref.dev",
)

LINE_SEP = "\n"  # line/paragraph delimiter for repetition + para dedup

# A line is corpus boilerplate when its exact text occurs in at least
# this many DISTINCT documents (CCNet / RefinedWeb-style navigation /
# footer stripping). Shared with sqloracle.sql_boilerplate_strip.
BOILERPLATE_MIN_DOCS = 3


def _pii_count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_chain(col: Column) -> tuple[list[tuple[str, Column]], Column]:
    """([(rule_name, redactions_performed)], fully_redacted_text) —
    the single source of both operators' outputs. Each rule counts on
    the text AFTER earlier rules redacted, so sum(counts) == number of
    placeholder tokens in the output, even for nested/overlapping
    spans. NULL text is treated as '' (docs never vanish and counts
    never go NULL)."""
    cur = F.coalesce(col, F.lit(""))
    counts = []
    for name, pat, tok in PII_RULES:
        counts.append((name, _pii_count(cur, pat)))
        cur = F.regexp_replace(cur, pat, tok)
    return counts, cur


def redact_col(col: Column) -> Column:
    """Text with every PII match replaced by its placeholder token,
    rules applied in PII_RULES order (single fused projection —
    Catalyst chains the five regexp_replace calls in one codegen
    stage; no shuffle, no Python)."""
    return pii_chain(col)[1]


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-document PII redaction counts by rule + total (sequential
    semantics — see PII_RULES).

    Scale shape: pure per-row regexp projection — whole-stage codegen,
    zero shuffle, embarrassingly parallel. At 100 TB this is a single
    map over the scan with column pruning down to (doc_id, text).
    """
    counts, _ = pii_chain(F.col("text"))
    total = _sum_counts(counts)
    return docs.select(
        "doc_id",
        *[c.cast("long").alias(f"n_{name}") for name, c in counts],
        total.cast("long").alias("n_pii"),
    )


def _sum_counts(counts: list[tuple[str, Column]]) -> Column:
    total = None
    for _, c in counts:
        total = c if total is None else total + c
    return total


def pii_redact(docs: DataFrame) -> DataFrame:
    """Redacted text (as md5 — the driver cannot hash megabyte
    strings usefully) + total replacement count + clean flag. n_pii
    here equals the number of placeholder tokens in the redacted
    text by construction (pii_chain).

    Same zero-shuffle projection shape as pii_scan; the real pipeline
    writes the redacted text column back to the lake instead of
    hashing it.
    """
    counts, red = pii_chain(F.col("text"))
    total = _sum_counts(counts)
    return docs.select(
        "doc_id",
        total.cast("long").alias("n_pii"),
        (total == 0).alias("clean"),
        F.md5(red).alias("redacted_md5"),
    )


def _bigrams(toks: Column) -> Column:
    """Non-distinct consecutive word 2-grams (the repetition signal
    needs multiplicity — analysis/dedup.word_shingles dedupes, so it
    is NOT reusable here)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat(
                F.element_at(toks, i + 1), F.lit(" "), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText-style repetition signals per document over
    newline-delimited text: duplicate-line fraction, fraction of
    line characters inside duplicated lines, and the occurrence share
    of the most frequent word bigram.

    Scale shape: one exploded union frame tagged (kind ∈ line|gram) →
    hash-agg on (doc_id, kind, unit) → hash-agg on doc_id — two
    combinable shuffles keyed by doc_id+unit (never a corpus-wide
    unit key, so a globally hot line cannot skew), no join, no
    window, and no per-row O(units²) higher-order counting (the
    HOF-quadratic class the round-2 bench eliminated). Docs are never
    lost: NULL text coalesces to '' and split('') yields [''], so the
    line branch keeps every row.
    """
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), LINE_SEP, -1)
    line_ex = docs.select(
        "doc_id", F.lit("line").alias("kind"), F.explode(lines).alias("unit")
    )
    gram_ex = docs.select(
        "doc_id",
        F.lit("gram").alias("kind"),
        F.explode(_bigrams(tokens(F.col("text")))).alias("unit"),
    )
    per_unit = (
        line_ex.unionByName(gram_ex)
        .groupBy("doc_id", "kind", "unit")
        .agg(F.count("*").alias("n"))
    )
    is_line = F.col("kind") == "line"
    is_gram = F.col("kind") == "gram"
    dup = F.col("n") >= 2
    chars = F.length("unit")
    agg = per_unit.groupBy("doc_id").agg(
        F.sum(F.when(is_line, F.col("n"))).cast("long").alias("n_lines"),
        F.coalesce(F.sum(F.when(is_line & dup, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("dup_lines"),
        F.coalesce(F.sum(F.when(is_line & dup, F.col("n") * chars)), F.lit(0))
        .cast("long")
        .alias("dup_chars"),
        F.coalesce(F.sum(F.when(is_line, F.col("n") * chars)), F.lit(0))
        .cast("long")
        .alias("tot_chars"),
        F.coalesce(F.sum(F.when(is_gram, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_bigrams"),
        F.coalesce(F.max(F.when(is_gram, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("top_bigram_n"),
    )
    frac = lambda num, den: F.when(
        den > 0, _r6(num.cast("double") / den.cast("double"))
    ).otherwise(F.lit(0.0))
    return agg.select(
        "doc_id",
        "n_lines",
        frac(F.col("dup_lines"), F.col("n_lines")).alias("dup_line_frac"),
        frac(F.col("dup_chars"), F.col("tot_chars")).alias("dup_char_frac"),
        "n_bigrams",
        frac(F.col("top_bigram_n"), F.col("n_bigrams")).alias("top_bigram_frac"),
    )


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (CCNet-style): the
    FIRST occurrence (lowest (doc_id, idx)) of each distinct
    newline-delimited paragraph survives; all later occurrences drop.
    Returns per-doc paragraph counts and the md5 of the doc's
    surviving text (paragraphs re-joined in original order).

    Scale shape: posexplode → min-struct hash-agg on the paragraph
    hash (map-side combinable — a boilerplate paragraph in 10^9 docs
    partial-aggregates per task; a WINDOW over the hash would instead
    sort every copy in one task) → join counts back on hash (AQE
    skew-join splits hot paragraphs) → hash-agg per doc. Docs whose
    every paragraph lost (all first-seen elsewhere) still emit a row
    with n_kept = 0 and md5('') — the conditional agg runs over all
    exploded rows, not just survivors — and NULL text coalesces to ''
    (one empty paragraph) so no doc vanishes.
    """
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), LINE_SEP, -1)
    ex = docs.select("doc_id", F.posexplode(lines).alias("idx", "para")).select(
        "doc_id", "idx", "para", F.md5("para").alias("h")
    )
    keeper = ex.groupBy("h").agg(F.min(F.struct("doc_id", "idx")).alias("k"))
    j = ex.join(keeper, "h")
    kept = (F.col("doc_id") == F.col("k.doc_id")) & (F.col("idx") == F.col("k.idx"))
    return j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"),
        F.sum(kept.cast("int")).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("idx", "para")))
                    ),
                    lambda s: s["para"],
                ),
                LINE_SEP,
            )
        ).alias("kept_md5"),
    )


# Tracking query parameters dropped by url_canonical (the usual
# analytics/click-id set). Alternation-only regex — identical
# semantics in Java regex (Spark) and RE2 (DuckDB).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid)="


def url_canonical(col: Column) -> Column:
    """Canonical form of a URL — the key for URL-level dedup, the
    FIRST dedup stage crawl pipelines run (before any content hash):
    lowercased scheme and host, userinfo stripped (to the LAST '@'),
    scheme-default port stripped (http:80 / https:443 ONLY — an http
    service on :443 keeps it), FQDN trailing dot stripped even when a
    port follows, fragment dropped, tracking params
    (TRACKING_PARAM_RE) removed and the surviving query params
    SORTED, empty path normalized to '/'. Non-URL input (no scheme or
    no host) canonicalizes to '' — the no-key convention, matching
    extract_domain's ''. Non-numeric port-ish suffixes after the
    first ':' of the host are treated as garbage and dropped; IPv6
    bracket hosts are out of scope.

    Built from parts (extract scheme / authority / path+query, then
    rebuild) rather than in-place rewrites, so no lookaround is
    needed — every regex here is in the Java==RE2 common subset like
    the PII rules above. Pure zero-shuffle projection.
    """
    u = F.trim(F.coalesce(col, F.lit("")))
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    auth = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    # userinfo ends at the LAST '@' (greedy ^.*@ — 'u@p@h.io' is
    # userinfo 'u@p', same resource as 'p@h.io'; stripping only to
    # the first '@' would break the canonical fixpoint)
    hp = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    # split name:port BEFORE dot-stripping so 'h.io.:8080' loses its
    # FQDN dot too; anything after the first ':' that is not all
    # digits is garbage, not a port, and drops (IPv6 bracket hosts
    # are out of scope, documented)
    name = F.regexp_replace(
        F.regexp_extract(hp, r"^([^:]*)", 1), r"\.+$", ""
    )
    port = F.regexp_extract(hp, r"^[^:]*:([0-9]+)$", 1)
    # default ports are scheme-specific: only http:80 and https:443
    # are identities; an http service genuinely on :443 keeps it
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    host = F.when(
        (port == "") | default, name
    ).otherwise(F.concat(name, F.lit(":"), port))
    pe = F.regexp_replace(rest, r"^[^/?#]*", "")
    pe = F.regexp_replace(pe, r"#.*$", "")
    path = F.regexp_extract(pe, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pe, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&", -1),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q2 = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when((scheme == "") | (host == ""), F.lit("")).otherwise(canon)


def url_dedup(docs: DataFrame) -> DataFrame:
    """URL-level first-wins dedup over (doc_id, url): per doc the
    canonical URL and whether this doc is the lowest-id holder of it.
    Scale shape: canonical key is a per-row projection on the scan;
    keeper = min hash-agg on the key (map-side combinable — a
    mirrored URL in 10^9 docs partial-aggregates per task), AQE
    skew-join back. Same discipline as paragraph_dedup; no window
    over hot URLs. Docs WITHOUT a parseable URL (canon '') are
    unconditional keepers — '' is the no-key convention, not a real
    shared URL, and no-URL docs must never dedup against each other."""
    staged = docs.select(
        "doc_id", url_canonical(F.col("url")).alias("canon")
    )
    keeper = staged.groupBy("canon").agg(
        F.min("doc_id").alias("_keep_id")
    )
    return (
        staged.join(keeper, "canon")
        .select(
            "doc_id",
            "canon",
            (
                (F.col("canon") == "")
                | (F.col("doc_id") == F.col("_keep_id"))
            ).alias("is_keeper"),
        )
    )


def boilerplate_strip(docs: DataFrame) -> DataFrame:
    """Corpus-frequency boilerplate line removal (the CCNet /
    RefinedWeb navigation-and-footer stage): a line whose exact text
    appears in >= BOILERPLATE_MIN_DOCS DISTINCT documents is
    boilerplate, and ALL of its occurrences drop — everywhere.
    Complementary to ``paragraph_dedup``, which keeps the first copy
    of every paragraph: dedup preserves one "subscribe to our
    newsletter" for the corpus, boilerplate-strip removes the phrase
    from the corpus entirely. Returns per-doc
    (n_lines, n_kept, kept_md5) with the surviving text re-joined in
    original order.

    Scale shape: posexplode -> two combinable hash aggs for the
    distinct-doc line frequency ((h, doc_id) dedup partial-aggregates
    map-side, so a footer in 10^9 docs collapses per task before the
    exchange) -> the SMALL filtered boilerplate set joins back on h
    (it is the high-DF tail only, orders of magnitude under the
    distinct-line count — broadcastable in practice; AQE handles the
    general case and skew-splits hot hashes) -> one per-doc hash agg
    reassembles. No window over the line hash: a window would sort
    every copy of a hot footer in one task.

    Reference analog: none (per-doc service) — extends the engine per
    the training-data-pipeline brief, alongside paragraph_dedup.
    """
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), LINE_SEP, -1)
    ex = docs.select(
        "doc_id", F.posexplode(lines).alias("idx", "line")
    ).select("doc_id", "idx", "line", F.md5("line").alias("h"))
    # distinct-doc frequency per line md5 (text equality and md5
    # equality coincide, as in paragraph_dedup)
    hot = (
        ex.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= BOILERPLATE_MIN_DOCS)
        .select("h", F.lit(True).alias("_bp"))
    )
    j = ex.join(hot, "h", "left")
    kept = F.col("_bp").isNull()
    return j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(kept.cast("int")).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("idx", "line")))
                    ),
                    lambda s: s["line"],
                ),
                LINE_SEP,
            )
        ).alias("kept_md5"),
    )


def extract_domain(col: Column) -> Column:
    """Host part of the first URL in a text/url column ('' if none —
    NULL urls included). Matched on the lowercased text; tolerates
    missing path ("https://host"), ports and userinfo (stripped), and
    uppercase schemes/hosts — a blocked domain must never slip
    through on URL shape alone."""
    host = F.regexp_extract(
        F.lower(F.coalesce(col, F.lit(""))), DOMAIN_RE, 1
    )
    # strip the FQDN trailing dot: 'https://spam-mill.biz./p' resolves
    # to the same host as 'spam-mill.biz' and must not dodge the
    # blocklist (RE2 has no lookahead, so post-strip instead of
    # excluding it in the host class)
    return F.regexp_replace(host, r"\.+$", "")


def domain_filter(docs: DataFrame) -> DataFrame:
    """Blocklist filter: survivors of a broadcast LEFT ANTI join of
    extracted domains against BLOCKED_DOMAINS.

    Scale shape: the blocklist broadcasts (BroadcastHashJoin LeftAnti
    — asserted in tests/test_scrub.py::
    test_domain_filter_broadcast_anti_join); the corpus never shuffles
    and the filter fuses into the scan's codegen stage. Input
    contract: (doc_id, url) — the real pipeline points this at the
    crawl metadata column.
    """
    staged = docs.select(
        "doc_id", extract_domain(F.col("url")).alias("domain")
    )
    bl = docs.sparkSession.createDataFrame(
        [(d,) for d in BLOCKED_DOMAINS], "domain string"
    )
    return staged.join(F.broadcast(bl), "domain", "left_anti").select(
        "doc_id", "domain"
    )


def domain_stats(docs: DataFrame) -> DataFrame:
    """Host-reputation table over (url, text) documents: per-domain
    doc count, mean quality and blocklist membership — the per-host
    keep/drop signal web-curation pipelines build before sampling
    (CCNet/RefinedWeb-style host statistics; public methods).

    Determinism note: a double mean is summation-order-dependent, so
    the quality aggregate sums EXACT micro-units instead — q6 is a
    multiple of 1e-6 by construction, floor(q6*1e6+0.5) recovers the
    integer exactly, and a long sum is order-free — then divides
    once. Shape: one combinable agg on domain (hot hosts partial-
    aggregate map-side); the blocked flag is a per-row literal-array
    membership, no join.
    """
    from blackedge_ocr_spark.analysis.textstats import _r6, quality_col

    qi = F.floor(quality_col(F.col("text")) * 1e6 + F.lit(0.5)).cast(
        "long"
    )
    staged = docs.select(
        extract_domain(F.col("url")).alias("domain"), qi.alias("qi")
    )
    return (
        staged.groupBy("domain")
        .agg(F.count("*").alias("n_docs"), F.sum("qi").alias("sq"))
        .select(
            "domain",
            "n_docs",
            _r6(
                F.col("sq").cast("double")
                / (F.col("n_docs").cast("double") * 1e6)
            ).alias("mean_quality"),
            F.col("domain").isin(*BLOCKED_DOMAINS).alias("blocked"),
        )
    )


# --- exact substring-duplication (Lee et al. 2022 style) --------------

# Token width of the duplicate-detection grams. Lee et al. use a
# 50-token threshold on real corpora; 8 keeps the synthetic testdata's
# natural + injected duplicate runs detectable.
SUB_GRAM_K = 8
# Injected "quoting" stratum: every QUOTE_EVERY-th doc gets a synthetic
# citing document that reproduces QUOTE_WIDTH of its tokens verbatim
# (from 1-based token QUOTE_START) behind a unique preamble — the
# deterministic cross-document duplicated substring the detector must
# find. Offset disjoint from dedup.DUP_ID_OFFSET's stratum.
QUOTE_ID_OFFSET = 2 * 10**12
QUOTE_EVERY = 10
QUOTE_START = 6
QUOTE_WIDTH = 19


def with_quote_injection(docs: DataFrame, every: int = QUOTE_EVERY) -> DataFrame:
    """Corpus + synthetic quoting docs (see QUOTE_* above). The quote
    is built from the NORMALIZED token stream, so re-tokenizing the
    injected doc reproduces the source's token slice exactly."""
    toks = tokens(F.col("text"))
    quote = F.concat_ws(
        " ", F.slice(toks, QUOTE_START, QUOTE_WIDTH)
    )
    q = docs.filter(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") + F.lit(QUOTE_ID_OFFSET)).alias("doc_id"),
        F.concat(F.lit("quoted passage follows "), quote).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(q)


def substring_dedup(docs: DataFrame, k: int = SUB_GRAM_K) -> DataFrame:
    """Exact substring-duplication removal — the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" stage:
    any k-token run whose exact text occurs MORE THAN ONCE anywhere in
    the corpus (another doc or the same doc) marks its k positions
    duplicated; overlapping marks merge into maximal runs, and the doc
    keeps only tokens outside every run. Returns per-doc
    (n_tokens, dup_tokens, dup_frac, n_runs, kept_md5) where kept_md5
    fingerprints the deduplicated text in original token order.

    This is the suffix-array stage of the paper re-expressed in
    relational form: fixed-k gram occurrence counting is exactly the
    k-prefix bucketing of the suffix array, and the interval union
    reproduces its maximal-match coalescing for matches >= k.

    Shape at scale: posexplode gram starts -> combinable hash agg on
    the gram hash (map-side combine absorbs hot grams) -> the ids-only
    duplicate set joins BACK on the hash (inner, AQE skew-split; only
    (doc_id, position) pairs shuffle — never gram text) -> per-doc
    collect of DUPLICATE positions only (rare at real dup rates) ->
    the interval fold and token filtering run in-array, zero further
    shuffle. The corpus token arrays are scanned twice (gram pass +
    reassembly join) — at 100 TB the staged-candidates discipline
    (analysis/dedup.py) applies: persist/write the exploded gram table
    once if the lineage recompute dominates.

    Reference analog: none (per-doc service) — extends the engine per
    the training-data-pipeline brief.
    """
    corpus = with_quote_injection(docs)
    t = corpus.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    starts = F.when(
        n >= k, F.sequence(F.lit(1), n - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    # Staged once (the dup_ngrams / LSH candidate discipline): the
    # gram table feeds BOTH the count agg and the join-back — without
    # the persist each side re-runs tokenize+slice+md5 over the
    # corpus. MEMORY_AND_DISK + LRU-evictable; at 100 TB this becomes
    # a scratch-table write.
    ex = (
        t.select("doc_id", "toks", F.explode(starts).alias("p"))
        .select(
            "doc_id",
            "p",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("toks"), F.col("p"), k))
            ).alias("g"),
        )
        .persist()
    )
    dup = (
        ex.groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("g")
    )
    perdoc = (
        ex.join(dup, "g")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("p")).alias("ps"))
    )
    j = t.join(perdoc, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(F.col("ps"), F.array().cast("array<int>")).alias("ps"),
    )
    iv_t = "array<struct<s:int,e:int>>"
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    ivs = F.aggregate(
        F.col("ps"),
        F.array().cast(iv_t),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= last(acc)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["s"].alias("s"),
                        F.greatest(last(acc)["e"], p + k).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(p.alias("s"), (p + k).alias("e"))
                ),
            )
        ),
    )
    staged = j.select("doc_id", "toks", ivs.alias("ivs"))
    # Surviving tokens = the GAP SEGMENTS between merged runs, sliced
    # out directly — O(n_tokens + n_runs) per row. (A per-position
    # exists() mask would be O(n_tokens * n_runs): the word_frequency
    # per-row-quadratic class, pathological on a long doc with many
    # short duplicated runs.) Gap i spans [prev_end, next_start):
    # before the first run prev_end=1, after the last next_start=n+1.
    n_ivs = F.size("ivs")
    n_all = F.size("toks")

    def _gap(i):
        lo = F.when(i == 0, F.lit(1)).otherwise(
            F.element_at(F.col("ivs"), i)["e"]
        )
        hi = F.when(
            i == n_ivs, n_all + 1
        ).otherwise(F.element_at(F.col("ivs"), i + 1)["s"])
        return F.when(
            hi > lo, F.slice(F.col("toks"), lo, hi - lo)
        ).otherwise(F.array().cast("array<string>"))

    kept = F.flatten(
        F.transform(F.sequence(F.lit(0), n_ivs), _gap)
    )
    out = staged.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("dup_tokens"),
        F.size("ivs").cast("long").alias("n_runs"),
        F.md5(F.concat_ws(" ", kept)).alias("kept_md5"),
    )
    frac = F.when(
        F.col("n_tokens") > 0,
        F.col("dup_tokens").cast("double") / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_tokens",
        "dup_tokens",
        _r6(frac).alias("dup_frac"),
        "n_runs",
        "kept_md5",
    )


# --------------------------------------------------------------- C4

# C4 cleaning heuristics (Raffel et al. 2020, §2.2 — public method).
# Line rule: keep a line only if it ends in a terminal punctuation
# mark (period / exclamation / question mark / closing quote), has at
# least C4_MIN_LINE_WORDS words, and does not mention "javascript".
# Page rules: drop pages with fewer than C4_MIN_SENTENCES sentences
# (counted AFTER line filtering), containing "lorem ipsum", a curly
# brace, or a blocklisted word. The demo badword list is two stand-in
# tokens; the real pipeline swaps in the published blocklist — the
# OPERATOR (word-bound alternation regex, one pass) is the scale
# path either way.
C4_TERMINAL_RE = "[.!?\"']$"
C4_MIN_LINE_WORDS = 3
C4_MIN_SENTENCES = 5
C4_BADWORDS: tuple[str, ...] = ("badword1", "badword2")
C4_BADWORD_RE = r"(?i)\b(" + "|".join(C4_BADWORDS) + r")\b"
# Sentence = a maximal run up to (and including) terminal punctuation,
# plus an unterminated trailing fragment. Alternation + classes only —
# identical semantics in Java regex (Spark) and RE2 (DuckDB); neither
# lookbehind (absent in RE2) nor \b is needed.
SENT_RE = r"[^.!?]+[.!?]+|[^.!?]+$"
SPAN_SEP = "\x1f"  # unit separator between a span's three sentences
# Keeper packing: doc_id * SHIFT + pos is order-preserving for
# sentence positions under the shift (2^21 ≈ 2.1M sentences/doc —
# far above any real page), and doc ids reach DUP_ID_OFFSET (1e12)
# + n, so the packed key stays under 2.2e18 < int64 max. A packed
# min plans as HashAggregate; min(struct) would force SortAggregate.
SPAN_POS_SHIFT = 1 << 21


def sentence_array(col: Column) -> Column:
    """Trimmed non-empty sentences of a text column (SENT_RE runs).
    Pure zero-shuffle projection; NULL text yields []."""
    runs = F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(SENT_RE), 0)
    # explicit lambda: bare F.trim would bind as a TWO-arg (element,
    # index) lambda via trim's optional second parameter and trim
    # nothing
    return F.filter(
        F.transform(runs, lambda s: F.trim(s)), lambda s: s != ""
    )


def c4_filters(docs: DataFrame) -> DataFrame:
    """Per-document C4 cleaning verdict: line-filter counts, the
    surviving text's md5, the page-level flags, and the composed
    c4_keep decision.

    Sentence counting runs on the KEPT text (C4 counts sentences
    after its line filter); the lorem/brace/badword flags inspect the
    ORIGINAL page, as the paper drops such pages outright.

    Shape at scale: pure built-ins, one fused projection over the
    scan, zero shuffle, zero Python, no join — same first-pass-gate
    discipline as gopher_rules (tests/test_plans.py pins it).
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    lines = F.split(text, LINE_SEP, -1)
    trimmed = F.transform(lines, lambda ln: F.trim(ln))

    def _line_keep(ln: Column) -> Column:
        n_words = F.size(F.filter(F.split(ln, r"\s+"), lambda w: w != ""))
        return (
            ln.rlike(C4_TERMINAL_RE)
            & (n_words >= C4_MIN_LINE_WORDS)
            & ~F.contains(F.lower(ln), F.lit("javascript"))
        )

    kept_lines = F.filter(trimmed, _line_keep)
    kept_text = F.array_join(kept_lines, LINE_SEP)
    n_sents = F.size(sentence_array(kept_text)).cast("long")
    lower = F.lower(text)
    has_lorem = F.contains(lower, F.lit("lorem ipsum"))
    has_brace = F.contains(text, F.lit("{"))
    has_badword = text.rlike(C4_BADWORD_RE)
    keep = (
        (n_sents >= C4_MIN_SENTENCES)
        & ~has_lorem
        & ~has_brace
        & ~has_badword
    )
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_kept_lines"),
        n_sents.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_badword.alias("has_badword"),
        F.md5(kept_text).alias("kept_md5"),
        keep.alias("c4_keep"),
    )


def c4_span_dedup(docs: DataFrame) -> DataFrame:
    """C4's global three-sentence-span dedup (Raffel et al. 2020,
    §2.2: "we discarded all but one of any three-sentence span
    occurring more than once"): every sliding window of three
    consecutive sentences is hashed; the corpus-wide FIRST occurrence
    (lowest (doc_id, pos)) of each span survives, and every later
    occurrence deletes its three sentences from its document. Returns
    per-doc (n_sents, n_kept, kept_md5) with survivors re-joined by a
    single space in original order.

    A span repeated WITHIN one document loses its later occurrence
    too, and a sentence covered by both a winning and a losing span
    is deleted — "all but one occurrence of the span" takes
    precedence over the win (the TFDS c4_utils reading).

    Scale shape: spans are built IN-ARRAY from the sentence list
    (sequence + transform — no per-doc window, no lead()); the keeper
    is a PACKED-LONG min hash-agg on the span hash (doc_id *
    SPAN_POS_SHIFT + pos — order-preserving for pos <
    SPAN_POS_SHIFT, so numeric min == lexicographic (doc_id, pos)
    min; a min(struct) would plan as SortAggregate and sort every
    copy of a hot span), map-side combinable — a boilerplate span in
    10^9 docs partial-aggregates per task; the join back is
    AQE-skew-splittable; deletions distinct on (doc_id, pos) then
    hash-joined to the sentence stream; one final per-doc hash-agg.
    A WINDOW over the span hash would instead sort every copy of a
    hot span in one task. The sentence frame is staged once
    (persist): it feeds both the span stream and the final
    reassembly.
    """
    sents = sentence_array(F.col("text"))
    staged = docs.select("doc_id", sents.alias("sents")).persist()
    n = F.size("sents")
    span_pos = F.when(n >= 3, F.sequence(F.lit(0), n - 3)).otherwise(
        F.array().cast("array<int>")
    )
    spans = F.transform(
        span_pos,
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(
                F.concat_ws(
                    SPAN_SEP,
                    F.element_at(F.col("sents"), i + 1),
                    F.element_at(F.col("sents"), i + 2),
                    F.element_at(F.col("sents"), i + 3),
                )
            ).alias("h"),
        ),
    )
    span_ex = (
        staged.select("doc_id", F.explode(spans).alias("s"))
        .select(
            "doc_id",
            F.col("s.pos").alias("pos"),
            F.col("s.h").alias("h"),
        )
        .withColumn(
            "pk",
            F.col("doc_id") * F.lit(SPAN_POS_SHIFT)
            + F.col("pos").cast("long"),
        )
    )
    keeper = span_ex.groupBy("h").agg(F.min("pk").alias("kmin"))
    lose = span_ex.join(keeper, "h").filter(F.col("pk") != F.col("kmin"))
    dels = (
        lose.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 2)).alias(
                "pos"
            ),
        )
        .distinct()
        .withColumn("_del", F.lit(True))
    )
    sent_ex = staged.select(
        "doc_id", F.posexplode_outer("sents").alias("pos", "sent")
    )
    j = sent_ex.join(dels, ["doc_id", "pos"], "left")
    kept = F.col("pos").isNotNull() & F.col("_del").isNull()
    return j.groupBy("doc_id").agg(
        F.count("pos").cast("long").alias("n_sents"),
        F.coalesce(F.sum(kept.cast("int")), F.lit(0))
        .cast("long")
        .alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("pos", "sent")))
                    ),
                    lambda s: s["sent"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )


# ------------------------------------------------------- unicode

# ftfy-lite unicode hygiene (the stage every public pipeline runs
# before tokenization — CCNet, Dolma, and FineWeb all NFC/strip).
# Three accounting classes, counted BEFORE stripping:
#   ctrl — C0 controls except \t \n \r, plus DEL: decoder garbage.
#   zw   — zero-width space / word joiner / BOM-as-ZWNBSP: invisible
#          characters that split tokens without splitting rendering
#          (ZWNJ/ZWJ are NOT stripped — they are orthographic in
#          Persian/Indic text and count as word chars, see WORDRUN).
#   repl — U+FFFD, the footprint of an upstream mojibake decode.
# `\x{...}` escapes parse identically in Java regex and RE2.
CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
ZW_RE = r"[\x{200B}\x{2060}\x{FEFF}]"
REPL_RE = r"\x{FFFD}"
UNICODE_STRIP_RE = (
    r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}\x{2060}\x{FEFF}\x{FFFD}]"
)


def nfc_col(col: Column) -> Column:
    """Canonical NFC composition of a string column.

    Spark exposes NO normalization built-in, so this is the one
    genuinely-Python step of the scrub — Arrow-batched (never
    per-row), a pure map over each batch, zero shuffle. Parity:
    Python unicodedata and DuckDB's utf8proc both implement the
    Unicode canonical-composition algorithm; the cross-engine pytest
    pins composition, singleton mapping (U+2126→U+03A9), and
    combining-mark reordering bit-for-bit.
    """
    return _nfc_udf(col)


@F.pandas_udf(T.StringType())
def _nfc_udf(s: "pd.Series") -> "pd.Series":
    import unicodedata

    return s.map(
        lambda x: None if x is None else unicodedata.normalize("NFC", x)
    )


def unicode_scrub(docs: DataFrame) -> DataFrame:
    """Per-document unicode hygiene: count the three garbage classes,
    strip them, NFC-compose the survivor, and report whether anything
    changed plus the cleaned text's md5/length.

    Shape at scale: one fused projection (the class counts and the
    strip are JVM regexes over the scan) feeding ONE ArrowEvalPython
    stage (the NFC map) — zero shuffle, zero join; the cheapest
    possible hygiene pass and the only Python in it is the step Spark
    cannot express (tests/test_plans.py pins exactly one Arrow stage,
    zero exchanges).
    """
    text = F.coalesce(F.col("text"), F.lit(""))

    def _n(pat: str) -> Column:
        return (
            F.length(text) - F.length(F.regexp_replace(text, pat, ""))
        ).cast("long")

    stripped = F.regexp_replace(text, UNICODE_STRIP_RE, "")
    cleaned = nfc_col(stripped)
    return docs.select(
        "doc_id",
        _n(CTRL_RE).alias("n_ctrl"),
        _n(ZW_RE).alias("n_zw"),
        _n(REPL_RE).alias("n_repl"),
        (cleaned != text).alias("changed"),
        F.length(cleaned).cast("long").alias("n_chars"),
        F.md5(cleaned).alias("clean_md5"),
    )
