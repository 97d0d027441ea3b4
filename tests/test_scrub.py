"""Semantics tests for analysis/scrub.py on crafted corpora (the
Spark-vs-DuckDB value parity is covered by the driver contract; these
pin the intended MEANING of each operator) + plan-shape assertions
for the blocklist broadcast and the no-window paragraph dedup."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from blackedge_ocr_spark import plans
from blackedge_ocr_spark.analysis import scrub


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows],
        "doc_id long, text string",
    )


PII_SAMPLE = (
    "mail user42@example.com ip 10.23.7.8 call (415) 555-1234 "
    "ssn 219-09-0042 card 4111 1111 1111 0042 end x999.1.2.3y"
)


def test_pii_scan_counts_each_rule_once(spark):
    d = _docs_df(spark, [(0, PII_SAMPLE), (1, "nothing to see"), (2, "")])
    out = {r["doc_id"]: r for r in scrub.pii_scan(d).collect()}
    r0 = out[0]
    assert (
        r0["n_email"], r0["n_ssn"], r0["n_card"], r0["n_phone"], r0["n_ip"]
    ) == (1, 1, 1, 1, 1)
    assert r0["n_pii"] == 5
    # x999.1.2.3y has no word boundary around the digit run -> not an IP
    assert out[1]["n_pii"] == 0 and out[2]["n_pii"] == 0


def test_pii_redact_replaces_all_and_flags_clean(spark):
    d = _docs_df(spark, [(0, PII_SAMPLE), (1, "clean text")])
    out = {r["doc_id"]: r for r in scrub.pii_redact(d).collect()}
    expected = (
        "mail <EMAIL> ip <IP> call <PHONE> ssn <SSN> card <CARD> "
        "end x999.1.2.3y"
    )
    assert out[0]["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()
    assert out[0]["clean"] is False and out[0]["n_pii"] == 5
    assert out[1]["clean"] is True
    assert (
        out[1]["redacted_md5"]
        == hashlib.md5(b"clean text").hexdigest()
    )


def test_pii_scan_counts_multiple_matches(spark):
    d = _docs_df(spark, [(0, "a@b.co then c@d.org and 1.2.3.4 5.6.7.8")])
    r = scrub.pii_scan(d).collect()[0]
    assert r["n_email"] == 2 and r["n_ip"] == 2 and r["n_pii"] == 4


def test_repetition_stats_dup_lines_and_top_bigram(spark):
    # doc 0: 4 lines, "same line" twice (9 chars each). Bigrams run
    # over the WHOLE doc token stream (normalize folds newlines to
    # spaces): 10 tokens -> 9 bigrams; "same line" / "a b" / "b a"
    # each occur twice -> top share 2/9.
    d = _docs_df(
        spark,
        [
            (0, "same line\nother\nsame line\na b a b a"),
            (1, "unique"),  # 1 line, 0 bigrams
        ],
    )
    out = {r["doc_id"]: r for r in scrub.repetition_stats(d).collect()}
    r0 = out[0]
    assert r0["n_lines"] == 4
    assert r0["dup_line_frac"] == 0.5  # 2 of 4 lines duplicated
    # duplicated chars = 2*9; total = 2*9 + 5 + 9
    assert r0["dup_char_frac"] == round(18 / 32 * 1e6) / 1e6
    assert r0["n_bigrams"] == 9
    assert r0["top_bigram_frac"] == 0.222222  # floor(2/9*1e6+0.5)/1e6
    r1 = out[1]
    assert r1["n_lines"] == 1 and r1["dup_line_frac"] == 0.0
    assert r1["n_bigrams"] == 0 and r1["top_bigram_frac"] == 0.0


def test_repetition_stats_empty_doc_survives(spark):
    d = _docs_df(spark, [(0, "")])
    r = scrub.repetition_stats(d).collect()[0]
    assert r["n_lines"] == 1 and r["dup_char_frac"] == 0.0


def test_paragraph_dedup_first_wins_corpus_wide(spark):
    # "shared" first occurs in doc 0 (idx 1); doc 1's copy drops, its
    # own paragraph survives; doc 2 is ALL duplicates -> n_kept 0.
    d = _docs_df(
        spark,
        [
            (0, "alpha\nshared"),
            (1, "shared\nbeta"),
            (2, "shared\nalpha"),
        ],
    )
    out = {r["doc_id"]: r for r in scrub.paragraph_dedup(d).collect()}
    assert out[0]["n_paras"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["kept_md5"] == hashlib.md5(b"alpha\nshared").hexdigest()
    assert out[1]["n_kept"] == 1
    assert out[1]["kept_md5"] == hashlib.md5(b"beta").hexdigest()
    assert out[2]["n_kept"] == 0
    assert out[2]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_paragraph_dedup_within_doc_repeat_drops(spark):
    d = _docs_df(spark, [(0, "x\nx\ny")])
    r = scrub.paragraph_dedup(d).collect()[0]
    assert r["n_paras"] == 3 and r["n_kept"] == 2
    assert r["kept_md5"] == hashlib.md5(b"x\ny").hexdigest()


def test_boilerplate_strip_drops_every_copy(spark):
    # "footer" appears in 3 distinct docs (>= BOILERPLATE_MIN_DOCS):
    # ALL copies drop, including the first — the contrast with
    # paragraph_dedup, which keeps one. "twice" is in only 2 docs and
    # survives everywhere.
    d = _docs_df(
        spark,
        [
            (0, "alpha\nfooter\ntwice"),
            (1, "footer\nbeta"),
            (2, "footer\ntwice"),
        ],
    )
    out = {r["doc_id"]: r for r in scrub.boilerplate_strip(d).collect()}
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["kept_md5"] == hashlib.md5(b"alpha\ntwice").hexdigest()
    assert out[1]["n_kept"] == 1
    assert out[1]["kept_md5"] == hashlib.md5(b"beta").hexdigest()
    assert out[2]["n_kept"] == 1
    assert out[2]["kept_md5"] == hashlib.md5(b"twice").hexdigest()


def test_boilerplate_strip_counts_distinct_docs_not_copies(spark):
    # A line repeated 5x inside ONE doc is df=1 — not boilerplate;
    # a doc that is ALL boilerplate keeps nothing but never vanishes.
    d = _docs_df(
        spark,
        [
            (0, "x\nx\nx\nx\nx"),
            (1, "nav\nown1"),
            (2, "nav\nown2"),
            (3, "nav"),
        ],
    )
    out = {r["doc_id"]: r for r in scrub.boilerplate_strip(d).collect()}
    assert out[0]["n_lines"] == 5 and out[0]["n_kept"] == 5
    assert out[1]["n_kept"] == 1 and out[2]["n_kept"] == 1
    assert out[3]["n_lines"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_curation_funnel_monotone_stages(spark):
    from blackedge_ocr_spark.queries import q_curation_funnel

    rows = {
        r["stage"]: r["n_docs"]
        for r in q_curation_funnel(spark, "/root/testdata/sf0.001").collect()
    }
    order = [
        "ingested", "exact_dedup", "lang_en", "quality", "clean", "pii_free",
    ]
    assert set(rows) == set(order)
    ns = [rows[s] for s in order]
    assert ns == sorted(ns, reverse=True), ns
    # dup injection guarantees the dedup gate really drops copies
    assert ns[0] > ns[1] > 0


def test_domain_filter_broadcast_anti_join(spark):
    rows = [
        Row(doc_id=0, url="https://spam-mill.biz/p/0"),
        Row(doc_id=1, url="https://news.example.org/p/1"),
        Row(doc_id=2, url="http://tracker.adnet.io/x?q=2"),
        Row(doc_id=3, url="no url here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, url string")
    out = scrub.domain_filter(d)
    got = {r["doc_id"]: r["domain"] for r in out.collect()}
    # blocked hosts drop; the no-URL doc survives with domain ''
    assert got == {1: "news.example.org", 3: ""}
    plan = plans.formatted_plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the corpus side never shuffles: the only exchange feeds the
    # broadcast, so no shuffle exchange at all
    assert plans.count_exchanges(out) == 0, plan


def test_paragraph_dedup_plan_has_no_window(spark):
    """The first-wins keeper must be a combinable min-struct hash-agg,
    never a window over the paragraph-hash partition (a hot
    boilerplate paragraph would sort all its copies in one task)."""
    d = _docs_df(spark, [(0, "a\nb"), (1, "b\nc")])
    plan = plans.formatted_plan(scrub.paragraph_dedup(d))
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "HashAggregate" in plan, plan


def test_repetition_stats_plan_two_aggs_no_join(spark):
    d = _docs_df(spark, [(0, "a\nb")])
    plan = plans.formatted_plan(scrub.repetition_stats(d))
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_pii_nested_span_counts_once(spark):
    # an IP-shaped run inside an email's domain is consumed by the
    # email rule; sequential counting must not double-count it, and
    # n_pii must equal the placeholder tokens actually emitted
    d = _docs_df(spark, [(0, "mail a@10.1.2.3.com ok")])
    scan = scrub.pii_scan(d).collect()[0]
    assert scan["n_email"] == 1 and scan["n_ip"] == 0
    assert scan["n_pii"] == 1
    red = scrub.pii_redact(d).collect()[0]
    assert red["n_pii"] == 1
    assert red["redacted_md5"] == hashlib.md5(b"mail <EMAIL> ok").hexdigest()


def test_null_text_docs_never_vanish(spark):
    from pyspark.sql import Row

    d = spark.createDataFrame(
        [Row(doc_id=0, text=None), Row(doc_id=1, text="x\nx")],
        "doc_id long, text string",
    )
    scan = {r["doc_id"]: r for r in scrub.pii_scan(d).collect()}
    assert scan[0]["n_pii"] == 0  # not NULL
    rep = {r["doc_id"]: r for r in scrub.repetition_stats(d).collect()}
    assert rep[0]["n_lines"] == 1 and rep[0]["dup_line_frac"] == 0.0
    para = {r["doc_id"]: r for r in scrub.paragraph_dedup(d).collect()}
    assert para[0]["n_paras"] == 1
    assert set(para) == {0, 1}


def test_extract_domain_tolerates_url_shapes(spark):
    from pyspark.sql import Row

    cases = [
        (0, "https://spam-mill.biz"),          # no path
        (1, "HTTPS://SPAM-MILL.BIZ/x"),        # uppercase
        (2, "https://spam-mill.biz:8443/p"),   # port
        (3, "https://u:p@spam-mill.biz/p"),    # userinfo
        (4, None),                             # null url
    ]
    d = spark.createDataFrame(
        [Row(doc_id=i, url=u) for i, u in cases],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["d"]
        for r in d.select(
            "doc_id", scrub.extract_domain(F.col("url")).alias("d")
        ).collect()
    }
    assert got == {
        0: "spam-mill.biz",
        1: "spam-mill.biz",
        2: "spam-mill.biz",
        3: "spam-mill.biz",
        4: "",
    }
    # and the filter actually blocks every one of those shapes
    survivors = scrub.domain_filter(d).collect()
    assert [r["doc_id"] for r in survivors] == [4]


def test_pii_email_case_insensitive(spark):
    rows = [
        Row(doc_id=0, text="Contact JOHN@EXAMPLE.COM today"),
        Row(doc_id=1, text="mail MiXed@Ex.Co please"),
        Row(doc_id=2, text="lower a1@ex.co fine"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_email"] for r in scrub.pii_scan(d).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
    red = {
        r["doc_id"]: r["r"]
        for r in d.select(
            "doc_id", scrub.redact_col(F.col("text")).alias("r")
        ).collect()
    }
    # the WHOLE address is replaced, not a half-match from the
    # second letter
    assert red[0] == "Contact <EMAIL> today"
    assert red[1] == "mail <EMAIL> please"


def test_domain_filter_strips_fqdn_trailing_dot(spark):
    rows = [
        Row(doc_id=0, url="https://spam-mill.biz./p/1"),
        Row(doc_id=1, url="https://news.example.org./p/2"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, url string")
    doms = {
        r["doc_id"]: r["d"]
        for r in d.select(
            "doc_id", scrub.extract_domain(F.col("url")).alias("d")
        ).collect()
    }
    assert doms == {0: "spam-mill.biz", 1: "news.example.org"}
    # the FQDN form of a blocked host is still blocked
    survivors = scrub.domain_filter(d).collect()
    assert [r["doc_id"] for r in survivors] == [1]


def test_domain_stats_exact_micro_unit_mean(spark):
    rows = [
        Row(url="https://spam-mill.biz/p/1",
            text="the quick brown fox and the dog in a yard today"),
        Row(url="https://spam-mill.biz/p/2", text=""),
        Row(url="https://news.example.org/p/3",
            text="the of to is in and a the of to"),
    ]
    d = spark.createDataFrame(rows, "url string, text string")
    from blackedge_ocr_spark.analysis.textstats import quality_col
    import math

    q = [r["q"] for r in d.select(quality_col(F.col("text")).alias("q")).collect()]
    got = {r["domain"]: r for r in scrub.domain_stats(d).collect()}
    assert got["spam-mill.biz"]["n_docs"] == 2
    assert got["spam-mill.biz"]["blocked"] is True
    assert got["news.example.org"]["blocked"] is False
    # mean is the exact micro-unit sum, not a float accumulation
    want = (
        math.floor(
            (math.floor(q[0] * 1e6 + 0.5) + math.floor(q[1] * 1e6 + 0.5))
            / (2 * 1e6) * 1e6 + 0.5
        ) / 1e6
    )
    assert got["spam-mill.biz"]["mean_quality"] == want


def test_url_canonical_normalizations(spark):
    cases = [
        # (input, canonical)
        ("https://Example.COM/p/1", "https://example.com/p/1"),
        ("HTTPS://HOST.ORG/p/1#frag", "https://host.org/p/1"),
        ("https://user:pw@host.org:443/p/1", "https://host.org/p/1"),
        ("http://host.org:80/a", "http://host.org/a"),
        ("https://host.org./p/1", "https://host.org/p/1"),
        ("https://host.org", "https://host.org/"),
        ("https://h.io/p?b=2&a=1", "https://h.io/p?a=1&b=2"),
        ("https://h.io/p?utm_source=x&a=1&fbclid=y", "https://h.io/p?a=1"),
        ("https://h.io/p?utm_source=x", "https://h.io/p"),
        ("no url here", ""),
        ("", ""),
        (None, ""),
        # non-default port and uncommon params survive
        ("https://h.io:8443/p?z=1", "https://h.io:8443/p?z=1"),
        # default ports are scheme-specific: http on :443 (and https
        # on :80) are REAL ports and survive
        ("http://h.io:443/x", "http://h.io:443/x"),
        ("https://h.io:80/x", "https://h.io:80/x"),
        # userinfo strips to the LAST '@' (fixpoint property)
        ("https://u@p@h.io/x", "https://h.io/x"),
        # FQDN dot strips even when a port follows
        ("https://h.io.:8080/x", "https://h.io:8080/x"),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, url=u) for i, (u, _) in enumerate(cases)],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", scrub.url_canonical(F.col("url")).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_url_dedup_first_wins_on_canonical_collision(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, url="https://h.io/p?b=2&a=1"),
            Row(doc_id=1, url="HTTPS://H.IO/p?a=1&utm_source=x&b=2#f"),
            Row(doc_id=2, url="https://h.io/other"),
        ],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r for r in scrub.url_dedup(df).collect()}
    assert out[0]["canon"] == out[1]["canon"] == "https://h.io/p?a=1&b=2"
    assert out[0]["is_keeper"] and not out[1]["is_keeper"]
    assert out[2]["is_keeper"]


def test_substring_dedup_interval_union_and_kept_text(spark):
    # doc 0 (40 distinct tokens) gets an injected quote doc carrying
    # tokens 6..24 (1-based, width 19) verbatim: every 8-gram inside
    # that window duplicates, the marks union into ONE maximal run
    # [6, 25), and both docs lose exactly 19 tokens.
    words = " ".join(f"w{i}" for i in range(40))
    d = _docs_df(
        spark,
        [
            (0, words),
            (1, "totally unique text nothing repeats here at all ever"),
            (2, " ".join(["rep"] * 16)),  # self-duplicating doc
        ],
    )
    out = {r["doc_id"]: r for r in scrub.substring_dedup(d).collect()}
    r0 = out[0]
    assert (r0["n_tokens"], r0["dup_tokens"], r0["n_runs"]) == (40, 19, 1)
    kept = [f"w{i}" for i in range(40) if not (5 <= i <= 23)]
    assert r0["kept_md5"] == hashlib.md5(
        " ".join(kept).encode()
    ).hexdigest()
    # unique doc untouched
    assert out[1]["dup_tokens"] == 0 and out[1]["n_runs"] == 0
    assert out[1]["kept_md5"] == hashlib.md5(
        b"totally unique text nothing repeats here at all ever"
    ).hexdigest()
    # 16x same token: every gram identical -> whole doc one run, empty
    # survivor text
    r2 = out[2]
    assert (r2["dup_tokens"], r2["n_runs"]) == (16, 1)
    assert r2["kept_md5"] == hashlib.md5(b"").hexdigest()
    assert r2["dup_frac"] == 1.0
    # the injected quote doc itself: 3 preamble tokens survive
    rq = out[scrub.QUOTE_ID_OFFSET]
    assert (rq["n_tokens"], rq["dup_tokens"]) == (22, 19)
    assert rq["kept_md5"] == hashlib.md5(
        b"quoted passage follows"
    ).hexdigest()


def test_substring_dedup_two_disjoint_runs(spark):
    # two duplicated windows separated by unique filler merge into TWO
    # runs, not one. doc 10 (%10==0) quotes tokens 6..24 of doc 10;
    # doc 3 repeats doc 10's tokens 30..38 (8-gram) verbatim once.
    base = [f"t{i}" for i in range(40)]
    d = _docs_df(
        spark,
        [
            (10, " ".join(base)),
            (3, "filler one two three " + " ".join(base[29:37])),
        ],
    )
    r = {x["doc_id"]: x for x in scrub.substring_dedup(d).collect()}[10]
    # run A: quote window [6, 25); run B: tokens 30..37 -> [30, 38)
    assert r["n_runs"] == 2
    assert r["dup_tokens"] == 19 + 8
    kept = base[:5] + base[24:29] + base[37:]
    assert r["kept_md5"] == hashlib.md5(
        " ".join(kept).encode()
    ).hexdigest()


def test_substring_dedup_short_and_empty_docs(spark):
    d = _docs_df(spark, [(1, "short doc"), (2, "")])
    out = {r["doc_id"]: r for r in scrub.substring_dedup(d).collect()}
    assert out[1]["n_tokens"] == 2 and out[1]["dup_tokens"] == 0
    assert out[2]["n_tokens"] == 0 and out[2]["dup_frac"] == 0.0
    assert out[2]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_substring_dedup_plan_no_window_no_python(spark):
    """Dup-position attachment must be agg + join-back (combinable,
    AQE-skew-splittable), never a window over the gram hash — and the
    whole operator stays JVM-side (zero Python boundaries)."""
    d = _docs_df(spark, [(0, "a b c d e f g h i j"), (10, "k l m")])
    plan = plans.formatted_plan(scrub.substring_dedup(d))
    assert "Window" not in plan, plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
