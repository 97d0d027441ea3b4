"""Semantics tests for analysis/scrub.py on crafted corpora (the
Spark-vs-DuckDB value parity is covered by the driver contract; these
pin the intended MEANING of each operator) + plan-shape assertions
for the blocklist broadcast and the no-window paragraph dedup."""

import hashlib

from pyspark.sql import Row

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
