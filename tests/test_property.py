"""Hypothesis property tests.

Complements the seeded 300-doc fuzz (test_random_parity.py) with
shrinking search over the domains where cross-engine parity is exact
by construction: the number grammar (digit/comma/percent soup), the
packing algebra (two-phase == single-phase, token conservation), and
the dup-n-gram invariants. Unicode word-class edges are deliberately
NOT hypothesis-driven — the Java-vs-RE2 residual gap is documented in
sqloracle.py and fuzzed with curated inputs instead
(test_wordrun_duckdb_mirror_fuzz).

Each example batches all its rows into ONE Spark action, and
max_examples is kept small — hypothesis explores the input shape,
Spark only pays per-example, not per-row.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blackedge_ocr_spark import oracle
from blackedge_ocr_spark.analysis import corpusops

# Each example is a full Spark job (~2-6 s): the row count is the
# cheap axis, the example count the expensive one, so examples are few
# and each carries a whole batched corpus.
SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

number_soup = st.text(
    alphabet="0123456789,.%- $xap\n",
    min_size=0,
    max_size=60,
)


@given(texts=st.lists(number_soup, min_size=1, max_size=40))
@SLOW
def test_extract_numbers_matches_python_oracle(spark, texts):
    from pyspark.sql import functions as F

    from blackedge_ocr_spark.functions.text import extract_numbers

    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    got = {
        r["id"]: list(r["nums"])
        for r in df.select(
            "id", extract_numbers(F.col("text")).alias("nums")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == oracle.extract_numbers(t), repr(t)


doc_shapes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # n tokens
        st.integers(min_value=0, max_value=2),  # source id
    ),
    min_size=1,
    max_size=60,
)


@given(shapes=doc_shapes, cap=st.sampled_from([5, 16, 64]),
       bucket_ids=st.sampled_from([2, 8]))
@SLOW
def test_packing_two_phase_equals_single(spark, shapes, cap, bucket_ids):
    rows = [
        (i, " ".join(["w"] * n), f"src{s}") for i, (n, s) in enumerate(shapes)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    one = sorted(
        tuple(r) for r in corpusops.token_packing(d, cap=cap).collect()
    )
    two = sorted(
        tuple(r)
        for r in corpusops.token_packing_2p(
            d, cap=cap, bucket_ids=bucket_ids
        ).collect()
    )
    assert one == two
    # conservation: every doc lands in exactly one shard, every token
    # in exactly one shard_tokens sum
    assert sum(r[2] for r in one) == len(rows)
    assert sum(r[3] for r in one) == sum(n for n, _ in shapes)


vocab_docs = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=30,
)


@given(docs=vocab_docs)
@SLOW
def test_dup_ngram_invariants(spark, docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpusops.dup_ngram_stats(d).collect()}
    assert set(out) == set(range(len(docs)))
    texts = [" ".join(ws) for ws in docs]
    for i, ws in enumerate(docs):
        r = out[i]
        assert 0 <= r["dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_frac"] <= 1.0
        # a doc with a verbatim twin elsewhere has EVERY gram shared
        if ws and texts.count(texts[i]) > 1:
            assert r["dup_grams"] == r["n_grams"]
        if not ws:
            assert r["n_grams"] == 0 and r["dup_frac"] == 0.0


# PII soup: ASCII letters/digits plus the structural chars the PII
# rules key on (@ . - ( ) space). Java and Python re agree exactly on
# this grammar (ASCII classes, leftmost-first, no backreferences), so
# parity is exact by construction; embedded REAL matches come from
# interleaving crafted snippets with the soup.
pii_soup = st.text(
    alphabet="abcABC019@.-() ",
    min_size=0,
    max_size=50,
)
pii_snippets = st.lists(
    st.sampled_from(
        [
            "u1@ex.co",
            "U1@EX.CO",
            "MiXed@Ex.Co",
            "1.2.3.4",
            "(123) 456-7890",
            "123-45-6789",
            "1234 5678 9012 3456",
            "",
        ]
    ),
    min_size=0,
    max_size=3,
)


@given(
    parts=st.lists(st.tuples(pii_soup, pii_snippets), min_size=1, max_size=30)
)
@SLOW
def test_pii_scan_and_redact_match_python_re(spark, parts):
    """Spark PII chain == Python re chain on random soup + embedded
    real matches (counts per rule, total, and redacted text)."""
    import re

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from blackedge_ocr_spark.analysis import scrub

    texts = [
        soup + " ".join(snips) for soup, snips in parts
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got_scan = {
        r["doc_id"]: r for r in scrub.pii_scan(df).collect()
    }
    got_red = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", scrub.redact_col(F.col("text")).alias("red")
        ).collect()
    }
    for i, t in enumerate(texts):
        # sequential semantics: each rule counts AFTER earlier rules
        # redacted, so total == number of placeholder tokens
        red = t
        total = 0
        for name, pat, tok in scrub.PII_RULES:
            n = len(re.findall(pat, red))
            assert got_scan[i][f"n_{name}"] == n, (name, t)
            total += n
            red = re.sub(pat, tok, red)
        assert got_scan[i]["n_pii"] == total
        assert got_red[i]["red"] == red, t


bpe_docs = st.lists(
    st.lists(
        st.text(alphabet="abz01", min_size=1, max_size=6),
        min_size=0,
        max_size=10,
    ),
    min_size=1,
    max_size=20,
)


@given(docs=bpe_docs)
@SLOW
def test_bpe_pairs_match_python_counter(spark, docs):
    """Spark bpe_pairs == a pure-Python Counter over freq-weighted
    adjacent char pairs of the word stream (1-char words emit none)."""
    from collections import Counter

    from blackedge_ocr_spark.analysis import textstats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["pair"]: r["n"] for r in textstats.bpe_pairs(d).collect()
    }
    want = Counter()
    for ws in docs:
        for w in ws:
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    # top-K truncation: compare on the K-boundary-free case
    if len(want) <= textstats.BPE_TOP_K:
        assert got == dict(want)
    else:
        assert all(got[p] == want[p] for p in got)


line_soup = st.lists(
    st.sampled_from(["nav", "footer", "own", "x", "", "a b", "?"]),
    min_size=0,
    max_size=6,
)


@given(docs=st.lists(line_soup, min_size=1, max_size=24))
@SLOW
def test_boilerplate_strip_matches_python_model(spark, docs):
    """boilerplate_strip == the obvious python model: count DISTINCT
    docs per exact line, drop every occurrence of lines at or over
    the threshold, reassemble in order."""
    import hashlib
    from collections import defaultdict

    from blackedge_ocr_spark.analysis.scrub import (
        BOILERPLATE_MIN_DOCS,
        boilerplate_strip,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in boilerplate_strip(df).collect()}

    df_count = defaultdict(set)
    for i, text in rows:
        for line in text.split("\n"):
            df_count[line].add(i)
    hot = {l for l, ds in df_count.items() if len(ds) >= BOILERPLATE_MIN_DOCS}
    for i, text in rows:
        lines = text.split("\n")
        kept = [l for l in lines if l not in hot]
        r = got[i]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        want = hashlib.md5("\n".join(kept).encode()).hexdigest()
        assert r["kept_md5"] == want, (i, lines, kept)
