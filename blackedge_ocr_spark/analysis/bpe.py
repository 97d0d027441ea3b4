"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
public byte-pair-encoding algorithm) and corpus-wide encoding with
the learned merges.

The production shape mirrors how real tokenizer trainers scale: the
ONLY corpus-sized pass is the word-frequency hash agg (combinable —
map-side combine absorbs the Zipf head, the shuffle carries distinct
words + partial counts). Every merge iteration then runs over the
cached DISTINCT-WORD table, which is orders of magnitude smaller
than the corpus (Heaps' law) — at 100 TB the corpus never re-enters
the loop. Each iteration is one Spark job (pair-count hash agg +
TakeOrderedAndProject argmax, a 1-row collect); ``N_MERGES`` jobs
total, the standard iterative-algorithm trade already documented for
k-means IVF training (analysis/ann.py).

Merge application is the exact left-to-right non-overlapping pair
substitution of the published algorithm, expressed as a left fold
over the symbol list: a merged symbol never re-merges with the
following symbol within the same iteration (``aaa`` + merge (a,a)
-> ``[aa, a]``, ``abab`` + (a,b) -> ``[ab, ab]``). The DuckDB oracle
runs the IDENTICAL fold via list_reduce over an unrolled CTE chain,
one stage per merge — both engines pick every merge from the same
(n DESC, lhs ASC, rhs ASC) total order, so the learned merge table
is bit-identical by construction. Tokens are ``[a-z0-9]+`` runs
(functions/text.tokens), so symbol strings are pure ASCII and the
tie-break collation agrees across engines.

reference: the reference engine ships no tokenizer trainer — this is
part of the beyond-reference training-data-pipeline surface (brief:
token counting "BPE-ish"); textstats.bpe_pairs keeps the one-shot
first-iteration statistic, this module runs the actual loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blackedge_ocr_spark.functions.text import tokens

# Number of merge iterations for the query surface. Small on purpose:
# the oracle unrolls one CTE stage per merge (the k-means precedent);
# the engine loop itself takes any count.
N_MERGES = 6


def chars_col(word: Column) -> Column:
    """Initial symbol list: the word's characters, in order. Tokens
    are non-empty, so sequence(1, length) is always ascending (the
    frame_sample descending-sequence lesson does not bite here)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """One BPE merge pass: replace every non-overlapping (lhs, rhs)
    adjacency left-to-right with the concatenated symbol.

    Left fold keeps exact published semantics: after a merge the new
    symbol ``lhs||rhs`` sits at the tail, and (unless lhs==lhs||rhs,
    impossible — it is strictly longer) cannot match ``lhs`` again,
    so the NEXT symbol starts a fresh window exactly like the
    scan-and-skip loop of the reference algorithm."""
    merged = F.lit(lhs + rhs)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (s == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freq(docs: DataFrame) -> DataFrame:
    """The one corpus-sized stage: distinct-word frequencies via a
    combinable hash agg over the exploded token stream."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def syms_after(merges: list[tuple[str, str]]) -> Column:
    """Symbol-list expression for ``word`` after applying the given
    merges in order — a linear chain of fold expressions (depth =
    len(merges)), evaluated per distinct word only."""
    syms = chars_col(F.col("word"))
    for lhs, rhs in merges:
        syms = apply_merge(syms, lhs, rhs)
    return syms


def _pair_structs(syms: Column) -> Column:
    """Adjacent symbol pairs as structs; guarded so 1-symbol words
    emit none (sequence(1, 0) would be the DESCENDING [1, 0])."""
    idx = F.when(
        F.size(syms) > 1, F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda j: F.struct(
            F.element_at(syms, j).alias("lhs"),
            F.element_at(syms, j + 1).alias("rhs"),
        ),
    )


def train_merges(
    docs: DataFrame, n_merges: int = N_MERGES
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Run the merge loop; returns the persisted word table and the
    learned merges [(lhs, rhs, weighted_count)] in rank order.

    Each iteration recomputes symbols from characters through the
    merges-so-far chain — no per-iteration materialization juggling,
    and cost stays O(|distinct words| * word_len * rank), evaluated
    on the cached table (for the production-size vocabulary a
    periodic checkpoint of the symbol column would cap the chain;
    at N_MERGES=6 the chain is cheaper than the writes)."""
    words = word_freq(docs).persist()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = _pair_structs(syms_after([(a, b) for a, b, _ in merges]))
        top = (
            words.select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append((r["lhs"], r["rhs"], r["n"]))
    return words, merges


def bpe_train(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Learned merge table: (rank, lhs, rhs, n) — n is the weighted
    adjacency count that made (lhs, rhs) the argmax at its rank."""
    words, merges = train_merges(docs, n_merges)
    words.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(i + 1, lhs, rhs, n) for i, (lhs, rhs, n) in enumerate(merges)],
        "rank int, lhs string, rhs string, n bigint",
    )


def bpe_encode(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Corpus-wide encoding stats with the learned merges: per doc,
    whitespace-token count, BPE-symbol count, and symbols-per-word.

    Shape at scale: the trained vocab (word -> symbol count) is the
    distinct-word table — small — and BROADCASTS to the exploded
    corpus token stream; one combinable hash agg per doc follows. The
    corpus is scanned once and never joins shuffle-side. Words absent
    from the vocab (impossible here — trained on the same corpus, but
    real at serving time) fall back to character count, the exact
    untrained-BPE encoding of an unseen word."""
    words, merges = train_merges(docs, n_merges)
    vocab = words.select(
        "word",
        F.size(syms_after([(a, b) for a, b, _ in merges]))
        .cast("long")
        .alias("n_syms"),
    )
    ex = docs.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("word")
    )
    j = ex.join(F.broadcast(vocab), "word", "left")
    from blackedge_ocr_spark.analysis.textstats import _r6

    agg = j.groupBy("doc_id").agg(
        F.count("word").alias("n_tokens"),
        F.sum(
            F.coalesce(F.col("n_syms"), F.length("word").cast("long"))
        ).alias("n_bpe"),
    )
    per_word = F.when(
        F.col("n_tokens") > 0,
        F.col("n_bpe").cast("double") / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_bpe"), F.lit(0)).cast("long").alias("n_bpe"),
        _r6(per_word).alias("syms_per_word"),
    )
