"""Duplicate-cluster assembly: near-dup pairs → connected components.

The dedup suite emits *relations* — exact-duplicate groups
(`dedup.exact_duplicates`) and near-dup pairs among the exact
survivors (`dedup.production_pairs`). A production dedup job needs
one more step before it can drop rows: transitively close those
relations into clusters and pick one keeper per cluster (A≈B and
B≈C must collapse A, B, C together even when the A–C pair was never
scored). That closure is connected components over the duplicate
graph; this module implements it as an iterative DataFrame algorithm.

Reference parity: the reference scores pairwise similarity only
(src/services/validation/content_validator.py) — clustering is part
of the beyond-reference training-data surface, like the rest of the
analysis subpackage.

Scale shape (the part that matters at 10^12 docs):

- **Only the edge-induced subgraph iterates.** Duplicate edges touch
  a small fraction of a deduplicated web corpus; isolated documents
  are their own cluster by definition and never enter the loop. The
  bulk corpus is joined exactly once at the end (left join +
  coalesce), so the per-iteration shuffles move O(dup docs), not
  O(corpus).
- **Min-label propagation + pointer jumping.** Each round first
  lowers every node's label to the min over itself and its
  neighbors (one join + one map-side-combinable groupBy), then
  compresses label chains by one self-join hop (label ← label of
  label). Propagation alone needs O(diameter) rounds; the
  compression hop doubles the distance a label travels per round,
  giving O(log diameter) — the same convergence bound as the
  large-star/small-star formulation (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SOCC'14) with a simpler
  per-round plan. Duplicate graphs are near-cliques (diameter ≲ 3),
  so the loop typically converges in 2–3 rounds.
- **Lineage truncation.** Labels are localCheckpoint()ed each round;
  without it the plan doubles per iteration and the final job
  re-executes every round's shuffle.
- **Deterministic.** Every step is a min — no rand, no
  iteration-order dependence; the fixpoint is the component-minimum
  labeling regardless of round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis import dedup
from blackedge_ocr_spark.functions.text import normalize_for_comparison

MAX_ROUNDS = 25  # 2^25-long label chains — far beyond any dup graph

# Below this edge count the component computation runs driver-local
# (union-find over one collect) instead of the iterative DataFrame
# loop — the same hybrid discipline as the k-means trainer
# (analysis/ann.py): both engines reach the identical fixpoint (the
# component-minimum labeling), so the switch is invisible to results
# and is parity-tested. The collect() cost is Python Row objects, not
# raw bytes: ~150-300 B per edge (≈0.2-0.3 GB at 1M edges) — sized so
# the shortcut stays cheap even on a default-memory driver; the
# duplicate subgraph of a 10^12-doc corpus exceeds this and takes the
# distributed path.
DRIVER_EDGE_CAP = 1_000_000


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_rounds: int = MAX_ROUNDS,
    driver_edge_cap: int = DRIVER_EDGE_CAP,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component = the minimum node id reachable through the undirected
    edge set. Isolated nodes (no edges) are absent from the output —
    callers attach them with a left join + coalesce(component, node)
    so the bulk table never enters the iteration.

    Hybrid engine: edge sets under ``driver_edge_cap`` union-find on
    the driver (the duplicate subgraph is tiny next to the corpus by
    construction — collecting EDGES is nothing like collecting the
    corpus); larger sets run the distributed min-label loop. Both
    paths produce the identical component-minimum labeling.
    """
    edges = edges.persist()
    try:
        n_edges = edges.count()
        if n_edges <= driver_edge_cap:
            return _driver_union_find(edges, a, b)
        return _distributed_components(edges, a, b, max_rounds)
    finally:
        edges.unpersist()


def _driver_union_find(edges: DataFrame, a: str, b: str) -> DataFrame:
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # one collect, bounded by driver_edge_cap (toLocalIterator would
    # pay a driver round-trip per partition — seconds on a
    # many-partition union of tiny outputs)
    for row in edges.select(a, b).collect():
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            # larger root under smaller → every root is its
            # component's minimum, matching the distributed fixpoint
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in parent]
    # Node type follows the edge columns (doc ids are string in the
    # corpus contract, long in the test tables) — a hardcoded long
    # schema would crash ONLY on the driver path of the hybrid, a
    # cap-dependent failure. Python min/max on str is code-point
    # order == Spark's UTF-8 binary order, so both engines still
    # reach the identical component-minimum labeling.
    node_type = dict(edges.dtypes)[a]
    return edges.sparkSession.createDataFrame(
        rows, f"node {node_type}, component {node_type}"
    )


def _distributed_components(
    edges: DataFrame, a: str, b: str, max_rounds: int
) -> DataFrame:
    sym = edges.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    sym = sym.filter(F.col("src") != F.col("dst")).distinct()
    # Reused every round: materialize once, keep partitioned on src so
    # the per-round propagate join reuses the exchange.
    sym = sym.repartition("src").persist()

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint()
    )

    try:
        for _ in range(max_rounds):
            # Propagate: lab(v) <- min(lab(v), min over neighbors').
            flowed = sym.join(
                labels, sym["src"] == labels["node"], "inner"
            ).select(F.col("dst").alias("node"), "lab")
            new = (
                labels.unionByName(flowed)
                .groupBy("node")
                .agg(F.min("lab").alias("lab"))
            )
            # Compress: lab(v) <- lab(lab(v)). Labels are node ids
            # (min over a set containing the node itself), so the hop
            # always resolves; left join + coalesce guards the
            # fixpoint where lab(v) == v.
            hop = new.select(
                F.col("node").alias("h_node"), F.col("lab").alias("h_lab")
            )
            new = (
                new.join(hop, new["lab"] == hop["h_node"], "left")
                .select("node", F.coalesce("h_lab", "lab").alias("lab"))
                .localCheckpoint()
            )
            changed = (
                new.join(labels.withColumnRenamed("lab", "old"), "node")
                .filter(F.col("lab") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = new
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds}"
                " rounds"
            )
    finally:
        # also on the non-convergence raise — the persisted edge set
        # must not outlive the call
        sym.unpersist()
    return labels.select("node", F.col("lab").alias("component"))


def duplicate_edges(docs: DataFrame) -> DataFrame:
    """The duplicate graph over (doc_id, text): star edges inside each
    exact-content group (doc → group keeper: linear in group size, not
    the m² clique) plus the near-dup pairs among exact survivors from
    ``dedup.production_pairs``. Column contract: (a, b)."""
    h = F.md5(normalize_for_comparison(F.col("text")))
    hashed = docs.select("doc_id", h.alias("content_hash"))
    groups = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_doc_id")
    )
    exact = (
        hashed.join(groups, "content_hash")
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
        .select(F.col("doc_id").alias("a"), F.col("keep_doc_id").alias("b"))
    )
    # Near edges = the production ordering (LSH over exact survivors),
    # but reusing THIS function's groups instead of calling
    # dedup.production_pairs — which would recompute the
    # normalize+md5 pass over the full corpus a second time (the
    # regex chain is the dominant map cost at scale).
    keepers = groups.select(F.col("keep_doc_id").alias("doc_id"))
    survivors = docs.join(keepers, "doc_id")
    near = dedup.lsh_candidate_pairs(survivors).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return exact.unionByName(near)


def dedup_clusters(docs: DataFrame) -> DataFrame:
    """Full cluster assignment: (doc_id, cluster_id, is_keeper) for
    every document, cluster_id = min doc_id transitively reachable via
    exact-duplicate or near-dup edges, keeper = the minimum member.
    Documents with no duplicate edge are their own singleton cluster
    and never enter the iterative loop."""
    comp = connected_components(duplicate_edges(docs)).withColumnRenamed(
        "node", "doc_id"
    )
    return docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
        (F.coalesce("component", "doc_id") == F.col("doc_id")).alias(
            "is_keeper"
        ),
    )
