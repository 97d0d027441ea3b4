"""Link-graph host/page scoring: iterative PageRank over the corpus.

Web-scale curation pipelines score hosts/pages by link centrality
(CommonCrawl-derived sets rank hosts by harmonic centrality /
PageRank and use the score as a crawl-priority and quality prior).
The reference engine has no link stage — this is part of the
beyond-reference training-data surface, like dedup/ANN.

Graph staging: the synthetic corpus carries no hyperlinks, so edges
are derived deterministically from doc_id with pure integer maps
(the same portable-staging discipline as ``queries._url_col``):

- a HUB edge ``src → src % PR_HUBS`` — every page links to one of 16
  hub pages, giving the in-degree distribution a realistic hot head
  (hubs collect ~N/16 in-links each: the skewed-key regime a real
  link graph puts in front of the contribution aggregation);
- a QUADRATIC edge ``src → (src² + 1) % N`` and a LINEAR edge
  ``src → (3·src + 7) % N`` for long-range spread.

Self-loops drop, duplicate pairs collapse; every node keeps
out-degree ≥ 1 (proved in ``pagerank``'s docstring note), so there
is no dangling mass to redistribute. A production deployment swaps
``link_edges`` for real (src_host, dst_host) pairs — everything
downstream is staging-agnostic.

Cross-engine exactness: ranks live in NANO units (int64, 1e9 = mass
1.0) and every operation is integer — ``div`` floor division for
contributions (r div outdeg) and damping ((85·S) div 100), exact
int64 sums for the gather. No floating point exists anywhere in the
iteration, so Spark and the unrolled-CTE DuckDB oracle agree
bit-for-bit by construction, with none of the fold-order discipline
the cosine kernels need.

Scale shape: edges ⨝ ranks on src, then the contribution gather
shuffles on dst — PageRank's canonical two exchanges per iteration,
O(E) rows each. The static side (edges + out-degree, pre-joined
once) is persisted and co-partitioned on src so only the O(N) rank
table moves per iteration; hub-key skew in the gather is exactly
what AQE skew-join splitting is enabled for (session.py). At 10^12
docs you would additionally block-compress edges per (src-partition,
dst-partition) — noted, not needed at bench scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ITERS = 3        # unrolled in the oracle — keep small and fixed
PR_HUBS = 16        # hub pool size for the skewed in-degree head
PR_DAMP_NUM = 85    # damping 0.85 as an exact integer ratio
PR_DAMP_DEN = 100
NANO = 10**9        # rank mass 1.0 in int64 nano-units


def link_edges(docs: DataFrame) -> DataFrame:
    """Deterministic (src, dst) edge table over the doc_id node set:
    hub + quadratic + linear maps, self-loops dropped, duplicates
    collapsed, targets restricted to existing nodes (a no-op on the
    consecutive-id corpus, correctness under any id set)."""
    nodes = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    n = nodes.count()
    src = F.col("doc_id")
    raw = (
        nodes.select(src.alias("src"), (src % PR_HUBS).alias("dst"))
        .unionByName(
            nodes.select(
                src.alias("src"), ((src * src + 1) % n).alias("dst")
            )
        )
        .unionByName(
            nodes.select(
                src.alias("src"), ((src * 3 + 7) % n).alias("dst")
            )
        )
    )
    return (
        raw.filter(F.col("src") != F.col("dst"))
        .join(
            nodes.select(F.col("doc_id").alias("dst")), "dst", "left_semi"
        )
        .distinct()
    )


def _rank_iterate(nodes, e_od, ranks, base_col, iters: int):
    """The shared damped integer iteration: contributions
    ``r div od`` gathered per dst (exact int64 sums), next rank =
    per-node teleport ``base_col`` + ``(85·S) div 100``. Used by
    uniform-teleport ``pagerank`` and seed-teleport ``trustrank`` —
    one implementation, one partitioning discipline."""
    for _ in range(iters):
        contrib = e_od.join(
            ranks.withColumnRenamed("doc_id", "src"), "src"
        ).select("dst", F.expr("r div od").alias("c"))
        s = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(s, nodes.doc_id == s.dst, "left").select(
            "doc_id",
            (
                base_col
                + F.expr(
                    f"({PR_DAMP_NUM} * coalesce(s, 0L)) "
                    f"div {PR_DAMP_DEN}"
                )
            ).alias("r"),
        )
    return ranks


def _graph_staging(docs: DataFrame):
    """(nodes persisted+aligned, n, edges, od, e_od persisted) —
    shared by both rank variants; see ``pagerank`` for the
    partitioning-alignment rationale."""
    spark = docs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nodes = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        .repartition(n_part, "doc_id")
        .persist()
    )
    n = nodes.count()
    edges = link_edges(docs)
    od = edges.groupBy("src").agg(F.count("*").alias("od"))
    e_od = edges.join(od, "src").repartition(n_part, "src").persist()
    return nodes, n, edges, od, e_od


def pagerank(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer PageRank over ``link_edges``: returns one row per node
    (doc_id, out_deg, in_deg, rank) with rank in NANO units after
    ``iters`` damped iterations from the uniform start (NANO div N).

    Update rule (all int64):
        contrib(e) = r(src) div out_deg(src)          per edge
        S(v)       = Σ contrib over in-edges          exact sum
        r'(v)      = (15·NANO) div (100·N)
                     + (85 · S(v)) div 100

    No dangling nodes exist by construction: the three staged edges
    of src can all self-drop only if src % 16 == src AND
    (src²+1) % N == src AND (3·src+7) % N == src — the first forces
    src < 16, under which 3·src+7 ∈ [7, 52] equals src never (and
    N > 52 at every shipped scale), so out_deg ≥ 1 always.

    The floor divisions bleed ≤ 1 nano-unit per edge per iteration
    (total mass decays by ≤ E nano-units/iter) — the documented price
    of exactness; relative rank order is what the score is used for.
    """
    # Partitioning alignment (in _graph_staging): everything keyed
    # by node id uses the SAME partition count (the session's shuffle
    # partitions — the count groupBy aggregates produce), so (a) the
    # per-iteration ranks ⨝ e_od join reuses the rank table's
    # existing hash distribution (ranks leave each iteration
    # partitioned by doc_id; the src rename preserves it through the
    # alias), and (b) the nodes side of the gather join never
    # re-shuffles after its one staging repartition. Net
    # per-iteration traffic: the O(E) contribution gather —
    # PageRank's irreducible shuffle — plus nothing else.
    nodes, n, edges, od, e_od = _graph_staging(docs)
    base = (15 * NANO) // (100 * n)
    r0 = nodes.select(
        "doc_id", F.lit(NANO // n).cast("long").alias("r")
    )
    ranks = _rank_iterate(
        nodes, e_od, r0, F.lit(base).cast("long"), iters
    )
    return _assemble(nodes, edges, od, ranks)


def _assemble(nodes, edges, od, ranks) -> DataFrame:
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    return (
        nodes.join(od.withColumnRenamed("src", "doc_id"), "doc_id", "left")
        .join(in_deg.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
        .join(ranks, "doc_id")
        .select(
            "doc_id",
            F.coalesce("od", F.lit(0).cast("long")).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0).cast("long")).alias("in_deg"),
            F.col("r").alias("rank"),
        )
    )


def trustrank(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Seed-teleport PageRank (TrustRank, Gyöngyi et al. 2004): the
    random surfer teleports ONLY to a trusted seed set, so rank mass
    decays with link distance from the seeds — the host-quality /
    spam-demotion score web-curation stacks combine with content
    signals. Seed set here: the hub pages (doc_id < PR_HUBS), the
    deterministic stand-in for a vetted host whitelist.

    Same exact-int64 iteration and partitioning as ``pagerank``
    (shared ``_rank_iterate``); only the start vector and teleport
    differ: seeds split the full NANO mass at t=0 and receive
    ``(15·NANO) div (100·n_seeds)`` each per pass, non-seeds get
    teleport 0 and accumulate only flowed trust.
    """
    nodes, n, edges, od, e_od = _graph_staging(docs)
    seed = F.col("doc_id") < PR_HUBS
    n_seeds = nodes.filter(seed).count()
    r0 = nodes.select(
        "doc_id",
        F.when(seed, F.lit(NANO // max(n_seeds, 1)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    base = (
        F.when(
            seed, F.lit((15 * NANO) // (100 * max(n_seeds, 1)))
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    ranks = _rank_iterate(nodes, e_od, r0, base, iters)
    return _assemble(nodes, edges, od, ranks)


HITS_ITERS = 2      # authority+hub sweeps; unrolled in the oracle


def hits(docs: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) over ``link_edges``:
    (doc_id, authority, hub) with both scores in ≤NANO int64 units
    after ``iters`` mutual-reinforcement sweeps from the uniform hub
    start h0 = NANO.

    Update rule (all int64, order-insensitive sums → cross-engine
    parity by construction):
        a_raw(v) = Σ_{u→v} h(u)            gather over in-edges
        a(v)     = a_raw(v) div d_a        d_a = max(1,
                                           (max a_raw + NANO-1) div NANO)
        h_raw(u) = Σ_{u→v} a(v)            gather over out-edges
        h(u)     = h_raw(u) div d_h        same ceil-ratio divisor

    The ceil-ratio divisor is the integer stand-in for the usual
    norm: it floors the vector back under NANO without ever forming
    the overflow-prone ``x * NANO`` product (a_raw can reach
    N·NANO ≈ 5·10^15 at sf10 — times NANO would blow int64; the
    divisor form never exceeds the raw sum). Floor loss ≤ 1 unit
    per node per sweep, the same documented price as pagerank's.

    Scale shape: per sweep, two O(E) gathers (shuffle on dst, then
    src — the staged e_od table is already hash-distributed on src,
    so the hub gather's edge side never re-shuffles) and two 1-row
    max aggs that ride broadcast joins. Skew: the hub pages collect
    ~N/16 in-edges each — the same AQE-covered hot-key regime as the
    pagerank contribution gather.
    """
    if iters < 1:
        raise ValueError("hits requires iters >= 1")
    nodes, n, edges, od, e_od = _graph_staging(docs)
    h = nodes.select("doc_id", F.lit(NANO).cast("long").alias("h"))
    a = None
    for _ in range(iters):
        a = _gather_norm(nodes, e_od, h, "src", "dst", "h", "a")
        h = _gather_norm(nodes, e_od, a, "dst", "src", "a", "h")
    return (
        nodes.join(a, "doc_id")
        .join(h, "doc_id")
        .select(
            "doc_id",
            F.col("a").alias("authority"),
            F.col("h").alias("hub"),
        )
    )


def _gather_norm(nodes, e_od, scores, join_side, group_side, in_col, out_col):
    """One HITS half-sweep: gather ``in_col`` across edges from
    ``join_side`` to ``group_side``, zero-fill absent nodes, then
    floor-normalize by the ceil-ratio divisor."""
    raw = (
        e_od.join(
            scores.withColumnRenamed("doc_id", join_side), join_side
        )
        .groupBy(group_side)
        .agg(F.sum(in_col).alias("_raw"))
    )
    # persist: the raw vector feeds BOTH the max agg and the
    # normalized output — without it the score lineage doubles every
    # half-sweep (2^sweeps plan growth, recompute to match)
    filled = (
        nodes.join(raw, nodes.doc_id == raw[group_side], "left")
        .select(
            "doc_id",
            F.coalesce("_raw", F.lit(0).cast("long")).alias("_raw"),
        )
        .persist()
    )
    m = filled.agg(F.max("_raw").alias("_m"))
    out = (
        filled.crossJoin(F.broadcast(m))
        .select(
            "doc_id",
            F.expr(
                f"_raw div greatest((_m + {NANO - 1}) div {NANO}, 1L)"
            ).cast("long").alias(out_col),
        )
        # eager lineage truncation: each half-sweep's score vector
        # feeds the next through BOTH the gather and its max agg, so
        # without a checkpoint the analyzed plan doubles per sweep
        # (observed 70k-line explain at 2 iterations). The N-row
        # score table is exactly what iterative graph engines
        # checkpoint; a multi-executor prod run would swap this for
        # a reliable checkpoint dir to survive executor loss.
        .localCheckpoint()
    )
    filled.unpersist()
    return out


def triangle_stats(
    docs: DataFrame, edges: DataFrame | None = None
) -> DataFrame:
    """Global triangle census of the (undirected) link graph: ONE row
    (n_nodes, n_edges, n_wedges, n_triangles, clustering) — the
    standard graph-health signature (global clustering coefficient =
    3·triangles / wedges) web-graph curation uses to sanity-check a
    crawl snapshot against known web topology.

    Algorithm: the degree-ordered orientation (Chiba–Nishizeki /
    Schank). Each undirected edge {u,v} is oriented from the
    lower-(degree, id) endpoint to the higher; a triangle {u,v,w}
    is then counted EXACTLY once, as the wedge (u→v, u→w),
    key(v) < key(w), closed by the oriented edge v→w.

    Why this survives scale: the wedge join explodes each vertex
    into C(out_deg, 2) candidate pairs — under the orientation the
    out-degree of ANY vertex is O(sqrt(E)) (a vertex keeps only
    edges toward higher-ranked ones, and more than sqrt(E) of those
    would need sqrt(E) vertices of degree >= sqrt(E), i.e. > E edge
    endpoints), so a hub with 10^6 in-links contributes NOTHING to
    the explosion — exactly the skew defense the naive all-wedges
    join lacks. Work is O(E^1.5) worst-case, the optimal bound for
    exact counting; the closure check is a semi-join of candidate
    pairs against the oriented edge list (ids only).

    Exactness: counts and degrees are int64; the one double
    (clustering) is a single division micro-rounded to 6 — identical
    in DuckDB.
    """
    # edges=None uses the deterministic staged graph; a production
    # run passes real (src, dst) pairs — the (deg, id) order below
    # is id-range-safe either way (no packed key; see module tests
    # with ids >= 2^33), while the staged quadratic map itself needs
    # ids < ~3e9 (src*src must fit int64).
    edges = link_edges(docs) if edges is None else edges
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    # total order: (deg, id) compared COMPONENTWISE — an int64 pack
    # (deg·2^32 + id) would silently corrupt the order for ids
    # ≥ 2^32, which make_sf-style replicated corpora can reach
    ka = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    kb = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    a_lt_b = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(ka, "a")
        .join(kb, "b")
        .select(
            F.when(a_lt_b, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_lt_b, F.col("b")).otherwise(F.col("a")).alias("w"),
            F.when(a_lt_b, F.col("db")).otherwise(F.col("da")).alias("dw"),
        )
        .persist()
    )
    e1 = oriented.select(
        "u", F.col("w").alias("x"), F.col("dw").alias("dx")
    )
    e2 = oriented.select(
        "u", F.col("w").alias("y"), F.col("dw").alias("dy")
    )
    x_lt_y = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    wedges = e1.join(e2, "u").filter(x_lt_y)
    closed = wedges.join(
        oriented.select(
            F.col("u").alias("x"), F.col("w").alias("y")
        ),
        ["x", "y"],
        "left_semi",
    )
    tri = closed.agg(F.count("*").alias("n_triangles"))
    counts = und.agg(F.count("*").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
        )
    )
    return counts.crossJoin(tri).select(
        F.col("n_nodes").cast("bigint"),
        F.col("n_edges").cast("bigint"),
        F.col("n_wedges").cast("bigint"),
        F.col("n_triangles").cast("bigint"),
        F.when(
            F.col("n_wedges") > 0,
            F.floor(
                F.lit(3) * F.col("n_triangles") / F.col("n_wedges") * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


LPA_ITERS = 2       # synchronous sweeps; unrolled in the oracle


def label_propagation(
    docs: DataFrame,
    iters: int = LPA_ITERS,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al.
    2007) over the undirected link graph: every node starts as its
    own label; each sweep adopts the MOST FREQUENT label among
    neighbors, ties broken toward the SMALLEST label — the
    deterministic variant (classic LPA tie-breaks randomly, which
    would be unverifiable across engines). Returns (doc_id, label,
    community_size) after ``iters`` sweeps.

    The per-node argmax never sorts: it is the TWO-STEP form —
    max(count) per node, then min(label) among the tied winners —
    three combinable hash aggs + one join over the O(E)-bounded
    count table per sweep. (The int64 pack ``cnt·2^32 − label`` the
    keeper queries use would be one agg, but labels here are
    doc_ids with no 2^32 bound — a replicated corpus's ids corrupt
    the pack silently, so the unpackable form is the correct one.)
    Label vectors localCheckpoint like the HITS sweeps (same
    doubling lineage).
    """
    edges = link_edges(docs) if edges is None else edges
    und = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .unionByName(
            edges.select(F.col("dst").alias("v"), F.col("src").alias("u"))
        )
        .distinct()
        .persist()
    )
    nodes = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    labels = nodes.select("doc_id", F.col("doc_id").alias("lbl"))
    for _ in range(iters):
        neigh = (
            und.join(labels.withColumnRenamed("doc_id", "u"), "u")
            .groupBy("v", "lbl")
            .agg(F.count("*").alias("cnt"))
        )
        neigh = neigh.persist()
        mc = neigh.groupBy("v").agg(F.max("cnt").alias("mc"))
        winners = (
            neigh.join(mc, "v")
            .filter(F.col("cnt") == F.col("mc"))
            .groupBy("v")
            .agg(F.min("lbl").alias("win"))
        )
        labels = (
            nodes.join(winners, nodes.doc_id == winners.v, "left")
            .select(
                "doc_id",
                F.coalesce(F.col("win"), F.col("doc_id")).cast(
                    "long"
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        neigh.unpersist()
    sizes = labels.groupBy("lbl").agg(
        F.count("*").cast("long").alias("community_size")
    )
    return labels.join(sizes, "lbl").select(
        "doc_id",
        F.col("lbl").cast("bigint").alias("label"),
        F.col("community_size").cast("bigint"),
    )
