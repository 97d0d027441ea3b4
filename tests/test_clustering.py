"""Connected-component clustering: algorithm unit tests plus a
union-find parity check on random graphs (the DuckDB recursive-CTE
oracle covers the end-to-end dedup_clusters query separately)."""

import random

from pyspark.sql import functions as F

from blackedge_ocr_spark.analysis import clustering, dedup
from blackedge_ocr_spark.functions.text import normalize_for_comparison


def _cc(spark, pairs, driver_edge_cap=0):
    # driver_edge_cap=0 forces the distributed min-label loop — the
    # scale path is what these tests pin down; the driver union-find
    # shortcut is covered by the hybrid parity test below.
    edges = spark.createDataFrame(pairs, "a long, b long")
    rows = clustering.connected_components(
        edges, driver_edge_cap=driver_edge_cap
    ).collect()
    return {r["node"]: r["component"] for r in rows}


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # roots always merge larger-under-smaller, so find() is the
    # component minimum
    return {n: find(n) for n in parent}


def test_two_components_and_transitivity(spark):
    # 1-2, 2-3 chain must merge transitively; 10-11 stays separate.
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_logarithmically(spark):
    # A 64-node path needs pointer jumping: pure propagation would
    # take 63 rounds and trip well-chosen round caps; propagate +
    # compress must close it within MAX_ROUNDS.
    pairs = [(i, i + 1) for i in range(64)]
    comp = _cc(spark, pairs)
    assert set(comp.values()) == {0}
    assert len(comp) == 65


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "a long, b long")
    assert clustering.connected_components(edges).count() == 0
    assert (
        clustering.connected_components(edges, driver_edge_cap=0).count()
        == 0
    )


def test_hybrid_engines_identical(spark):
    # The driver union-find (small-edge shortcut) and the distributed
    # min-label loop must produce the same labeling — same discipline
    # as the hybrid k-means trainer.
    rng = random.Random(11)
    pairs = [
        (rng.randrange(150), rng.randrange(150)) for _ in range(90)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    via_driver = _cc(spark, pairs, driver_edge_cap=10**9)
    via_loop = _cc(spark, pairs, driver_edge_cap=0)
    assert via_driver == via_loop


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cc(spark, pairs)
    want = _uf_components(pairs)
    assert got == want


def test_dedup_clusters_singletons_and_keepers(spark):
    # Three exact copies (1,2,3), a near-dup bridge is not needed:
    # the star edges alone must cluster them under min id 1; doc 9 is
    # untouched and must come back as its own keeper without entering
    # the iterative loop.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon zeta"),
            (9, "completely different text about other things"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in clustering.dedup_clusters(docs).collect()
    }
    assert out == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        9: (9, True),
    }


def test_cluster_ids_consistent_with_pair_relations(spark):
    # End-to-end on a tiny injected corpus: every exact-duplicate
    # group and every production near-dup pair must land in one
    # cluster, and each cluster's keeper is its minimum member.
    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body with shared words "),
            (F.col("id") % 4).cast("string"),
        ).alias("text"),
    )
    corpus = dedup.with_dup_injection(docs, every=10)
    assigned = clustering.dedup_clusters(corpus)
    rows = assigned.collect()
    by_doc = {r["doc_id"]: r["cluster_id"] for r in rows}
    # exact-content groups all land in one cluster
    hashed = corpus.select(
        "doc_id",
        F.md5(normalize_for_comparison(F.col("text"))).alias("h"),
    ).collect()
    by_hash = {}
    for r in hashed:
        by_hash.setdefault(r["h"], []).append(r["doc_id"])
    for members in by_hash.values():
        assert len({by_doc[m] for m in members}) == 1
    # near-dup pairs agree
    for p in dedup.production_pairs(corpus).collect():
        assert by_doc[p["doc_a"]] == by_doc[p["doc_b"]]
    # keeper = min member
    clusters = {}
    for d, c in by_doc.items():
        clusters.setdefault(c, []).append(d)
    for c, members in clusters.items():
        assert c == min(members)


def test_cluster_keeper_quality_argmax_min_id_tiebreak(spark):
    """keep_doc_id must be the max-quality member of its cluster with
    min-id tie-break, verified against an independent per-doc quality
    recomputation on the sf0.001 corpus (exact-dup members tie on
    identical text, so injected pairs fall back to the base id)."""
    from blackedge_ocr_spark.analysis.textstats import quality_col
    from blackedge_ocr_spark.queries import (
        _docs,
        q_cluster_keeper_quality,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["cluster_id"]: r for r in
           q_cluster_keeper_quality(spark, sf).collect()}

    corpus = dedup.with_dup_injection(
        _docs(spark, sf).select("doc_id", "text")
    )
    members = {}
    assigned = clustering.dedup_clusters(corpus).collect()
    for r in assigned:
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    qi = {
        r["doc_id"]: r["qi"]
        for r in corpus.select(
            "doc_id",
            F.floor(quality_col(F.col("text")) * 1e6 + F.lit(0.5))
            .cast("long").alias("qi"),
        ).collect()
    }

    assert sum(r["n_docs"] for r in out.values()) == len(qi)
    assert set(out) == set(members)
    ties_broken = 0
    for cid, mids in members.items():
        best_q = max(qi[m] for m in mids)
        best_ids = [m for m in mids if qi[m] == best_q]
        if len(best_ids) > 1:
            ties_broken += 1
        r = out[cid]
        assert r["n_docs"] == len(mids)
        assert r["keep_doc_id"] == min(best_ids), (cid, mids)
        assert r["keep_quality"] == best_q / 1e6
    assert ties_broken > 0  # injected exact dups guarantee real ties
