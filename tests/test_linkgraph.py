"""PageRank vs an independent pure-Python model (not the SQL oracle
— a third implementation, so an error shared by the two query engines
would still be caught)."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _py_pagerank(ids):
    """Dict doc_id → rank after PR_ITERS integer iterations, written
    with plain dict/loops (no shared helper with the engine)."""
    from blackedge_ocr_spark.analysis import linkgraph as lg

    n = len(ids)
    idset = set(ids)
    edges = set()
    for s in ids:
        for d in (s % lg.PR_HUBS, (s * s + 1) % n, (s * 3 + 7) % n):
            if d != s and d in idset:
                edges.add((s, d))
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    r = {v: lg.NANO // n for v in ids}
    base = (15 * lg.NANO) // (100 * n)
    for _ in range(lg.PR_ITERS):
        s_in = {v: 0 for v in ids}
        for s, d in edges:
            s_in[d] += r[s] // od[s]
        r = {
            v: base + (lg.PR_DAMP_NUM * s_in[v]) // lg.PR_DAMP_DEN
            for v in ids
        }
    return r, od


def test_pagerank_matches_pure_python_model(spark):
    from blackedge_ocr_spark.analysis import linkgraph

    docs = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    )
    got = {
        r["doc_id"]: (r["out_deg"], r["rank"])
        for r in linkgraph.pagerank(docs).collect()
    }
    want_r, want_od = _py_pagerank(list(range(60)))
    assert len(got) == 60
    for v in range(60):
        assert got[v] == (want_od.get(v, 0), want_r[v]), v


def test_trustrank_seeds_and_decay(spark):
    """Trust starts and teleports only at seeds: a pure-Python model
    match like pagerank's, plus the decay property — every non-seed's
    rank comes only from flowed mass, so total non-seed rank is
    bounded by the damped flow (≤ 0.85 · total), while seeds retain
    the teleport floor."""
    from blackedge_ocr_spark.analysis import linkgraph as lg

    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    got = {
        r["doc_id"]: r["rank"] for r in lg.trustrank(docs).collect()
    }
    # independent model: same loops as _py_pagerank but seeded
    ids = list(range(60))
    n = len(ids)
    edges = set()
    for s in ids:
        for d in (s % lg.PR_HUBS, (s * s + 1) % n, (s * 3 + 7) % n):
            if d != s and d in set(ids):
                edges.add((s, d))
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    k = sum(1 for v in ids if v < lg.PR_HUBS)
    r = {v: (lg.NANO // k if v < lg.PR_HUBS else 0) for v in ids}
    for _ in range(lg.PR_ITERS):
        s_in = {v: 0 for v in ids}
        for s, d in edges:
            s_in[d] += r[s] // od[s]
        r = {
            v: ((15 * lg.NANO) // (100 * k) if v < lg.PR_HUBS else 0)
            + (lg.PR_DAMP_NUM * s_in[v]) // lg.PR_DAMP_DEN
            for v in ids
        }
    assert got == r
    non_seed = sum(v for d, v in got.items() if d >= lg.PR_HUBS)
    seed = sum(v for d, v in got.items() if d < lg.PR_HUBS)
    assert non_seed <= (85 * (seed + non_seed)) // 100
    assert seed >= (15 * lg.NANO) // 100  # teleport floor survives


def test_pagerank_plan_shape(spark):
    """Partition-alignment guarantee: one O(E) contribution gather
    per iteration plus the bounded staging/assembly joins — 7
    exchanges total at 3 iterations, with the whole edge+outdeg
    staging folded into ONE cache-build exchange. A regression that
    re-shuffles the rank table per pass (the shape before alignment:
    10 + 4) fails here, not in a review."""
    from blackedge_ocr_spark import plans
    from blackedge_ocr_spark.analysis import linkgraph

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pr = linkgraph.pagerank(docs)
    assert plans.count_exchanges(pr) == 7
    assert plans.count_cache_build_exchanges(pr) == 1


def test_pagerank_hubs_collect_rank(spark):
    """Hub nodes (doc_id < PR_HUBS) receive ~N/16 in-links each and
    must outrank the non-hub median; total mass stays within E·iters
    nano-units of 1.0 (floor-division bleed only ever loses mass)."""
    from blackedge_ocr_spark.analysis import linkgraph as lg

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    )
    rows = lg.pagerank(docs).collect()
    n = len(rows)
    hubs = [r["rank"] for r in rows if r["doc_id"] < lg.PR_HUBS]
    rest = sorted(r["rank"] for r in rows if r["doc_id"] >= lg.PR_HUBS)
    assert min(hubs) > rest[len(rest) // 2]
    total = sum(r["rank"] for r in rows)
    n_edges = sum(r["out_deg"] for r in rows)
    assert total <= lg.NANO
    assert total >= lg.NANO - (n_edges + n) * (lg.PR_ITERS + 1)


def _py_hits(ids, iters):
    """Dict doc_id → (authority, hub): independent integer HITS
    model (third implementation, same rationale as _py_pagerank)."""
    from blackedge_ocr_spark.analysis import linkgraph as lg

    n = len(ids)
    idset = set(ids)
    edges = set()
    for s in ids:
        for d in (s % lg.PR_HUBS, (s * s + 1) % n, (s * 3 + 7) % n):
            if d != s and d in idset:
                edges.add((s, d))

    def norm(x):
        m = max(x.values())
        d = max((m + lg.NANO - 1) // lg.NANO, 1)
        return {v: x[v] // d for v in x}

    h = {v: lg.NANO for v in ids}
    a = {}
    for _ in range(iters):
        a = {v: 0 for v in ids}
        for s, d in edges:
            a[d] += h[s]
        a = norm(a)
        h = {v: 0 for v in ids}
        for s, d in edges:
            h[s] += a[d]
        h = norm(h)
    return a, h


def test_hits_matches_pure_python_model(spark):
    from blackedge_ocr_spark.analysis import linkgraph

    docs = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    )
    got = {
        r["doc_id"]: (r["authority"], r["hub"])
        for r in linkgraph.hits(docs).collect()
    }
    want_a, want_h = _py_hits(list(range(60)), linkgraph.HITS_ITERS)
    assert len(got) == 60
    for v in range(60):
        assert got[v] == (want_a[v], want_h[v]), v
    # mutual reinforcement: some hub page (the in-degree head) must
    # hold the max authority, and max scores stay <= NANO
    top_auth = max(got, key=lambda v: got[v][0])
    assert top_auth < linkgraph.PR_HUBS
    assert max(s for s, _ in got.values()) <= linkgraph.NANO
    assert max(s for _, s in got.values()) <= linkgraph.NANO


def test_triangle_stats_matches_brute_force(spark):
    """Triangle census vs O(n^3) brute force on the 60-node staged
    graph — orientation must count each triangle exactly once."""
    from blackedge_ocr_spark.analysis import linkgraph as lg

    ids = list(range(60))
    n = len(ids)
    und = set()
    for s in ids:
        for d in (s % lg.PR_HUBS, (s * s + 1) % n, (s * 3 + 7) % n):
            if d != s:
                und.add((min(s, d), max(s, d)))
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tris = sum(
        1
        for i, a in enumerate(sorted(deg))
        for b in sorted(deg)[i + 1:]
        for c in sorted(deg)
        if c > b
        and (a, b) in und
        and (a, c) in und
        and (b, c) in und
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())

    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    row = lg.triangle_stats(docs).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(und)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tris
    import math

    assert row["clustering"] == math.floor(
        3 * tris / wedges * 1e6 + 0.5
    ) / 1e6


def test_label_propagation_matches_pure_python_model(spark):
    """Deterministic LPA vs an independent dict/loop model: adopt
    the most frequent neighbor label, ties to the smallest label."""
    from blackedge_ocr_spark.analysis import linkgraph as lg

    ids = list(range(60))
    n = len(ids)
    und = set()
    for s in ids:
        for d in (s % lg.PR_HUBS, (s * s + 1) % n, (s * 3 + 7) % n):
            if d != s:
                und.add((s, d)); und.add((d, s))
    lbl = {v: v for v in ids}
    for _ in range(lg.LPA_ITERS):
        cnt = {}
        for v, u in und:
            k = (v, lbl[u])
            cnt[k] = cnt.get(k, 0) + 1
        new = {}
        for v in ids:
            cands = [(c, l) for (vv, l), c in cnt.items() if vv == v]
            best = max(cands, key=lambda t: (t[0], -t[1]))
            new[v] = best[1]
        lbl = new
    sizes = {}
    for v in ids:
        sizes[lbl[v]] = sizes.get(lbl[v], 0) + 1

    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["label"], r["community_size"])
        for r in lg.label_propagation(docs).collect()
    }
    for v in ids:
        assert got[v] == (lbl[v], sizes[lbl[v]]), v
    # communities actually form: fewer labels than nodes
    assert len({l for l, _ in got.values()}) < len(ids)


def test_graph_ops_survive_ids_beyond_2_32(spark):
    """Regression for the packed-argmax corruption class: with node
    ids offset by 2^33 (reachable on replicated corpora), the
    componentwise (deg, id) orientation and the two-step LPA argmax
    must still match pure-Python models. Edges are injected — the
    staged quadratic map itself needs ids < ~3e9, documented."""
    from blackedge_ocr_spark.analysis import linkgraph as lg

    base = 1 << 33
    ids = [base + i for i in range(12)]
    # a triangle (0,1,2), a path 3-4-5, a hub 0 linked to all of 6..11
    raw = (
        [(ids[0], ids[1]), (ids[1], ids[2]), (ids[0], ids[2])]
        + [(ids[3], ids[4]), (ids[4], ids[5])]
        + [(ids[0], ids[k]) for k in range(6, 12)]
    )
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    edges = spark.createDataFrame(raw, "src long, dst long")

    row = lg.triangle_stats(docs, edges=edges).collect()[0]
    und = {(min(a, b), max(a, b)) for a, b in raw}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row["n_edges"] == len(und)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == 1  # exactly the (0,1,2) triangle

    got = {
        r["doc_id"]: r["label"]
        for r in lg.label_propagation(docs, edges=edges).collect()
    }
    # python model (same rule) on the same edge set
    und2 = set()
    for a, b in raw:
        und2.add((a, b)); und2.add((b, a))
    lbl = {v: v for v in ids}
    for _ in range(lg.LPA_ITERS):
        cnt = {}
        for v, u in und2:
            k = (v, lbl[u])
            cnt[k] = cnt.get(k, 0) + 1
        new = dict(lbl)
        for v in ids:
            cands = [(c, l) for (vv, l), c in cnt.items() if vv == v]
            if cands:
                new[v] = max(cands, key=lambda t: (t[0], -t[1]))[1]
        lbl = new
    assert got == lbl
