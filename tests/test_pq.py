"""Product quantization: codebook shapes, reconstruction scoring
semantics, determinism, and the recall row."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_pq_codebooks_shapes_and_subspaces(spark):
    from blackedge_ocr_spark.analysis import ann

    books, n, sub = ann.pq_codebooks(spark, SF)
    assert len(books) == ann.PQ_M
    assert sub * ann.PQ_M == 64
    for cids, Cm in books:
        # seeds = every stride-th vec_id; codebooks non-empty, cid-sorted
        assert len(cids) > 1 and list(cids) == sorted(cids)
        assert Cm.shape == (len(cids), sub)


def test_pq_topk_contract_shape_and_determinism(spark):
    from blackedge_ocr_spark.analysis import ann

    a = ann.pq_topk(spark, SF).collect()
    b = ann.pq_topk(spark, SF).collect()
    # bit-reproducible end to end (fixed-point Lloyd + ordered folds)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_q: dict = {}
    for r in a:
        by_q.setdefault(r["q_id"], []).append(r)
        assert r["neighbor_id"] != r["q_id"]
        assert -1.000001 <= r["cos"] <= 1.000001
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )


def test_pq_exact_neighbors_when_corpus_is_its_own_codebook(spark):
    """If every corpus vector coincides with a codebook centroid in
    every subspace, PQ must recover the exact neighbor SET: 5 distinct
    vector values laid out as vec_id % 5 (coprime with TRAIN_EVERY=4
    and the stride 37, so the training sample sees all five and the
    seeds at 0/37/74/111/148 cover all five), each cluster a k-means
    fixed point. Reconstruction sits on the 1e-6 quantization grid,
    so cos VALUES may differ in the last rounded decimal — but
    identical vectors reconstruct identically, ties break by
    neighbor_id on both sides, and the chosen neighbors must agree
    exactly."""
    import numpy as np

    from blackedge_ocr_spark.analysis import ann

    rng = np.random.default_rng(7)
    seeds = rng.normal(size=(5, 64)).round(3)
    rows = [
        (i, [float(x) for x in seeds[i % 5]]) for i in range(0, 150)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.select(
            "vec_id",
            df.v.cast("array<float>").alias("embedding"),
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        exact = {
            (r["q_id"], r["neighbor_id"])
            for r in ann.brute_force_topk(spark, td).collect()
        }
        pq = {
            (r["q_id"], r["neighbor_id"])
            for r in ann.pq_topk(spark, td).collect()
        }
        books, _n, _sub = ann.pq_codebooks(spark, td)
    # all five values survive as centroids in every subspace
    assert all(len(cids) == 5 for cids, _ in books)
    assert pq == exact and len(pq) > 0
