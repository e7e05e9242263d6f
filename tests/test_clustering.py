"""Deterministic k-means (operators/clustering.py, round 3)."""

import numpy as np


def test_kmeans_separates_obvious_clusters(spark):
    from palladian_spark.operators.clustering import kmeans_assign
    rng = np.random.RandomState(6)
    # two tight blobs far apart; ids interleaved so sample-init picks
    # one seed from each blob
    rows = []
    for i in range(60):
        center = 100.0 if i % 2 else -100.0
        rows.append((i, [float(center + x) for x in rng.randn(4)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(emb, k=2, n_iter=3).collect()}
    blob_a = {got[i] for i in range(0, 60, 2)}
    blob_b = {got[i] for i in range(1, 60, 2)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_kmeans_deterministic_across_partitionings(spark):
    from palladian_spark.operators.clustering import kmeans_assign
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(6)]) for i in range(200)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .repartition(29)
    ra = sorted((r["vec_id"], r["cluster"])
                for r in kmeans_assign(a, k=5, n_iter=3).collect())
    rb = sorted((r["vec_id"], r["cluster"])
                for r in kmeans_assign(b, k=5, n_iter=3).collect())
    assert ra == rb
