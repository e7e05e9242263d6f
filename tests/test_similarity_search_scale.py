"""Scale-shape tests for the distributed similarity-search paths.

Round-2 contract (VERDICT.md next-round #1/#2): the exact path must not
materialize the vector table on the driver, and the LSH path must keep its
recall at a 10× larger table with N-derived bucket counts.
"""

import numpy as np
import pytest

from pyspark.sql import DataFrame


def _mk_emb(spark, n=300, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _np_top1(rows, round_decimals=4):
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = np.round(unit @ unit.T, round_decimals)
    out = {}
    for i, a in enumerate(ids):
        best, best_id = None, None
        for j, b in enumerate(ids):
            if a == b:
                continue
            s = sims[i, j]
            if best is None or s > best or (s == best and b < best_id):
                best, best_id = s, b
        out[int(a)] = (int(best_id), float(best))
    return out


def test_block_matmul_top1_matches_numpy(spark):
    from palladian_spark.operators.similarity_search import block_matmul_top_k
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(12)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # block_rows=32 forces 4 blocks → 16 block pairs; chunk_rows=16 forces
    # multiple chunks per pair — the reduce must still find the global top-1
    got = {r["a_id"]: (r["b_id"], r["cos_sim"])
           for r in block_matmul_top_k(emb, k=1, block_rows=32,
                                       chunk_rows=16).collect()}
    want = _np_top1(rows)
    assert got == want


def test_block_matmul_pairs_matches_numpy(spark):
    from palladian_spark.operators.similarity_search import block_matmul_pairs
    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a_id"], r["b_id"]): r["cos_sim"]
           for r in block_matmul_pairs(emb, threshold=0.3, block_rows=16,
                                       chunk_rows=8).collect()}
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = np.round(unit @ unit.T, 4)
    want = {(int(ids[i]), int(ids[j])): float(sims[i, j])
            for i in range(len(ids)) for j in range(len(ids))
            if ids[i] < ids[j] and sims[i, j] >= 0.3}
    assert got == want


def test_exact_path_never_collects_to_driver(spark, monkeypatch):
    """The scale contract: building AND running the exact search must not
    pull the vector table through DataFrame.collect/toPandas (the round-1
    implementation did exactly that at plan-build time)."""
    from palladian_spark.operators import similarity_search as ss
    emb = _mk_emb(spark, n=200)
    emb = emb.cache()
    emb.count()  # materialize before the trap

    def trap(self, *a, **kw):
        raise AssertionError("driver-side collect of a DataFrame during "
                             "exact similarity search")

    monkeypatch.setattr(DataFrame, "collect", trap)
    monkeypatch.setattr(DataFrame, "toPandas", trap)
    topk = ss.block_matmul_top_k(emb, k=1, block_rows=64)
    pairs = ss.block_matmul_pairs(emb, threshold=0.5, block_rows=64)
    assert topk.count() == 200
    assert pairs.count() >= 0
    emb.unpersist()


def test_exact_path_size_guard(spark):
    from palladian_spark.operators.similarity_search import block_matmul_top_k
    emb = _mk_emb(spark, n=50)
    with pytest.raises(ValueError, match="lsh_bucketed"):
        block_matmul_top_k(emb, k=1, max_rows=10)


def _clustered(spark, n_clusters, per_cluster, dim=32, seed=3):
    rng = np.random.RandomState(seed)
    rows, vid = [], 0
    for _ in range(n_clusters):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + 0.02 * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_recall_at_10x_with_auto_planes(spark):
    """VERDICT #2 done-criterion: recall-vs-exact holds at a 10× larger
    table (2000 vectors vs the round-1 200) with the bucket count DERIVED
    from N and multi-table banding."""
    from palladian_spark.operators.similarity_search import (
        block_matmul_top_k, lsh_bucketed_top_k)
    emb = _clustered(spark, n_clusters=200, per_cluster=10).cache()
    exact = {r["a_id"]: r["b_id"]
             for r in block_matmul_top_k(emb, k=1, block_rows=512).collect()}
    approx = {r["a_id"]: r["b_id"]
              for r in lsh_bucketed_top_k(emb, k=1, n_planes=None,
                                          n_tables=4,
                                          target_bucket_rows=128).collect()}
    assert len(approx) > 0.8 * len(exact)
    hits = sum(1 for a, b in approx.items() if exact.get(a) == b)
    assert hits / len(approx) > 0.5
    emb.unpersist()


def test_lsh_pairs_recall_on_clusters(spark):
    from palladian_spark.operators.similarity_search import (
        block_matmul_pairs, lsh_bucketed_pairs)
    emb = _clustered(spark, n_clusters=30, per_cluster=8).cache()
    exact = {(r["a_id"], r["b_id"])
             for r in block_matmul_pairs(emb, threshold=0.95).collect()}
    approx = {(r["a_id"], r["b_id"])
              for r in lsh_bucketed_pairs(emb, threshold=0.95, n_tables=4,
                                          target_bucket_rows=64).collect()}
    assert approx <= exact or all(p in exact for p in approx)  # no false pairs
    assert len(approx & exact) / max(len(exact), 1) > 0.5
    emb.unpersist()


def test_auto_planes_formula():
    from palladian_spark.operators.similarity_search import _auto_planes
    assert _auto_planes(500, 4096) == 2            # tiny input → min buckets
    assert _auto_planes(10**6, 4096) == 8          # 2^8 buckets of ~4k
    assert _auto_planes(10**9, 4096) == 18         # scales with N
    assert _auto_planes(10**12, 4096) == 24        # clamped


def test_ivf_recall_vs_exact(spark):
    """IVF coarse-quantizer ANN: on clustered data the probed posting
    lists must recover most true top-1 neighbors."""
    from palladian_spark.operators.similarity_search import (
        block_matmul_top_k, ivf_top_k)
    emb = _clustered(spark, n_clusters=40, per_cluster=10).cache()
    exact = {r["a_id"]: r["b_id"]
             for r in block_matmul_top_k(emb, k=1).collect()}
    approx = {r["a_id"]: r["b_id"]
              for r in ivf_top_k(emb, k=1, n_centroids=20,
                                 n_probe=3).collect()}
    assert len(approx) > 0.8 * len(exact)
    hits = sum(1 for a, b in approx.items() if exact.get(a) == b)
    assert hits / len(approx) > 0.5
    emb.unpersist()
