"""Similarity search over embedding columns.

  * brute_force_top_k — the exact baseline: candidate matrix broadcast once,
    each Arrow batch of query vectors does one float64 matmul against it.
    O(N·M) flops but zero shuffle and SIMD-bound; at cluster scale the
    candidate side is what must fit in executor memory (for 10^8+ candidates
    switch to the LSH variant below).
  * lsh_bucketed_top_k — the scale path: random-hyperplane signatures put
    near vectors into shared buckets; the exact top-k runs per bucket, so
    cost drops from O(N·M) to O(Σ bucket²) at a recall trade-off.

Both use deterministic tie-breaking (rounded cosine desc, candidate id asc)
so results are reproducible across engines and partitionings.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

TOPK_SCHEMA = StructType([
    StructField("a_id", LongType()),
    StructField("b_id", LongType()),
    StructField("cos_sim", DoubleType()),
    StructField("rank", IntegerType()),
])


def brute_force_top_k(embeddings: DataFrame, k: int = 1,
                      round_decimals: int = 4,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per vector (self excluded)."""
    spark = embeddings.sparkSession
    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, unit))

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cand_ids, cand_unit = bc.value
        # order candidates by id for deterministic ties
        order = np.argsort(cand_ids, kind="stable")
        cand_ids = cand_ids[order]
        cand_unit = cand_unit[order]
        for pdf in iterator:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            sims = (q / qn[:, None]) @ cand_unit.T
            sims = np.round(sims, round_decimals)
            out = {"a_id": [], "b_id": [], "cos_sim": [], "rank": []}
            for i, a_id in enumerate(q_ids):
                row = sims[i]
                mask = cand_ids != a_id
                # sort by (-cos, id): ids already ascending & stable sort
                idx = np.argsort(-row[mask], kind="stable")[:k]
                sel_ids = cand_ids[mask][idx]
                sel_sims = row[mask][idx]
                for rank, (b_id, s) in enumerate(zip(sel_ids, sel_sims), 1):
                    out["a_id"].append(int(a_id))
                    out["b_id"].append(int(b_id))
                    out["cos_sim"].append(float(s))
                    out["rank"].append(rank)
            yield pd.DataFrame(out)

    return embeddings.select(id_col, vec_col).mapInPandas(run, TOPK_SCHEMA)


PAIRS_SCHEMA = StructType([
    StructField("a_id", LongType()),
    StructField("b_id", LongType()),
    StructField("cos_sim", DoubleType()),
])


def brute_force_pairs(embeddings: DataFrame, threshold: float = 0.95,
                      round_decimals: int = 4,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """All (a_id < b_id) pairs with cosine ≥ threshold — the embedding
    near-dup primitive.  Same broadcast-matrix shape as brute_force_top_k:
    one float64 matmul per Arrow batch, thresholded rows emitted sparsely,
    no pairwise cross join ever materializes."""
    spark = embeddings.sparkSession
    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, unit))

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cand_ids, cand_unit = bc.value
        for pdf in iterator:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            sims = np.round((q / qn[:, None]) @ cand_unit.T, round_decimals)
            # keep upper triangle (a_id < b_id) at/above threshold
            keep = (sims >= threshold) & (q_ids[:, None] < cand_ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame({
                "a_id": q_ids[ai].astype(np.int64),
                "b_id": cand_ids[bj].astype(np.int64),
                "cos_sim": sims[ai, bj].astype(np.float64),
            })

    return embeddings.select(id_col, vec_col).mapInPandas(run, PAIRS_SCHEMA)


def lsh_bucketed_top_k(embeddings: DataFrame, k: int = 1, n_planes: int = 8,
                       seed: int = 42, round_decimals: int = 4,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets → exact search per
    bucket (shuffle on the bucket key; each bucket fits one task)."""
    spark = embeddings.sparkSession
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    planes_bc = spark.sparkContext.broadcast(planes)

    sig_schema = StructType([
        StructField("bucket", LongType()),
        StructField("vid", LongType()),
    ])

    def signature(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = planes_bc.value
        for pdf in iterator:
            vecs = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (vecs @ pl.T) > 0
            buckets = bits.dot(1 << np.arange(bits.shape[1])).astype(np.int64)
            yield pd.DataFrame({"bucket": buckets,
                                "vid": pdf[id_col].to_numpy(dtype=np.int64)})

    sigs = embeddings.select(id_col, vec_col).mapInPandas(signature, sig_schema)
    with_bucket = embeddings.join(
        sigs, embeddings[id_col] == sigs["vid"]).drop("vid")

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        order = np.argsort(ids, kind="stable")
        ids, unit = ids[order], unit[order]
        sims = np.round(unit @ unit.T, round_decimals)
        out = {"a_id": [], "b_id": [], "cos_sim": [], "rank": []}
        for i, a_id in enumerate(ids):
            mask = ids != a_id
            idx = np.argsort(-sims[i][mask], kind="stable")[:k]
            for rank, j in enumerate(idx, 1):
                out["a_id"].append(int(a_id))
                out["b_id"].append(int(ids[mask][j]))
                out["cos_sim"].append(float(sims[i][mask][j]))
                out["rank"].append(rank)
        return pd.DataFrame(out)

    return with_bucket.groupBy("bucket").applyInPandas(per_bucket, TOPK_SCHEMA)
