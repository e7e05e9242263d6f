"""Similarity search over embedding columns.

Two families, both fully distributed (NO driver-side collect of the vector
table — the round-1 `collect()`+broadcast baseline could not survive the
10^9-vector scale this engine targets):

  * block_matmul_top_k / block_matmul_pairs — the EXACT path.  Vectors are
    packed into block rows (``pmod(id, B)`` → ``collect_list`` of ≤
    ``block_rows`` (id, vec) structs, sorted by id), the packed tables are
    cross-joined block-against-block, and each (query-block, cand-block)
    pair runs a chunked float64 matmul inside one Arrow task.  Per-block
    partial top-k rows are reduced to the global top-k with a window —
    union-of-partials provably contains the global top-k under the
    (-cos, id) ordering.  Cost is the inherent O(N·M) of exact all-pairs,
    but spread over B² independent tasks with O(block²) memory each; an
    explicit ``max_rows`` guard refuses inputs where exact search is the
    wrong tool and points at the LSH path.
  * lsh_bucketed_top_k / lsh_bucketed_pairs — the SCALE path.  ``n_tables``
    independent random-hyperplane signatures (banding for recall), with
    ``n_planes`` derived from N so the expected bucket size stays near
    ``target_bucket_rows`` instead of round 1's fixed 256 buckets.  The
    signature is computed in the same Arrow pass that carries the payload
    (no re-join with the vector table), exact scoring runs per
    (table, bucket) in row chunks (never an O(bucket²) matrix in memory),
    and per-table partials are deduped then window-reduced globally.

All paths use deterministic tie-breaking (rounded cosine desc, candidate
id asc) so results are reproducible across engines and partitionings.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

TOPK_SCHEMA = StructType([
    StructField("a_id", LongType()),
    StructField("b_id", LongType()),
    StructField("cos_sim", DoubleType()),
    StructField("rank", IntegerType()),
])

PARTIAL_SCHEMA = StructType([
    StructField("a_id", LongType()),
    StructField("b_id", LongType()),
    StructField("cos_sim", DoubleType()),
])

PAIRS_SCHEMA = PARTIAL_SCHEMA


def _unpack(pack) -> tuple[np.ndarray, np.ndarray]:
    """(ids, unit-normalized matrix) from a pack of {id, vec} structs.

    Packs are built with sort_array(collect_list(struct(id, vec))) so ids
    arrive ascending — downstream stable argsorts then break cosine ties
    by candidate id automatically.
    """
    ids = np.fromiter((e["id"] for e in pack), dtype=np.int64,
                      count=len(pack))
    mat = np.array([e["vec"] for e in pack], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _pack_blocks(df: DataFrame, id_col: str, vec_col: str,
                 n_blocks: int) -> DataFrame:
    """Pack vectors into n_blocks rows of (block, sorted [{id, vec}]).

    Block assignment hashes the id first — pmod on RAW ids lets strided
    or common-factor id spaces (sharded/snowflake ids) collapse into a
    few giant packs, breaking the O(block²) per-task memory bound.
    """
    entry = F.struct(F.col(id_col).cast("long").alias("id"),
                     F.col(vec_col).cast("array<double>").alias("vec"))
    return (df
            .select(F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
                    .cast("int").alias("block"), entry.alias("e"))
            .groupBy("block")
            .agg(F.sort_array(F.collect_list("e")).alias("pack")))


def _count_guard(embeddings: DataFrame, max_rows: int, op: str,
                 n_rows: int | None = None) -> int:
    n = embeddings.count() if n_rows is None else n_rows
    if max_rows is not None and n > max_rows:
        raise ValueError(
            f"{op}: {n} vectors exceeds max_rows={max_rows}. Exact all-pairs "
            "search at this size is the wrong tool — use lsh_bucketed_top_k/"
            "lsh_bucketed_pairs, or raise max_rows explicitly.")
    return n


class _PackCache:
    """Tiny per-task LRU so a block pack is unpacked once, not B times."""

    def __init__(self, cap: int = 16):
        self.cap = cap
        self.d: dict = {}

    def get(self, key, pack):
        hit = self.d.get(key)
        if hit is not None:
            return hit
        val = _unpack(pack)
        if len(self.d) >= self.cap:
            self.d.pop(next(iter(self.d)))
        self.d[key] = val
        return val


def _topk_partials(q_ids, q_unit, c_ids, c_unit, k, round_decimals,
                   chunk_rows):
    """Per-query top-k of this candidate block, chunked; yields dict cols."""
    for lo in range(0, len(q_ids), chunk_rows):
        hi = min(lo + chunk_rows, len(q_ids))
        sims = np.round(q_unit[lo:hi] @ c_unit.T, round_decimals)
        # stable argsort on -cos → ties resolved by ascending candidate id
        # (c_ids arrive sorted).  k+1 columns so dropping self still leaves k.
        take = min(k + 1, sims.shape[1])
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :take]
        a_out, b_out, s_out = [], [], []
        for i in range(hi - lo):
            a_id = q_ids[lo + i]
            kept = 0
            for j in idx[i]:
                b_id = c_ids[j]
                if b_id == a_id:
                    continue
                a_out.append(a_id)
                b_out.append(b_id)
                s_out.append(sims[i, j])
                kept += 1
                if kept == k:
                    break
        yield {"a_id": np.asarray(a_out, dtype=np.int64),
               "b_id": np.asarray(b_out, dtype=np.int64),
               "cos_sim": np.asarray(s_out, dtype=np.float64)}


def _global_top_k(partials: DataFrame, k: int) -> DataFrame:
    """Reduce per-block partial top-k rows to the global top-k + rank."""
    w = Window.partitionBy("a_id").orderBy(F.col("cos_sim").desc(),
                                           F.col("b_id").asc())
    return (partials
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("a_id", "b_id", "cos_sim",
                    F.col("rank").cast("int").alias("rank")))


def block_matmul_top_k(embeddings: DataFrame, k: int = 1,
                       round_decimals: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       block_rows: int = 4096, chunk_rows: int = 1024,
                       max_rows: int = 4_000_000,
                       n_rows: int | None = None) -> DataFrame:
    """Exact cosine top-k per vector (self excluded), fully distributed.

    Block-partitioned matmul: pack → crossJoin(B×B block pairs) → chunked
    matmul per pair → window reduce.  No vector ever touches the driver.
    ``n_rows`` lets callers that already counted skip the count job.
    """
    n = _count_guard(embeddings, max_rows, "block_matmul_top_k", n_rows)
    n_blocks = max(1, math.ceil(n / block_rows))
    packed = _pack_blocks(embeddings, id_col, vec_col, n_blocks)
    a = packed.select(F.col("block").alias("a_block"),
                      F.col("pack").alias("a_pack"))
    b = packed.select(F.col("block").alias("b_block"),
                      F.col("pack").alias("b_pack"))
    pairs = a.crossJoin(b)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache = _PackCache()
        for pdf in it:
            for row in pdf.itertuples(index=False):
                q_ids, q_unit = cache.get(("a", row.a_block), row.a_pack)
                c_ids, c_unit = cache.get(("b", row.b_block), row.b_pack)
                for cols in _topk_partials(q_ids, q_unit, c_ids, c_unit,
                                           k, round_decimals, chunk_rows):
                    yield pd.DataFrame(cols)

    partials = pairs.mapInPandas(run, PARTIAL_SCHEMA)
    return _global_top_k(partials, k)


def block_matmul_pairs(embeddings: DataFrame, threshold: float = 0.95,
                       round_decimals: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       block_rows: int = 4096, chunk_rows: int = 1024,
                       max_rows: int = 4_000_000,
                       n_rows: int | None = None) -> DataFrame:
    """All (a_id < b_id) pairs with cosine ≥ threshold, fully distributed.

    Same block shape as block_matmul_top_k but the crossJoin is restricted
    to a_block ≤ b_block (each unordered block pair scored once) and the
    kernel emits canonically-ordered thresholded pairs — no reduce needed.
    """
    n = _count_guard(embeddings, max_rows, "block_matmul_pairs", n_rows)
    n_blocks = max(1, math.ceil(n / block_rows))
    packed = _pack_blocks(embeddings, id_col, vec_col, n_blocks)
    a = packed.select(F.col("block").alias("a_block"),
                      F.col("pack").alias("a_pack"))
    b = packed.select(F.col("block").alias("b_block"),
                      F.col("pack").alias("b_pack"))
    pairs = a.crossJoin(b).where(F.col("a_block") <= F.col("b_block"))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache = _PackCache()
        for pdf in it:
            for row in pdf.itertuples(index=False):
                q_ids, q_unit = cache.get(("a", row.a_block), row.a_pack)
                c_ids, c_unit = cache.get(("b", row.b_block), row.b_pack)
                same = row.a_block == row.b_block
                for lo in range(0, len(q_ids), chunk_rows):
                    hi = min(lo + chunk_rows, len(q_ids))
                    sims = np.round(q_unit[lo:hi] @ c_unit.T, round_decimals)
                    keep = sims >= threshold
                    if same:
                        keep &= q_ids[lo:hi, None] < c_ids[None, :]
                    qi, cj = np.nonzero(keep)
                    lhs = q_ids[lo:hi][qi]
                    rhs = c_ids[cj]
                    yield pd.DataFrame({
                        "a_id": np.minimum(lhs, rhs),
                        "b_id": np.maximum(lhs, rhs),
                        "cos_sim": sims[qi, cj].astype(np.float64),
                    })

    return pairs.mapInPandas(run, PAIRS_SCHEMA)


# Backwards-compatible names: the "brute force" entry points now run the
# distributed block matmul (same results, same determinism, no collect()).
def brute_force_top_k(embeddings: DataFrame, k: int = 1,
                      round_decimals: int = 4,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding", **kw) -> DataFrame:
    """Exact cosine top-k per vector — alias of block_matmul_top_k."""
    return block_matmul_top_k(embeddings, k=k, round_decimals=round_decimals,
                              id_col=id_col, vec_col=vec_col, **kw)


def brute_force_pairs(embeddings: DataFrame, threshold: float = 0.95,
                      round_decimals: int = 4,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding", **kw) -> DataFrame:
    """Exact thresholded cosine pairs — alias of block_matmul_pairs."""
    return block_matmul_pairs(embeddings, threshold=threshold,
                              round_decimals=round_decimals,
                              id_col=id_col, vec_col=vec_col, **kw)


# ---------------------------------------------------------------------------
# LSH (approximate, the ≥10^7-vector path)
# ---------------------------------------------------------------------------

def _auto_planes(n: int, target_bucket_rows: int) -> int:
    """Bucket count that keeps the expected bucket near target size.

    2^planes ≈ N / target  →  planes = log2(N / target), clamped to [2, 24]
    (4 buckets minimum so tiny inputs still hash; 16M buckets is plenty —
    beyond that, raise target_bucket_rows instead).
    """
    return max(2, min(_MAX_PLANES, math.ceil(
        math.log2(max(n, 2) / max(target_bucket_rows, 1)))))


_MAX_PLANES = 24  # _auto_planes cap; also the stable plane-draw width


def _lsh_planes(seed: int, n_tables: int, n_planes: int,
                dim: int) -> np.ndarray:
    """Random hyperplanes as a STABLE PREFIX of a fixed-width draw.

    Drawing ``randn(n_tables, n_planes, dim)`` directly would make every
    table's planes depend on the *derived* n_planes (row-major fill), so
    the same seed would bucket differently at different N.  Drawing at the
    _MAX_PLANES cap and slicing keeps plane (t, j) identical for every
    n_planes ≤ 24 — which is what lets an external oracle replay the
    bucketing from (seed, dim) alone, without knowing N.
    """
    width = max(n_planes, _MAX_PLANES)
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, width, dim)[:, :n_planes, :]


def _lsh_bucketed(embeddings: DataFrame, n_planes, n_tables, seed,
                  id_col, vec_col, target_bucket_rows):
    """Shared front half: (table, bucket, id, vec) rows, one Arrow pass.

    The signature is computed in the SAME pass that carries the payload —
    no second join against the vector table (round 1 re-shuffled the full
    table to re-attach vectors to signatures).
    """
    spark = embeddings.sparkSession
    if n_planes is None:
        n_planes = _auto_planes(embeddings.count(), target_bucket_rows)
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    planes = _lsh_planes(seed, n_tables, n_planes, dim)
    planes_bc = spark.sparkContext.broadcast(planes)

    src = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"))

    sig_schema = StructType([
        StructField("table", IntegerType()),
        StructField("bucket", LongType()),
        StructField("id", LongType()),
        StructField("vec",
                    src.schema["vec"].dataType),
    ])

    def signature(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pls = planes_bc.value
        weights = 1 << np.arange(pls.shape[1])
        for pdf in it:
            vecs = np.array(list(pdf["vec"]), dtype=np.float64)
            for t in range(pls.shape[0]):
                bits = (vecs @ pls[t].T) > 0
                yield pd.DataFrame({
                    "table": np.full(len(pdf), t, dtype=np.int32),
                    "bucket": bits.dot(weights).astype(np.int64),
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "vec": pdf["vec"],
                })

    return src.mapInPandas(signature, sig_schema)


def lsh_bucketed_top_k(embeddings: DataFrame, k: int = 1,
                       n_planes: int | None = None, n_tables: int = 2,
                       seed: int = 42, round_decimals: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       target_bucket_rows: int = 4096,
                       chunk_rows: int = 1024) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH → chunked exact
    search per (table, bucket) → global window reduce.

    n_planes=None derives the bucket count from N (expected bucket ≈
    target_bucket_rows); n_tables > 1 is the banding that buys recall back.
    Within a bucket the scoring runs in ``chunk_rows`` query slices — the
    task never holds an O(bucket²) similarity matrix.
    """
    tagged = _lsh_bucketed(embeddings, n_planes, n_tables, seed,
                           id_col, vec_col, target_bucket_rows)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        unit = _unit(np.array(list(pdf["vec"].iloc[order]), dtype=np.float64))
        frames = [pd.DataFrame(cols) for cols in _topk_partials(
            ids, unit, ids, unit, k, round_decimals, chunk_rows)]
        if not frames:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []})
        return pd.concat(frames, ignore_index=True)

    partials = (tagged.groupBy("table", "bucket")
                .applyInPandas(per_bucket, PARTIAL_SCHEMA)
                # the same pair can surface from several tables with the
                # identical rounded cosine — dedupe before the reduce
                .dropDuplicates(["a_id", "b_id"]))
    return _global_top_k(partials, k)


def ivf_top_k(embeddings: DataFrame, k: int = 1,
              n_centroids: int | None = None, n_probe: int = 2,
              seed: int = 42, round_decimals: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding",
              chunk_rows: int = 1024, max_iter: int = 10,
              quantizer: str = "kmeans") -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer:
    k-means centroids partition the space, every vector lives in its
    nearest centroid's posting list, and each query probes its ``n_probe``
    nearest centroids — exact scoring only inside the probed lists.

    Distributed shape: the quantizer is Spark ML KMeans (k-means||); the
    centroid matrix is MODEL-sized (n_centroids × d) and broadcast, so
    assignment is one Arrow matmul pass emitting member + probe rows,
    scoring runs per centroid in ``chunk_rows`` slices, and partial
    top-ks reduce globally — the same window reduce as the exact path.
    n_centroids defaults to √N (the classic IVF sizing), so posting
    lists stay ~√N and total probed work is O(N·√N / lists) per query
    batch instead of O(N²).

    quantizer: "kmeans" (default) trains k-means|| — best posting-list
    balance, but its internal RNG is engine-specific.  "sample" takes the
    ``n_centroids`` lowest-id vectors as centroids — a cruder quantizer
    (affects recall only, never pair soundness: scoring inside probed
    lists is exact either way) whose assignment an external SQL oracle
    can replay exactly, which is how the driver's ann_ivf contract row is
    hash-verified end to end.
    """
    n = embeddings.count()
    if n_centroids is None:
        n_centroids = max(1, min(int(math.sqrt(n)), n))
    n_probe = min(n_probe, n_centroids)

    src = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"))
    if quantizer == "sample":
        # model-sized driver fetch (√N rows) — same footprint as the
        # k-means centroid matrix that gets broadcast either way
        rows = src.orderBy("id").limit(n_centroids).collect()
        centers = np.array([r["vec"] for r in rows], dtype=np.float64)
    elif quantizer == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = src.withColumn("_f", array_to_vector("vec"))
        model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter,
                       featuresCol="_f", predictionCol="_c").fit(feat)
        centers = np.array(model.clusterCenters(), dtype=np.float64)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    cnorm = np.linalg.norm(centers, axis=1)
    cnorm[cnorm == 0] = 1.0
    centers_bc = src.sparkSession.sparkContext.broadcast(
        centers / cnorm[:, None])

    tagged_schema = StructType([
        StructField("bucket", IntegerType()),
        StructField("role", IntegerType()),  # 0 = member, 1 = probing query
        StructField("id", LongType()),
        StructField("vec", src.schema["vec"].dataType),
    ])

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cu = centers_bc.value
        for pdf in it:
            unit = _unit(np.array(list(pdf["vec"]), dtype=np.float64))
            sims = unit @ cu.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            ids = pdf["id"].to_numpy(dtype=np.int64)
            frames = [pd.DataFrame({
                "bucket": order[:, 0].astype(np.int32),
                "role": np.zeros(len(ids), dtype=np.int32),
                "id": ids, "vec": pdf["vec"]})]
            for j in range(n_probe):
                frames.append(pd.DataFrame({
                    "bucket": order[:, j].astype(np.int32),
                    "role": np.ones(len(ids), dtype=np.int32),
                    "id": ids, "vec": pdf["vec"]}))
            yield pd.concat(frames, ignore_index=True)

    tagged = src.mapInPandas(assign, tagged_schema)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        members = pdf[pdf["role"] == 0]
        queries = pdf[pdf["role"] == 1]
        if members.empty or queries.empty:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []})
        m_ids = members["id"].to_numpy(dtype=np.int64)
        order = np.argsort(m_ids, kind="stable")
        m_ids = m_ids[order]
        m_unit = _unit(np.array(list(members["vec"].iloc[order]),
                                dtype=np.float64))
        q_ids = queries["id"].to_numpy(dtype=np.int64)
        q_unit = _unit(np.array(list(queries["vec"]), dtype=np.float64))
        frames = [pd.DataFrame(cols) for cols in _topk_partials(
            q_ids, q_unit, m_ids, m_unit, k, round_decimals, chunk_rows)]
        if not frames:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []})
        return pd.concat(frames, ignore_index=True)

    partials = (tagged.groupBy("bucket")
                .applyInPandas(per_bucket, PARTIAL_SCHEMA)
                # a pair found via several probed buckets has the same
                # rounded cosine — dedupe before the reduce
                .dropDuplicates(["a_id", "b_id"]))
    return _global_top_k(partials, k)


def lsh_bucketed_pairs(embeddings: DataFrame, threshold: float = 0.95,
                       n_planes: int | None = None, n_tables: int = 2,
                       seed: int = 42, round_decimals: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       target_bucket_rows: int = 4096,
                       chunk_rows: int = 1024) -> DataFrame:
    """Approximate thresholded near-dup pairs via the same LSH buckets."""
    tagged = _lsh_bucketed(embeddings, n_planes, n_tables, seed,
                           id_col, vec_col, target_bucket_rows)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        unit = _unit(np.array(list(pdf["vec"].iloc[order]), dtype=np.float64))
        frames = []
        for lo in range(0, len(ids), chunk_rows):
            hi = min(lo + chunk_rows, len(ids))
            sims = np.round(unit[lo:hi] @ unit.T, round_decimals)
            keep = (sims >= threshold) & (ids[lo:hi, None] < ids[None, :])
            qi, cj = np.nonzero(keep)
            frames.append(pd.DataFrame({
                "a_id": ids[lo:hi][qi], "b_id": ids[cj],
                "cos_sim": sims[qi, cj].astype(np.float64)}))
        if not frames:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []})
        return pd.concat(frames, ignore_index=True)

    return (tagged.groupBy("table", "bucket")
            .applyInPandas(per_bucket, PAIRS_SCHEMA)
            .dropDuplicates(["a_id", "b_id"]))
