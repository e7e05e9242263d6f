"""Deterministic k-means clustering over embedding columns.

Spark ML's k-means|| is the production default elsewhere in this repo
(IVF ANN); this module is the ENGINE-PORTABLE variant for corpus
organization (topic bucketing, stratified sampling of training data):

  * init = the k lowest-id vectors ("sample" init — deterministic, no
    RNG), the same convention as the IVF contract quantizer;
  * assignment = argmin of squared euclidean distance, ties to the
    lowest centroid index (numpy argmin ≡ SQL (dist asc, cidx asc));
  * update = per-(cluster, dim) mean with decimal-exact component sums —
    the same order-independence trick as PageRank's contribution sums,
    so every iteration is bit-identical for any partitioning and an SQL
    oracle can replay the whole run;
  * empty clusters keep their previous centroid (documented choice).

Scale shape: centroids are MODEL-sized (k × dim, driver + broadcast);
assignment is one Arrow matmul-free pass; the update is one
posexplode + hash agg per iteration (k × dim result rows).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _assign_pass(src: DataFrame, centers: np.ndarray) -> DataFrame:
    """(id, cluster, vec) — nearest centroid by squared distance."""
    spark = src.sparkSession
    centers_bc = spark.sparkContext.broadcast(centers)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = centers_bc.value
        for pdf in it:
            vecs = np.array(list(pdf["vec"]), dtype=np.float64)
            d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(dtype=np.int64),
                "cluster": np.argmin(d, axis=1).astype(np.int32),
                "vec": pdf["vec"],
            })

    return src.mapInPandas(run, "id long, cluster int, "
                                "vec array<double>")


def kmeans_assign(embeddings: DataFrame, k: int = 8, n_iter: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, cluster) after ``n_iter`` Lloyd iterations from sample init."""
    src = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"))
    init_rows = src.orderBy("id").limit(k).collect()
    centers = np.array([r["vec"] for r in init_rows], dtype=np.float64)
    k = len(centers)

    assigned = _assign_pass(src, centers)
    for _ in range(n_iter - 1):
        # decimal-exact per-(cluster, dim) means → next centroid matrix
        dims = (assigned
                .select("cluster", F.posexplode("vec").alias("dim", "x"))
                .groupBy("cluster", "dim")
                .agg((F.sum(F.col("x").cast("decimal(38,18)"))
                      .cast("double") / F.count(F.lit(1))).alias("m"))
                .collect())
        new_centers = centers.copy()  # empty clusters keep position
        for r in dims:
            new_centers[r["cluster"], r["dim"]] = r["m"]
        centers = new_centers
        assigned = _assign_pass(src, centers)
    return assigned.select(F.col("id").alias(id_col), "cluster")
