"""Entity linking & canonicalization.

The join shape follows the reference's location-extractor lookup
(PalladianLocationExtractor.java:85-103 + LocationExtractorUtils.normalizeName):
normalize the mention value, batch-lookup canonical records by lowercase
name, fan out candidates, prune by similarity, keep the top candidate
(HeuristicDisambiguation.java:42-120 ranking shape — our score is a string
similarity, not geo heuristics).

Scale design:
  * the canonical dictionary is small → **broadcast hash join** on the
    normalized key (exact hits never touch Python);
  * fuzzy fallback runs only over DISTINCT unmatched surface forms
    (typically ≪ mention count) in one Arrow-batched pandas UDF against the
    broadcast dictionary, then joins back — similarity work is O(distinct
    misses × dictionary), never O(mentions × dictionary);
  * per-mention top-1 = argmax inside the UDF (no extra shuffle).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, StringType, StructField, StructType,
)

from palladian_spark.textproc.similarity import METRICS


def normalize_surface(col):
    """lowercase + trim + collapse internal whitespace."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


_FUZZY_SCHEMA = StructType([
    StructField("value", StringType()),
    StructField("entity_id", StringType()),
    StructField("canonical", StringType()),
    StructField("concept", StringType()),
    StructField("link_sim", DoubleType()),
])


def fuzzy_link_df(values: DataFrame, entity_dict: DataFrame,
                  metric: str = "jaro_winkler",
                  threshold: float = 0.9) -> DataFrame:
    """Similarity-link a DataFrame of distinct surface ``value``s against
    the broadcast dictionary: one Arrow-batched pass, per-value argmax,
    O(values × dictionary) similarity calls total."""
    spark = values.sparkSession
    dict_rows: List[Tuple[str, str, str]] = [
        (r["entity_id"], r["surface"], r["concept"])
        for r in entity_dict.select("entity_id", "surface", "concept").collect()
    ]
    dict_bc = spark.sparkContext.broadcast(dict_rows)
    sim_fn = METRICS[metric]

    def fuzzy_match(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        entries = dict_bc.value
        for pdf in iterator:
            out = {k: [] for k in
                   ("value", "entity_id", "canonical", "concept", "link_sim")}
            for value in pdf["value"]:
                best, best_sim = None, threshold
                for entity_id, surface, concept in entries:
                    s = sim_fn(value, surface)
                    if s >= best_sim:
                        best, best_sim = (entity_id, surface, concept), s
                if best is not None:
                    out["value"].append(value)
                    out["entity_id"].append(best[0])
                    out["canonical"].append(best[1])
                    out["concept"].append(best[2])
                    out["link_sim"].append(best_sim)
            yield pd.DataFrame(out)

    return values.select("value").mapInPandas(fuzzy_match, _FUZZY_SCHEMA)


def link_mentions(mentions: DataFrame, entity_dict: DataFrame,
                  metric: str = "jaro_winkler",
                  threshold: float = 0.9,
                  fuzzy: bool = True) -> DataFrame:
    """Attach (entity_id, canonical, concept, link_sim) to each mention.

    ``entity_dict`` columns: (entity_id, surface, concept); surfaces are
    assumed canonical (aliases may appear as extra rows with the same
    entity_id).  Exact matches link with sim 1.0 JVM-side; remaining
    DISTINCT values go through the similarity metric with ``threshold``
    pruning.  Unlinked mentions keep null entity_id.
    """
    dict_norm = (entity_dict
                 .withColumn("_key", normalize_surface(F.col("surface")))
                 .select("_key",
                         F.col("entity_id").alias("_entity_id"),
                         F.col("surface").alias("_canonical"),
                         F.col("concept").alias("_concept")))

    with_key = mentions.withColumn("_key", normalize_surface(F.col("value")))
    exact = (with_key
             .join(F.broadcast(dict_norm), "_key", "left")
             .withColumn("link_sim",
                         F.when(F.col("_entity_id").isNotNull(), F.lit(1.0))))

    if not fuzzy:
        return (exact
                .withColumnRenamed("_entity_id", "entity_id")
                .withColumnRenamed("_canonical", "canonical")
                .withColumnRenamed("_concept", "concept")
                .drop("_key"))

    # fuzzy pass over distinct unmatched surface forms only
    misses = (exact.where(F.col("_entity_id").isNull())
              .select("value").distinct())
    fuzzy_links = fuzzy_link_df(misses, entity_dict, metric, threshold)

    resolved = (exact
                .join(F.broadcast(fuzzy_links
                                  .withColumnRenamed("entity_id", "_f_entity_id")
                                  .withColumnRenamed("canonical", "_f_canonical")
                                  .withColumnRenamed("concept", "_f_concept")
                                  .withColumnRenamed("link_sim", "_f_sim")),
                      "value", "left")
                .withColumn("entity_id", F.coalesce("_entity_id", "_f_entity_id"))
                .withColumn("canonical", F.coalesce("_canonical", "_f_canonical"))
                .withColumn("concept", F.coalesce("_concept", "_f_concept"))
                .withColumn("link_sim", F.coalesce("link_sim", "_f_sim"))
                .drop("_key", "_entity_id", "_canonical", "_concept",
                      "_f_entity_id", "_f_canonical", "_f_concept", "_f_sim"))
    return resolved


def similarity_join(left: DataFrame, right: DataFrame,
                    left_col: str, right_col: str,
                    metric: str = "jaro_winkler",
                    threshold: float = 0.9) -> DataFrame:
    """Generic broadcast similarity join: pairs (left_col, right_col, sim)
    with sim ≥ threshold.  Right side must be broadcast-small."""
    rows = [r[0] for r in right.select(right_col).distinct().collect()]
    bc = left.sparkSession.sparkContext.broadcast(rows)
    sim_fn = METRICS[metric]

    schema = StructType([
        StructField("left_value", StringType()),
        StructField("right_value", StringType()),
        StructField("sim", DoubleType()),
    ])

    def matcher(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        candidates = bc.value
        for pdf in iterator:
            out = {"left_value": [], "right_value": [], "sim": []}
            for value in pdf[left_col]:
                for cand in candidates:
                    s = sim_fn(value, cand)
                    if s >= threshold:
                        out["left_value"].append(value)
                        out["right_value"].append(cand)
                        out["sim"].append(s)
            yield pd.DataFrame(out)

    return left.select(left_col).distinct().mapInPandas(matcher, schema)
