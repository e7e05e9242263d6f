"""Blocked entity-resolution: block → match → cluster → canonical id.

The canonicalization stage a KG-construction pipeline runs over its raw
surface-form inventory before linking: candidate pairs come from cheap
blocking (first normalized token), survive a *sound* length-band prune,
are scored with the Palladian similarity toolkit re-expressed as Catalyst
expressions (LevenshteinSimilarity.java:24-37 → ``F.levenshtein``;
CharacterNGramSimilarity.java:50-85 → padded char-3-gram Dice), and the
match graph is collapsed with min-label connected components so every
record gets a canonical id.

Scale notes (100 TB): blocking bounds the join to within-block pairs (no
all-pairs anywhere); per-record profiles (normalized name, hashed gram
array, lengths) are materialized ONCE before the self-join so Catalyst
cannot recompute them per pair; grams are xxhash64-hashed so the per-pair
intersection compares int64s, not strings; the band prune is computed
from lengths alone, so pruned pairs never materialize an intersection.
Skewed blocks (a hot first token) are the LSH hot-bucket problem — cap
or salt via the same pattern as similarity_search._emit_salted if a
corpus needs it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from palladian_spark.graph import connected_components
from palladian_spark.linking import normalize_surface


def _profiles(records: DataFrame, id_col: str, name_col: str,
              block_col: Optional[str]) -> DataFrame:
    """Per-record match profile, computed once (pre-join): normalized
    name, its length, the hashed distinct char-3-gram array ('##'-padded
    per CharacterNGramSimilarity.java:50-85), gram count, and the block
    key (first normalized token, optionally refined by ``block_col``)."""
    norm = normalize_surface(F.col(name_col))
    padded = F.concat(F.lit("##"), norm, F.lit("##"))
    idx = F.sequence(F.lit(1), F.length(padded) - 2)
    gexpr = F.array_distinct(
        F.transform(idx, lambda i: padded.substr(i, F.lit(3))))
    block = F.split(norm, " ")[0]
    if block_col is not None:
        block = F.concat_ws("|", F.col(block_col), block)
    return records.select(
        F.col(id_col).alias("rec_id"),
        norm.alias("lname"),
        F.length(norm).alias("nlen"),
        F.transform(gexpr, lambda s: F.xxhash64(s)).alias("grams"),
        F.size(gexpr).alias("n_grams"),
        block.alias("block"))


def blocked_match_pairs(records: DataFrame, id_col: str = "rec_id",
                        name_col: str = "name",
                        block_col: Optional[str] = None,
                        threshold: float = 0.7,
                        w_lev: float = 0.5,
                        w_dice: float = 0.5) -> DataFrame:
    """Match pairs (a_id, b_id, lev_sim, dice_sim, score) with
    score = w_lev·levenshtein_sim + w_dice·dice_sim ≥ ``threshold``,
    candidates restricted to records sharing a block key.

    The pre-intersection prune is sound for any threshold: Levenshtein
    distance ≥ the length difference gives lev_sim ≤ min/max length, and
    |A∩B| ≤ min gram count gives dice ≤ 2·min/(na+nb); a pair whose
    weighted upper bound misses the threshold can never pass the exact
    filter, so it is dropped before any per-pair work.
    """
    prof = _profiles(records, id_col, name_col, block_col)
    a = prof.select(*(F.col(c).alias(f"a_{c}") for c in prof.columns))
    b = prof.select(*(F.col(c).alias(f"b_{c}") for c in prof.columns))

    lev_ub = F.least("a_nlen", "b_nlen") / F.greatest("a_nlen", "b_nlen")
    dice_ub = (2.0 * F.least("a_n_grams", "b_n_grams")
               / (F.col("a_n_grams") + F.col("b_n_grams")))
    band = (F.lit(w_lev) * lev_ub + F.lit(w_dice) * dice_ub) >= threshold

    pairs = a.join(b, (F.col("a_block") == F.col("b_block"))
                   & (F.col("a_rec_id") < F.col("b_rec_id")) & band)

    lev = (F.lit(1.0) - F.levenshtein("a_lname", "b_lname")
           / F.greatest("a_nlen", "b_nlen"))
    inter = F.size(F.array_intersect("a_grams", "b_grams"))
    dice = (F.when(F.col("a_lname") == F.col("b_lname"), F.lit(1.0))
            .otherwise(2.0 * inter
                       / (F.col("a_n_grams") + F.col("b_n_grams"))))
    score = F.round(F.lit(w_lev) * lev + F.lit(w_dice) * dice, 6)
    return (pairs.select(F.col("a_rec_id").alias("a_id"),
                         F.col("b_rec_id").alias("b_id"),
                         F.round(lev, 6).alias("lev_sim"),
                         F.round(dice, 6).alias("dice_sim"),
                         score.alias("score"))
            .where(F.col("score") >= threshold))


def resolve_entities(records: DataFrame, id_col: str = "rec_id",
                     name_col: str = "name",
                     pairs: Optional[DataFrame] = None,
                     block_col: Optional[str] = None,
                     threshold: float = 0.7,
                     checkpoint_dir: Optional[str] = None) -> DataFrame:
    """Full ER: every record labeled with its canonical id (the minimum
    rec_id reachable through the ≥-threshold match graph; unmatched
    records canonicalize to themselves) plus the cluster size.

    Returns (rec_id, canonical_id, cluster_size) — one row per input
    record, so downstream joins replace surface ids 1:1.
    """
    if pairs is None:
        pairs = blocked_match_pairs(records, id_col=id_col,
                                    name_col=name_col, block_col=block_col,
                                    threshold=threshold)
    comp = connected_components(pairs.select("a_id", "b_id"),
                                checkpoint_dir=checkpoint_dir)
    labeled = (records.select(F.col(id_col).alias("rec_id"))
               .join(comp, F.col("rec_id") == comp.node, "left")
               .select("rec_id",
                       F.coalesce("component", F.col("rec_id"))
                       .alias("canonical_id")))
    sizes = (labeled.groupBy("canonical_id")
             .agg(F.count(F.lit(1)).cast("long").alias("cluster_size")))
    return labeled.join(sizes, "canonical_id") \
        .select("rec_id", "canonical_id", "cluster_size")
