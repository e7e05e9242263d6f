"""Cross-document entity-surface canonicalization.

The north-rule shape: after mention detection, the SAME real-world entity
shows up under many surface forms ("Dr. J. Smith" / "J Smith" / "Smith,
J."), and linking only resolves surfaces the canonical dictionary already
knows.  This module clusters the *remaining* surfaces among themselves —
the Palladian string-similarity toolkit (CharacterNGramSimilarity.java:
50-85 Dice semantics, same as textproc/similarity.char_ngram_similarity)
composed with the repo's connected-components machinery — and picks one
canonical representative per cluster:

  1. aggregate mentions → DISTINCT (block, surface) + frequency.  This is
     the scale move: clustering runs on |distinct surfaces|, never on
     |mentions| (at 10^12 turns the distinct-surface table is millions,
     not trillions, and the agg is map-side combinable).
  2. char-n-gram Dice pairs within a block (entity type, language, …) —
     gram arrays materialized and int-hashed ONCE per surface before the
     join; length-band pruning sound for the threshold (3·min ≥ max ⟸
     dice ≥ 0.5; generally (2−t)·min ≥ t·max).  Blocks bound the join
     fan-out; for corpora where a block is still huge, feed the surfaces
     through the LSH banding in operators/dedup.py first — same
     composition, sub-quadratic blocking.
  3. connected components over the pair graph (large-star/small-star,
     graph.connected_components_star — O(log n) rounds, safe for the
     deep chains transitive fuzzy links build).
  4. representative per cluster: highest total mention frequency, ties →
     lexicographically smallest surface.  Deterministic and replayable
     in plain SQL, so the whole composition has ONE end-to-end oracle.

Everything is Catalyst expressions + the components loop; no Python rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from palladian_spark.graph import connected_components_star

_SEP = ""  # unit separator — never in natural-language surfaces


def _gram_hashes(col, n: int):
    """Distinct char-n-grams of '#'-padded lowercase text, xxhash64-ed to
    int64 (CharacterNGramSimilarity padding semantics; int compare in the
    per-pair intersection, strings only built once per surface)."""
    pad = "#" * (n - 1)
    padded = F.concat(F.lit(pad), F.lower(col), F.lit(pad))
    idx = F.sequence(F.lit(1), F.length(padded) - (n - 1))
    grams = F.array_distinct(
        F.transform(idx, lambda i: padded.substr(i, F.lit(n))))
    return F.transform(grams, lambda s: F.xxhash64(s))


def surface_dice_pairs(surfaces: DataFrame, text_col: str = "surface",
                       block_cols: Sequence[str] = (),
                       threshold: float = 0.6, n: int = 3) -> DataFrame:
    """All within-block surface pairs with char-n-gram Dice ≥ threshold.
    Input must be distinct on (block_cols, text_col).  Output:
    (*block_cols, a_surface, b_surface, dice_sim) with a < b."""
    blocks = list(block_cols)
    gexpr = _gram_hashes(F.col(text_col), n)
    g = surfaces.select(*blocks, F.col(text_col).alias("_s"),
                        gexpr.alias("_g"), F.size(gexpr).alias("_n"))
    a = g.select(*blocks, F.col("_s").alias("a_surface"),
                 F.col("_g").alias("_ag"), F.col("_n").alias("_an"))
    b = g.select(*blocks, F.col("_s").alias("b_surface"),
                 F.col("_g").alias("_bg"), F.col("_n").alias("_bn"))
    # sound band for dice ≥ t: |A∩B| ≤ min ⇒ t ≤ 2·min/(min+max)
    # ⟺ (2−t)·min ≥ t·max.  Scaled by 1e6 to stay integral.
    t6 = int(round(threshold * 1_000_000))
    band = ((2_000_000 - t6) * F.least("_an", "_bn")
            >= t6 * F.greatest("_an", "_bn"))
    cond = F.col("a_surface") < F.col("b_surface")
    pairs = a.join(b, on=blocks) if blocks else a.crossJoin(b)
    dice = F.round(2.0 * F.size(F.array_intersect("_ag", "_bg"))
                   / (F.col("_an") + F.col("_bn")), 6)
    return (pairs.where(cond & band)
            .select(*blocks, "a_surface", "b_surface",
                    dice.alias("dice_sim"))
            .where(F.col("dice_sim") >= threshold))


def canonicalize_surfaces(mentions: DataFrame, text_col: str = "surface",
                          block_cols: Sequence[str] = (),
                          threshold: float = 0.6, n: int = 3) -> DataFrame:
    """Full canonicalization: mention rows → per-surface canonical form.

    Output: (*block_cols, surface, canonical, freq, cluster_size) — one
    row per distinct (block, surface); ``canonical`` is the cluster
    representative (max total frequency, ties → min surface),
    ``cluster_size`` the number of distinct surfaces in the cluster.
    """
    blocks = list(block_cols)
    surfaces = (mentions.groupBy(*blocks, text_col)
                .agg(F.count("*").alias("freq"))
                .withColumnRenamed(text_col, "surface"))

    pairs = surface_dice_pairs(surfaces, "surface", blocks, threshold, n)
    key = lambda c: F.concat_ws(_SEP, *blocks, c)  # noqa: E731
    edges = pairs.select(key("a_surface").alias("a_key"),
                         key("b_surface").alias("b_key"))
    labels = connected_components_star(edges, "a_key", "b_key")

    keyed = surfaces.withColumn("_key", key(F.col("surface")))
    labeled = (keyed.join(labels, keyed["_key"] == labels["node"], "left")
               .select(*blocks, "surface", "freq",
                       F.coalesce("component", "_key").alias("_comp")))

    best_freq = labeled.groupBy("_comp").agg(
        F.max("freq").alias("_best_freq"),
        F.count("*").alias("cluster_size"))
    rep = (labeled.join(best_freq, "_comp")
           .where(F.col("freq") == F.col("_best_freq"))
           .groupBy("_comp")
           .agg(F.min("surface").alias("canonical")))
    return (labeled.join(best_freq, "_comp").join(rep, "_comp")
            .select(*blocks, "surface", "canonical", "freq",
                    "cluster_size"))
