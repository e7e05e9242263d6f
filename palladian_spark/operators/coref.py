"""Coreference-lite: pronoun → nearest-preceding-mention resolution.

Beyond-the-reference recall lift for KG construction (the reference's
NER stops at named mentions; pronouns between them drop their triples —
SURVEY.md §2.5): resolve each pronoun in a conversation to the NEAREST
PRECEDING entity mention of a compatible type, under the stable
(turn_idx, start) document order the north rule mandates.

Algorithm (the union-sweep shape of operators/temporal.asof_join — one
shuffle, NO mention×pronoun join): union mentions (antecedent events)
and type-exploded pronouns (query events) per (conv_id, tag), sort by
(turn_idx, start, kind) — pronouns sort BEFORE mentions at the same
position, so a mention at the pronoun's own offset never matches — and
sweep a last-non-null window.  A final max_by across the pronoun's
compatible tags picks the globally nearest antecedent (ties at the same
position broken by mention value — deterministic).

Scale notes: linear per (conv, tag) partition after one Exchange; hot
conversations skew exactly like sessionization (AQE handles it).  No
collects, no UDFs — pure codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: pronoun → compatible mention tags (the PER/ORG/LOC concept space of
#: the canonical entity dictionary).
DEFAULT_COMPAT = {
    "he": ["PER"], "she": ["PER"], "him": ["PER"], "her": ["PER"],
    "they": ["PER", "ORG"], "them": ["PER", "ORG"],
    "it": ["ORG", "LOC"], "there": ["LOC"],
}


def resolve_pronouns(mentions: DataFrame, pronouns: DataFrame,
                     compat: dict[str, list[str]] | None = None
                     ) -> DataFrame:
    """Resolve pronouns to their nearest preceding compatible mention.

    ``mentions``: (conv_id, turn_idx, start, value, tag) entity mentions.
    ``pronouns``: (conv_id, turn_idx, start, pronoun) pronoun sites.
    Output: one row per distinct pronoun site — (conv_id, turn_idx,
    start, pronoun, antecedent, ant_turn, ant_start), antecedent NULL
    when no compatible mention strictly precedes."""
    compat = DEFAULT_COMPAT if compat is None else compat
    compat_rows = [(p, t) for p, tags in compat.items() for t in tags]
    compat_df = mentions.sparkSession.createDataFrame(
        compat_rows, ["pronoun", "tag"])

    m = (mentions.select("conv_id", "turn_idx", "start", "value", "tag")
         .distinct()
         .select("conv_id", "tag", "turn_idx", "start",
                 F.lit(1).alias("kind"), "value",
                 F.lit(None).cast("string").alias("pronoun")))
    p = (pronouns.select("conv_id", "turn_idx", "start", "pronoun")
         .distinct()
         .join(F.broadcast(compat_df), "pronoun")
         .select("conv_id", "tag", "turn_idx", "start",
                 F.lit(0).alias("kind"),
                 F.lit(None).cast("string").alias("value"), "pronoun"))

    w = (Window.partitionBy("conv_id", "tag")
         .orderBy("turn_idx", "start", "kind", "value")
         .rowsBetween(Window.unboundedPreceding, -1))
    swept = (m.unionByName(p)
             .withColumn("antecedent", F.last("value", True).over(w))
             .withColumn("ant_turn",
                         F.last(F.when(F.col("kind") == 1,
                                       F.col("turn_idx")), True).over(w))
             .withColumn("ant_start",
                         F.last(F.when(F.col("kind") == 1,
                                       F.col("start")), True).over(w))
             .where(F.col("kind") == 0))
    # Across the pronoun's compatible tags, keep the nearest (max
    # position) antecedent; NULL-antecedent rows lose to any resolved one.
    best = F.expr(
        "max_by(struct(antecedent, ant_turn, ant_start), "
        "struct(coalesce(ant_turn, -1), coalesce(ant_start, -1), "
        "antecedent))").alias("best")
    return (swept.groupBy("conv_id", "turn_idx", "start", "pronoun")
            .agg(best)
            .select("conv_id", "turn_idx", "start", "pronoun",
                    F.col("best.antecedent").alias("antecedent"),
                    F.col("best.ant_turn").alias("ant_turn"),
                    F.col("best.ant_start").alias("ant_start")))
