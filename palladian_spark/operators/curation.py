"""End-to-end corpus curation — the composed training-data pipeline.

The individual operators (quality scoring, exact dedup, MinHash/LSH
near-dup pairs, connected components) each answer one question;
curation is their COMPOSITION in the order a 100 TB pipeline runs them,
cheapest-first so each stage shrinks the next one's input:

  1. quality gate       — per-row codegen expressions, no shuffle;
  2. exact dedup        — keep the min-id document per md5(text)
                          fingerprint (one window over the hash);
  3. near-dup clusters  — MinHash → LSH pairs → connected components on
                          the SURVIVORS ONLY; each cluster keeps its
                          min-id representative (the component label IS
                          the min reachable id, so "representative" =
                          node == component — no extra aggregation).

Everything stays relational/deterministic, so the whole composition is
verified end-to-end by one SQL oracle (curate_corpus contract query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def curate_corpus(docs: DataFrame, min_quality: float = 0.3,
                  near_dup_threshold: float = 0.2,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, quality) of the documents that survive all three gates."""
    from palladian_spark.graph import connected_components
    from palladian_spark.operators.dedup import minhash_dedup_pairs
    from palladian_spark.operators.text_quality import quality_scores

    q = quality_scores(docs, id_col=id_col, text_col=text_col) \
        .select(id_col, "quality")
    good = (docs.select(id_col, text_col)
            .join(q, id_col)
            .where(F.col("quality") >= min_quality))

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    surv1 = (good.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn"))

    pairs = minhash_dedup_pairs(surv1, threshold=near_dup_threshold,
                                id_col=id_col, text_col=text_col)
    comp = connected_components(pairs, src_col="a_id", dst_col="b_id")
    drop = comp.where(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_col))
    return (surv1.join(drop, id_col, "left_anti")
            .select(id_col, "quality"))


def curate_corpus_full(docs: DataFrame, min_quality: float = 0.3,
                       near_dup_threshold: float = 0.2,
                       max_dup_token_frac: float = 0.65,
                       max_top_token_frac: float = 0.2,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """The round-4 composition — :func:`curate_corpus` plus the newer
    curation signals, still cheapest-first:

      0. PII scrub        — a TRANSFORM, not a gate: all downstream
                            hashing/fingerprinting runs on the redacted
                            text (so a PII difference never splits an
                            otherwise-exact dup pair);
      1. quality gate     — composite heuristic ≥ ``min_quality``;
      2. repetition gates — Gopher-style boilerplate/spam drop:
                            dup_token_frac ≤ ``max_dup_token_frac`` AND
                            top_token_frac ≤ ``max_top_token_frac``
                            (both on ROUNDED fractions, so the gate is
                            engine-portable);
      3. exact dedup      — min-id per md5(redacted text);
      4. near-dup reps    — LSH pairs → components on survivors only.

    Returns (id, quality, dup_token_frac, top_token_frac) for the docs
    that survive everything.  Stages 0–2 are pure per-row/agg codegen;
    the expensive pair work again only ever sees the shrunken tail.
    """
    from palladian_spark.graph import connected_components
    from palladian_spark.operators.dedup import minhash_dedup_pairs
    from palladian_spark.operators.pii import scrub_pii
    from palladian_spark.operators.text_quality import (quality_scores,
                                                        repetition_scores)

    scrubbed = (scrub_pii(docs, id_col=id_col, text_col=text_col)
                .select(id_col, F.col("redacted").alias(text_col)))
    q = quality_scores(scrubbed, id_col=id_col, text_col=text_col) \
        .select(id_col, "quality")
    rep = repetition_scores(scrubbed, id_col=id_col, text_col=text_col) \
        .select(id_col, "dup_token_frac", "top_token_frac")
    good = (scrubbed.join(q, id_col).join(rep, id_col)
            .where((F.col("quality") >= min_quality)
                   & (F.col("dup_token_frac") <= max_dup_token_frac)
                   & (F.col("top_token_frac") <= max_top_token_frac)))

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    # persist: the survivor set feeds the MinHash signatures, the verify
    # shingles AND the final anti-join — without it the scrub + quality
    # + repetition chain re-runs per consumer
    from pyspark.storagelevel import StorageLevel
    surv1 = (good.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn")
             .persist(StorageLevel.MEMORY_AND_DISK))

    pairs = minhash_dedup_pairs(surv1, threshold=near_dup_threshold,
                                id_col=id_col, text_col=text_col)
    comp = connected_components(pairs, src_col="a_id", dst_col="b_id")
    drop = comp.where(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_col))
    return (surv1.join(drop, id_col, "left_anti")
            .select(id_col, "quality", "dup_token_frac", "top_token_frac"))
