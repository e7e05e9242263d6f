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


def curation_report(docs: DataFrame, min_quality: float = 0.3,
                    near_dup_threshold: float = 0.2,
                    max_dup_token_frac: float = 0.65,
                    max_top_token_frac: float = 0.2,
                    id_col: str = "doc_id", text_col: str = "text",
                    group_col: str = "lang") -> DataFrame:
    """Per-``group_col`` curation FUNNEL for :func:`curate_corpus_full`
    — the metrics/lineage table a production pipeline materializes next
    to the curated output so every dropped document is accounted for:

      (group, n_docs, n_quality_fail, n_repetition_fail, n_exact_dup,
       n_near_dup, n_kept, kept_mean_quality)

    Each doc is attributed to exactly ONE stage — the FIRST gate that
    dropped it, in pipeline order (quality → repetition → exact dup →
    near-dup cluster → kept), so the counts sum to n_docs per group.
    ``kept_mean_quality`` is a decimal-exact (order-independent) mean
    rounded to 6, keeping the whole report engine-replayable.

    One extra shuffle over :func:`curate_corpus_full` (the final group
    agg — map-side combinable); the expensive pair stage is shared
    logic and again only ever sees the gate survivors.
    """
    from palladian_spark.graph import connected_components
    from palladian_spark.operators.dedup import minhash_dedup_pairs
    from palladian_spark.operators.pii import scrub_pii
    from palladian_spark.operators.text_quality import (quality_scores,
                                                        repetition_scores)
    from pyspark.storagelevel import StorageLevel

    scrubbed = (scrub_pii(docs, id_col=id_col, text_col=text_col)
                .select(id_col, F.col("redacted").alias(text_col)))
    q = quality_scores(scrubbed, id_col=id_col, text_col=text_col) \
        .select(id_col, "quality")
    rep = repetition_scores(scrubbed, id_col=id_col, text_col=text_col) \
        .select(id_col, "dup_token_frac", "top_token_frac")
    scored = (scrubbed
              .join(q, id_col).join(rep, id_col)
              .join(docs.select(id_col, group_col), id_col)
              .persist(StorageLevel.MEMORY_AND_DISK))

    q_fail = F.col("quality") < min_quality
    r_fail = (F.col("dup_token_frac") > max_dup_token_frac) \
        | (F.col("top_token_frac") > max_top_token_frac)
    passed = scored.where(~q_fail & ~r_fail)
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    ranked = passed.withColumn("_rn", F.row_number().over(w))
    surv1 = ranked.where(F.col("_rn") == 1).drop("_rn") \
        .persist(StorageLevel.MEMORY_AND_DISK)

    pairs = minhash_dedup_pairs(surv1, threshold=near_dup_threshold,
                                id_col=id_col, text_col=text_col)
    comp = connected_components(pairs, src_col="a_id", dst_col="b_id")
    near_drop = (comp.where(F.col("node") != F.col("component"))
                 .select(F.col("node").alias(id_col))
                 .withColumn("_near", F.lit(True)))

    status = (scored
              .join(ranked.select(id_col, "_rn"), id_col, "left")
              .join(near_drop, id_col, "left")
              .select(group_col, "quality", F.when(q_fail, "quality_fail")
                      .when(r_fail, "repetition_fail")
                      .when(F.col("_rn") > 1, "exact_dup")
                      .when(F.col("_near"), "near_dup")
                      .otherwise("kept").alias("_st")))
    cnt = lambda s: F.sum(F.when(F.col("_st") == s, 1).otherwise(0)) \
        .alias(f"n_{s}")
    kept_q = F.when(F.col("_st") == "kept",
                    F.col("quality").cast("decimal(38,9)"))
    return (status.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 cnt("quality_fail"), cnt("repetition_fail"),
                 cnt("exact_dup"), cnt("near_dup"), cnt("kept"),
                 F.round(F.sum(kept_q).cast("double")
                         / F.sum(F.when(F.col("_st") == "kept", 1)
                                 .otherwise(0)), 6)
                 .alias("kept_mean_quality")))
