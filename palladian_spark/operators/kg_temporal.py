"""Temporal KG operators: fact validity history and entity timelines.

Beyond-the-reference construction (the reference emits a flat triple set;
SURVEY.md §2.8): transcripts carry a per-turn timestamp, so the same
(subj, pred) can assert different objects over time.  These operators
turn the observation stream into the temporal artifacts a KG consumer
expects:

  * fact_transitions — SCD2-style fact history: per (subj, pred), order
    the deduplicated observations by (ts, conv_id, turn_idx, obj) — a
    total order, since observation rows are distinct — and emit one row
    per OBJECT CHANGE with its validity interval [valid_from, valid_to)
    and a 1-based version number (valid_to IS NULL = current fact).
  * entity_timeline — per entity (union of subject and object roles):
    observation count, distinct conversations, first/last seen
    timestamps, and the per-role split.

Scale notes: fact_transitions is one shuffle on (subj, pred) feeding two
same-ordered windows (lag to detect changes, lead/row_number to close
intervals); per-key history length is bounded by that fact's evidence,
so hot (subj, pred) keys are the same skew the evidence aggregations
already tolerate.  entity_timeline is a union + one hash agg
(map-side-combinable).  Neither collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_OBS_COLS = ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"]


def fact_transitions(observations: DataFrame) -> DataFrame:
    """SCD2 fact history over (subj, pred, obj, ts, conv_id, turn_idx)
    observation rows (duplicates collapsed).  Output: (subj, pred, obj,
    valid_from, valid_to, version) — one row per change of object, with
    valid_to = the next change's valid_from (NULL for the current fact)
    and version the 1-based change index."""
    obs = observations.select(*_OBS_COLS).distinct()
    order = [F.col("ts").asc(), F.col("conv_id").asc(),
             F.col("turn_idx").asc(), F.col("obj").asc()]
    w = Window.partitionBy("subj", "pred").orderBy(*order)
    chg = (obs
           .withColumn("_prev", F.lag("obj").over(w))
           .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("obj")))
           .select("subj", "pred", "obj",
                   F.col("ts").alias("valid_from"), "conv_id", "turn_idx"))
    w2 = Window.partitionBy("subj", "pred").orderBy(
        F.col("valid_from").asc(), F.col("conv_id").asc(),
        F.col("turn_idx").asc(), F.col("obj").asc())
    return (chg
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .withColumn("version", F.row_number().over(w2))
            .select("subj", "pred", "obj", "valid_from", "valid_to",
                    "version"))


def entity_timeline(observations: DataFrame) -> DataFrame:
    """Per-entity activity profile over the observation stream: entity,
    n_obs (rows where it appears in that role), n_convs (distinct
    conversations), first_seen/last_seen, n_as_subj/n_as_obj."""
    obs = observations.select(*_OBS_COLS).distinct()
    roles = (obs.select(F.col("subj").alias("entity"), "conv_id", "ts",
                        F.lit(1).alias("is_subj"))
             .unionAll(obs.select(F.col("obj").alias("entity"), "conv_id",
                                  "ts", F.lit(0).alias("is_subj"))))
    return roles.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.sum("is_subj").cast("long").alias("n_as_subj"),
        F.sum(1 - F.col("is_subj")).cast("long").alias("n_as_obj"))


def conflicting_observations(observations: DataFrame,
                             window_seconds: int = 86400 * 30) -> DataFrame:
    """Truth-maintenance signal: pairs of DIFFERENT objects asserted for
    the same (subj, pred) within ``window_seconds`` of each other —
    the simultaneous-disagreement cases SCD2 versioning (fact_transitions)
    deliberately linearizes away.  Output per conflicting object pair
    (obj_a < obj_b lexically): the number of observation pairs inside the
    window and the smallest gap seen.

    Shape: the observation stream is first collapsed to distinct
    (subj, pred, obj, ts) — vocabulary-sized per fact — then self-joined
    on (subj, pred) with the object inequality and the time-window
    predicate.  Per-key cost is quadratic in that fact's distinct
    evidence, the same skew profile the evidence aggregations tolerate;
    AQE handles hot facts."""
    obs = (observations
           .select("subj", "pred", "obj", "ts")
           .distinct())
    a = obs.select("subj", "pred", F.col("obj").alias("obj_a"),
                   F.col("ts").alias("ts_a"))
    b = obs.select("subj", "pred", F.col("obj").alias("obj_b"),
                   F.col("ts").alias("ts_b"))
    gap = F.abs(F.unix_timestamp("ts_a") - F.unix_timestamp("ts_b"))
    return (a.join(b, ["subj", "pred"])
            .where((F.col("obj_a") < F.col("obj_b"))
                   & (gap <= F.lit(int(window_seconds))))
            .groupBy("subj", "pred", "obj_a", "obj_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.min(gap).cast("long").alias("min_gap_s")))

def facts_as_of(observations: DataFrame, as_of) -> DataFrame:
    """Point-in-time KG reconstruction: the facts valid at ``as_of``
    according to the SCD2 history (fact_transitions) — one row per
    (subj, pred) whose interval covers the instant
    (valid_from <= as_of < valid_to, open current fact included).

    ``as_of`` is a timestamp literal (datetime or ISO string).  Output:
    (subj, pred, obj, valid_from, version).

    Scale: the history build is the fact_transitions shuffle; the as-of
    filter is a plain predicate on the versioned table — at 100 TB the
    history is materialized once and every as-of query is a pruned scan
    (partition the history table by valid_from month for that).
    """
    hist = fact_transitions(observations)
    ts = F.to_timestamp(F.lit(str(as_of)))
    return (hist
            .where((F.col("valid_from") <= ts)
                   & (F.col("valid_to").isNull() | (F.col("valid_to") > ts)))
            .select("subj", "pred", "obj", "valid_from", "version"))


def top_facts(observations: DataFrame, k: int = 3) -> DataFrame:
    """Entity summarization: the k best-supported facts per subject.

    Support = distinct-observation count per (subj, pred, obj); ranking
    is deterministic (support desc, pred asc, obj asc, earliest ts asc).
    Output: (subj, pred, obj, support, first_ts, rank) with rank <= k.

    Shape: one map-side-combinable evidence agg on the triple key, then
    a row_number window partitioned by subj — per-subject state is that
    entity's distinct fact list (vocabulary-sized), so hot entities are
    the same skew the evidence agg already absorbs.  No collects.
    """
    obs = observations.select(*_OBS_COLS).distinct()
    ev = (obs.groupBy("subj", "pred", "obj")
          .agg(F.count(F.lit(1)).cast("long").alias("support"),
               F.min("ts").alias("first_ts")))
    w = Window.partitionBy("subj").orderBy(
        F.col("support").desc(), F.col("pred").asc(), F.col("obj").asc(),
        F.col("first_ts").asc())
    return (ev.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select("subj", "pred", "obj", "support", "first_ts", "rank"))

def recency_weighted_edges(observations: DataFrame,
                           half_life_days: int = 365,
                           cap: int = 3) -> DataFrame:
    """Recency-weighted KG edges: evidence counted with bucketed
    exponential decay, so recently-asserted facts outweigh stale ones
    (the standard freshness prior for rank/truth computations).

    Each distinct observation contributes 2^max(0, cap - bucket) where
    bucket = floor(age_days / half_life_days) and age is measured from
    the stream's max timestamp (deterministic "now").  Weights are exact
    integers — the decay is bucketed precisely so the aggregate is
    order-independent and SQL-replayable, unlike an IEEE sum of
    exp(-age) terms.  Output: (src, pred, dst, weight) — a drop-in for
    graph.pagerank(weight_col="weight") and the truth-finding votes.

    Shape: one broadcastable 1-row max-ts agg, a per-row bucket
    expression, one map-side-combinable sum on the edge key.
    """
    obs = observations.select(*_OBS_COLS).distinct()
    now = obs.agg(F.max("ts").alias("_now"))
    age_days = ((F.unix_timestamp("_now") - F.unix_timestamp("ts"))
                / F.lit(86400)).cast("long")
    bucket = F.least(age_days / F.lit(int(half_life_days)),
                     F.lit(int(cap)).cast("double")).cast("long")
    w = F.pow(F.lit(2.0), (F.lit(int(cap)) - bucket).cast("double")) \
        .cast("long")
    return (obs.crossJoin(F.broadcast(now))
            .withColumn("_w", w)
            .groupBy(F.col("subj").alias("src"), "pred",
                     F.col("obj").alias("dst"))
            .agg(F.sum("_w").cast("long").alias("weight")))
