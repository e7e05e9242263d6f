"""Conversation-level analysis over the transcript/KG tables.

North-star support operators ("turns windowed per conversation under
stable (conv_id, turn_idx) ordering"): segmentation signals and
per-conversation entity importance.

  * turn_topic_shifts — token-set Jaccard between each turn and its
    predecessor within the conversation; a shift below ``threshold``
    marks a topic boundary (the cheap lexical segmentation a pipeline
    runs before windowed extraction).  Duplicate (conv_id, turn_idx)
    keys — present in the derived transcripts by construction — are
    collapsed to the MIN text, the repo's deterministic turn-dedup
    pattern.
  * entity_salience — tf·idf-shaped importance of an entity WITHIN a
    conversation over the observation-level triple stream: mention
    count in the conversation × ln(N_convs / df(entity)); the one ln
    is a single IEEE op on exact longs (engine-portable), rounded to 6
    decimals.

Scale notes: topic shifts are one shuffle (the per-conversation window;
hot conversations are the sessionization skew AQE already handles) with
set ops on token arrays — `array_intersect`/`array_union` are built-in
expressions, only the empty-token filter is a (non-hot) lambda.
Salience is two hash aggs + one broadcast-sized df join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def turn_topic_shifts(transcripts: DataFrame,
                      threshold: float = 0.2) -> DataFrame:
    """(conv_id, turn_idx, jaccard, is_boundary): token-set Jaccard vs
    the previous turn (NULL on the first turn, is_boundary false
    there)."""
    turns = (transcripts
             .groupBy("conv_id", "turn_idx")
             .agg(F.min("text").alias("text")))
    toks = F.array_distinct(F.expr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cur, prev = F.col("_toks"), F.lag("_toks").over(w)
    jac = F.round(
        F.size(F.array_intersect(cur, prev))
        / F.size(F.array_union(cur, prev)), 6)
    return (turns.withColumn("_toks", toks)
            .withColumn("jaccard", jac)
            .select("conv_id", "turn_idx", "jaccard",
                    F.coalesce(F.col("jaccard") < F.lit(threshold),
                               F.lit(False)).alias("is_boundary")))


def entity_salience(observations: DataFrame) -> DataFrame:
    """(conv_id, entity, n_mentions, df, salience) over observation-level
    (subj, pred, obj, conv_id, ...) rows: n_mentions = rows in the
    conversation where the entity fills either slot, df = conversations
    containing it, salience = n_mentions · ln(N/df) rounded to 6."""
    ment = (observations.select("conv_id", F.col("subj").alias("entity"))
            .unionAll(observations.select("conv_id",
                                          F.col("obj").alias("entity"))))
    per_conv = (ment.groupBy("conv_id", "entity")
                .agg(F.count(F.lit(1)).alias("n_mentions")))
    df_t = per_conv.groupBy("entity").agg(
        F.count(F.lit(1)).alias("df"))
    n_convs = observations.select("conv_id").distinct() \
        .agg(F.count(F.lit(1)).alias("_n"))
    return (per_conv.join(df_t, "entity")
            .crossJoin(F.broadcast(n_convs))
            .select("conv_id", "entity", "n_mentions", "df",
                    F.round(F.col("n_mentions")
                            * F.log(F.col("_n") / F.col("df")), 6)
                    .alias("salience")))


def tool_usage_stats(transcripts: DataFrame) -> DataFrame:
    """Per-tool usage profile over agent transcripts (the ``tool``
    column of the input schema): (tool, n_calls, n_convs,
    mean_turn_idx) for non-null tools — one hash agg, map-side
    combinable.  mean_turn_idx is sum/count of exact longs (one IEEE
    division), rounded to 6."""
    t = transcripts.where(F.col("tool").isNotNull())
    return (t.groupBy("tool")
            .agg(F.count(F.lit(1)).alias("n_calls"),
                 F.countDistinct("conv_id").alias("n_convs"),
                 F.round(F.sum(F.col("turn_idx").cast("long"))
                         / F.count(F.lit(1)), 6).alias("mean_turn_idx")))


def conversation_windows(transcripts: DataFrame,
                         window: int = 4) -> DataFrame:
    """Fixed-size turn windows per conversation under stable
    (conv_id, turn_idx) order — the extraction unit of the windowed
    pipeline stages: (conv_id, window_idx, n_turns, first_turn,
    last_turn, window_text).  Turns are deduplicated to min(text) per
    (conv, turn) first (the repo's deterministic turn-dedup pattern);
    window_text concatenates the window's turns in turn order (sorted
    struct collect — per-group, not per-row, so the lambda is off the
    hot path).  One shuffle for the per-conversation rank + one hash
    agg."""
    if window < 1:
        raise ValueError("window must be >= 1")
    turns = (transcripts.groupBy("conv_id", "turn_idx")
             .agg(F.min("text").alias("text")))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ranked = turns.withColumn(
        "window_idx",
        F.floor((F.row_number().over(w) - 1) / window).cast("int"))
    return (ranked.groupBy("conv_id", "window_idx")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.min("turn_idx").alias("first_turn"),
                 F.max("turn_idx").alias("last_turn"),
                 F.array_join(F.expr(
                     "transform(array_sort(collect_list("
                     "struct(turn_idx, text))), x -> x.text)"), " ")
                 .alias("window_text")))


def turn_latency_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation response-latency profile: seconds between
    consecutive turns under stable (turn_idx, role, ts) ordering —
    n_gaps, mean/max gap, and the user→assistant response mean (the
    latency a dialogue-quality gate filters on).

    One window over the per-conversation turn sequence (duplicate
    (conv_id, turn_idx) keys collapse to their earliest observation
    first — the deterministic turn-dedup pattern) + one hash agg.
    Gap seconds are epoch-difference BIGINTs; means are rounded to 3
    decimals so both engines hash identically."""
    from pyspark.sql import Window
    t = (transcripts
         .groupBy("conv_id", "turn_idx")
         .agg(F.min("ts").alias("ts"),
              F.min_by("role", F.struct("ts", "role")).alias("role")))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (t
            .withColumn("_prev_ts", F.lag("ts").over(w))
            .withColumn("_prev_role", F.lag("role").over(w))
            .where(F.col("_prev_ts").isNotNull())
            .withColumn("gap_s",
                        (F.unix_timestamp("ts")
                         - F.unix_timestamp("_prev_ts")).cast("long")))
    return (gaps.groupBy("conv_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
                 F.round(F.avg("gap_s"), 3).alias("mean_gap_s"),
                 F.max("gap_s").alias("max_gap_s"),
                 F.round(F.avg(F.when(
                     (F.col("_prev_role") == "user")
                     & (F.col("role") == "assistant"),
                     F.col("gap_s"))), 3).alias("mean_response_s")))
