"""Temporal join / rollup operators Spark's DataFrame API lacks natively.

Three classic time-series shapes, each built as a composition of existing
relational operators (SURVEY.md §2.8's guidance: prefer compositions over
imperative kernels) so Catalyst keeps the whole plan:

  * asof_join         — for every left ("probe") row, attach the latest
                        right ("state") row with state.ts <= probe.ts per
                        key.  NOT implemented as a join at all: a join
                        explodes |probes| x |states per key| then filters,
                        which is quadratic on hot keys.  Instead the two
                        streams are UNIONed, tagged, and swept with one
                        per-key window (`last(state, ignorenulls=True)`)
                        — a single shuffle on the key, linear work, and
                        the standard scalable formulation (the same
                        sweep pandas.merge_asof does per group, here
                        distributed).
  * interval_join     — point-in-interval join (a "range join") with
                        time-bin blocking: intervals explode to the
                        fixed-width bins they span, points compute their
                        single bin, and the pair meets in an EQUI-join on
                        (key, bin) + residual containment filter.  Each
                        qualifying pair meets exactly once (in the
                        point's bin), so no distinct is needed.  Without
                        the bins Spark plans a per-key nested loop.
  * hypertable_rollup — multi-resolution tumbling rollup where each
                        coarser resolution re-aggregates the FINER level's
                        partials (count=sum(count), sum=sum(sum), ...)
                        instead of rescanning raw events — the
                        "continuous aggregate" cascade.  Sums are carried
                        as decimals through the cascade so every level is
                        order-independent and exactly equals a direct
                        group-by of the raw table (decimal addition is
                        associative), which is what the oracle checks.

Scale notes: asof_join shuffles once on the key (AQE skew handling covers
hot keys); interval_join's bin width trades blow-up (long intervals touch
many bins) against bin skew — pick ~ the median interval length;
hypertable_rollup's cascade reads the raw table once regardless of how
many resolutions are requested.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _duration_seconds(duration: str) -> int:
    n, unit = duration.strip().split()
    if unit.lower() not in _UNIT_SECONDS:
        raise ValueError(f"unsupported duration unit: {duration!r}")
    return int(n) * _UNIT_SECONDS[unit.lower()]


def asof_join(probes: DataFrame, states: DataFrame, on: Sequence[str],
              probe_ts: str = "ts", state_ts: str = "ts",
              state_cols: Sequence[str] | None = None,
              tolerance_seconds: int | None = None) -> DataFrame:
    """Backward as-of join: each probe row gains the ``state_cols`` of the
    most recent state row with state ts <= probe ts (equal ts matches) on
    the same key, plus ``asof_ts`` (the matched state's ts; NULL when no
    state precedes the probe, or the match is older than
    ``tolerance_seconds``).

    Requires unique (key, ts) on the state side — with duplicates "the
    latest state" is ill-defined (pre-aggregate first).  NULLs inside
    ``state_cols`` are treated as "no update" by the ignorenulls sweep
    (merge_asof semantics differ there; document per use).
    """
    if state_cols is None:
        exclude = set(on) | {state_ts}
        state_cols = [c for c in states.columns if c not in exclude]
    clash = set(state_cols) & set(probes.columns)
    if clash:
        raise ValueError(f"state_cols collide with probe columns: "
                         f"{sorted(clash)} — rename before joining")
    keys = list(on)

    probe_side = probes
    for c in state_cols:
        probe_side = probe_side.withColumn(c, F.lit(None).cast(
            dict(states.dtypes)[c]))
    probe_side = (probe_side
                  .withColumn("_ts_us",
                              F.unix_micros(F.col(probe_ts).cast("timestamp")))
                  .withColumn("_state_ts_us", F.lit(None).cast("long"))
                  .withColumn("_is_probe", F.lit(1)))

    state_side = states.select(
        *keys,
        *state_cols,
        F.unix_micros(F.col(state_ts).cast("timestamp")).alias("_ts_us"))
    state_side = (state_side
                  .withColumn("_state_ts_us", F.col("_ts_us"))
                  .withColumn("_is_probe", F.lit(0)))
    for c in probes.columns:
        if c not in state_side.columns:
            state_side = state_side.withColumn(
                c, F.lit(None).cast(dict(probe_side.dtypes)[c]))

    unioned = probe_side.unionByName(state_side.select(probe_side.columns))

    # states sort BEFORE probes at equal ts (_is_probe 0 < 1) so an
    # equal-ts state is visible to the probe — ASOF's ts >= semantics.
    w = (Window.partitionBy(*keys).orderBy("_ts_us", "_is_probe")
         .rowsBetween(Window.unboundedPreceding, 0))
    out = unioned.withColumn(
        "asof_ts_us", F.last("_state_ts_us", ignorenulls=True).over(w))
    for c in state_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = out.where(F.col("_is_probe") == 1)
    if tolerance_seconds is not None:
        stale = (F.col("_ts_us") - F.col("asof_ts_us")
                 > tolerance_seconds * 1_000_000)
        for c in state_cols:
            out = out.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        out = out.withColumn(
            "asof_ts_us",
            F.when(stale, F.lit(None)).otherwise(F.col("asof_ts_us")))
    return (out
            .withColumn("asof_ts",
                        F.timestamp_micros(F.col("asof_ts_us"))
                        .cast(dict(states.dtypes)[state_ts]))
            .drop("_ts_us", "_state_ts_us", "_is_probe", "asof_ts_us"))


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: Sequence[str], point_ts: str = "ts",
                  start_col: str = "start", end_col: str = "end",
                  bin_seconds: int = 600,
                  end_inclusive: bool = False) -> DataFrame:
    """Inner join of point rows to every interval row (same key) whose
    [start, end) contains the point (end inclusive iff ``end_inclusive``).

    Blocking: interval rows fan out to ceil(len/bin) bin copies; point
    rows compute ONE bin; the join is an equi-join on (key, bin) with the
    containment residual.  Output = point columns + interval columns
    (caller pre-projects to avoid name clashes).
    """
    keys = list(on)
    bin_us = int(bin_seconds) * 1_000_000
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    pts = points.withColumn("_bin", F.floor(p_us / bin_us))
    # exclusive end: the last occupied bin is floor((end-1us)/bin); guard
    # empty intervals (end <= start) out entirely.
    last_us = e_us if end_inclusive else e_us - F.lit(1)
    ivs = (intervals
           .where(e_us >= s_us if end_inclusive else e_us > s_us)
           .withColumn("_bin", F.explode(F.sequence(
               F.floor(s_us / bin_us), F.floor(last_us / bin_us)))))

    joined = pts.join(ivs, on=keys + ["_bin"], how="inner")
    contained = (F.unix_micros(F.col(point_ts).cast("timestamp"))
                 >= F.unix_micros(F.col(start_col).cast("timestamp")))
    upper = (F.unix_micros(F.col(point_ts).cast("timestamp"))
             <= F.unix_micros(F.col(end_col).cast("timestamp"))
             if end_inclusive else
             F.unix_micros(F.col(point_ts).cast("timestamp"))
             < F.unix_micros(F.col(end_col).cast("timestamp")))
    return joined.where(contained & upper).drop("_bin")


def hypertable_rollup(events: DataFrame,
                      resolutions: Sequence[str] = ("5 minutes", "1 hour",
                                                    "1 day"),
                      ts_col: str = "ts",
                      group_cols: Sequence[str] = ("event_type",),
                      value_col: str = "value",
                      round_decimals: int = 6) -> DataFrame:
    """Cascading multi-resolution tumbling rollup.  ``resolutions`` must be
    finest-first with each coarser level an integer multiple of the finer
    (so every coarse bucket is a union of fine buckets and the cascade is
    exact).  Output: (resolution, window_start, window_end, *group_cols,
    n_events, total_value, min_value, max_value) — one row per non-empty
    bucket per level, total_value order-independent (decimal carry).
    """
    secs = [_duration_seconds(r) for r in resolutions]
    for fine, coarse in zip(secs, secs[1:]):
        if coarse % fine or coarse < fine:
            raise ValueError(
                f"resolutions must be finest-first integer multiples: "
                f"{list(resolutions)}")
    group = list(group_cols)

    level = (events
             .groupBy(F.window(ts_col, resolutions[0]).alias("w"), *group)
             .agg(F.count("*").alias("n_events"),
                  F.sum(F.col(value_col).cast("decimal(38,9)"))
                  .alias("_sum_dec"),
                  F.min(value_col).alias("min_value"),
                  F.max(value_col).alias("max_value"))
             .select(F.col("w.start").alias("window_start"),
                     F.col("w.end").alias("window_end"),
                     *group, "n_events", "_sum_dec",
                     "min_value", "max_value"))
    out = [level.withColumn("resolution", F.lit(resolutions[0]))]
    for res in resolutions[1:]:
        level = (level
                 .groupBy(F.window("window_start", res).alias("w"), *group)
                 .agg(F.sum("n_events").alias("n_events"),
                      F.sum("_sum_dec").alias("_sum_dec"),
                      F.min("min_value").alias("min_value"),
                      F.max("max_value").alias("max_value"))
                 .select(F.col("w.start").alias("window_start"),
                         F.col("w.end").alias("window_end"),
                         *group, "n_events", "_sum_dec",
                         "min_value", "max_value"))
        out.append(level.withColumn("resolution", F.lit(res)))
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result.select(
        "resolution", "window_start", "window_end", *group, "n_events",
        F.round(F.col("_sum_dec").cast("double"), round_decimals)
        .alias("total_value"),
        "min_value", "max_value")
