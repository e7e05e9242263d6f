"""Event-stream operators over the events table
(event_id, ts, user_id, event_type, value, props).

The conversation analogues of these power transcript analytics (a turn
stream IS an event stream keyed by conv_id), so they're first-class here:

  * sessionize           — gaps-and-islands with an inactivity timeout:
                           lag() flags session starts, a running sum makes
                           session ids, one groupBy folds sessions.  One
                           shuffle on user_id; AQE skew-join handles hot
                           users.
  * windowed_event_counts — tumbling-window rollup per event_type (the
                           batch twin of the streaming watermarked agg in
                           streaming/incremental.py).
  * user_activity        — per-user activity profile (count/sum/first/last)
                           in one hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, timeout_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Split each user's event stream into sessions separated by gaps
    > timeout.  Output: (user_id, session_id, session_start, session_end,
    n_events, total_value)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    # parquet may carry TIMESTAMP_NTZ; session tz is UTC so the cast is the
    # identity wall-clock mapping and matches DuckDB's epoch_us on naive ts
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = (gap.isNull()
                   | (gap > timeout_minutes * 60 * 1_000_000)).cast("int")
    with_id = (events
               .withColumn("_new", new_session)
               .withColumn("session_id", F.sum("_new").over(
                   w.rowsBetween(Window.unboundedPreceding, 0))))
    return (with_id.groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value")))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          ts_col: str = "ts") -> DataFrame:
    """Tumbling-window counts/sums per event_type — JVM `window()` agg
    (batch form; the streaming form adds a watermark)."""
    return (events
            .groupBy(F.window(ts_col, window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


def user_activity(events: DataFrame) -> DataFrame:
    """Per-user profile: one hash agg, map-side combinable."""
    return (events.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("event_type").alias("n_event_types"),
                 F.min("ts").alias("first_seen"),
                 F.max("ts").alias("last_seen"),
                 F.round(F.sum("value"), 6).alias("total_value")))
