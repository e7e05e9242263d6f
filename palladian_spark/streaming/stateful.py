"""Custom stateful streaming operators (applyInPandasWithState).

The watermarked window aggregations in incremental.py cover the built-in
stateful surface; this module is the CUSTOM-state path the 100 TB design
calls for: per-conversation state that survives micro-batches AND query
restarts (checkpointed), maintained in Arrow batches.

``conversation_running_stats`` keeps one state row per conv_id
(turn count, char count, first/last event time as epoch micros) and emits
the updated aggregate every time a micro-batch touches the conversation —
the streaming twin of events.user_activity.  State size is O(active
conversations); with an idle timeout the store stays bounded on infinite
streams (timeout_minutes > 0 evicts idle conversations, emitting a final
row flagged closed=true).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", LongType()),
    StructField("n_chars", LongType()),
    StructField("first_us", LongType()),
    StructField("last_us", LongType()),
    StructField("closed", BooleanType()),
])

STATE_SCHEMA = StructType([
    StructField("n_turns", LongType()),
    StructField("n_chars", LongType()),
    StructField("first_us", LongType()),
    StructField("last_us", LongType()),
])


def conversation_running_stats(transcripts_stream: DataFrame,
                               timeout_minutes: int = 0) -> DataFrame:
    """Per-conversation running stats with checkpointed custom state.

    Input: the streaming transcripts table (conv_id, turn_idx, role, text,
    tool, ts).  Output (update mode): one row per touched conversation per
    micro-batch; with ``timeout_minutes`` > 0, idle conversations are
    evicted on processing-time timeout and emit a final ``closed`` row.
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if timeout_minutes
               else GroupStateTimeout.NoTimeout)

    def update(key: Tuple[Any, ...],
               pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            n, c, first, last = state.get
            state.remove()
            yield pd.DataFrame({"conv_id": [conv_id], "n_turns": [n],
                                "n_chars": [c], "first_us": [first],
                                "last_us": [last], "closed": [True]})
            return
        n, c, first, last = state.get if state.exists else (0, 0, None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            c += int(pdf["text"].fillna("").str.len().sum())
            # null ts must not poison the span: NaT casts to the int64
            # sentinel (-2^63) and would become a permanent fake minimum
            ts = pd.to_datetime(pdf["ts"]).dropna()
            if len(ts):
                us = ts.astype("int64") // 1000
                lo, hi = int(us.min()), int(us.max())
                first = lo if first is None else min(first, lo)
                last = hi if last is None else max(last, hi)
        state.update((n, c, first, last))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({"conv_id": [conv_id], "n_turns": [n],
                            "n_chars": [c], "first_us": [first],
                            "last_us": [last], "closed": [False]})

    return (transcripts_stream
            .groupBy("conv_id")
            .applyInPandasWithState(update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", timeout))


SESSION_OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("session_start_us", LongType()),
    StructField("session_end_us", LongType()),
    StructField("n_events", LongType()),
])

# pending (possibly several) open islands per key, as parallel arrays
SESSION_STATE_SCHEMA = StructType([
    StructField("starts_us", ArrayType(LongType())),
    StructField("ends_us", ArrayType(LongType())),
    StructField("counts", ArrayType(LongType())),
])


def stream_sessionize(events_stream: DataFrame,
                      timeout_minutes: int = 30,
                      key_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """EVENT-time sessionization — the streaming twin of
    events.sessionize (gaps-and-islands with an inactivity timeout),
    closed by the WATERMARK rather than by processing time.

    A session only finalizes once the watermark passes its end +
    timeout, so any in-watermark late event still merges (or bridges)
    islands before they are emitted — on all non-late data the closed
    sessions equal the batch operator's, which the tests assert.  State
    per key is the list of still-open islands (O(pending sessions), not
    O(events)); the event-time timeout re-arms at the earliest island's
    deadline, so idle keys cost nothing between firings and the state
    store stays bounded on infinite streams.

    The input stream MUST carry a watermark on ``ts_col``
    (``df.withWatermark(ts_col, ...)``); EventTimeTimeout requires it.
    Output (append mode): one row per FINALIZED session.
    """
    timeout_us = timeout_minutes * 60 * 1_000_000
    timeout_ms = timeout_minutes * 60 * 1000

    def update(key: Tuple[Any, ...],
               pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        pending = ([list(t) for t in zip(*state.get)]
                   if state.exists else [])
        items = [list(p) for p in pending]
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pd.to_datetime(pdf[ts_col]).dropna()
                if len(ts):
                    for t in (ts.astype("int64") // 1000).tolist():
                        items.append([int(t), int(t), 1])
        # gaps-and-islands fold over state islands + new singleton events
        items.sort()
        folded: list = []
        for s, e, n in items:
            if folded and s - folded[-1][1] <= timeout_us:
                folded[-1][1] = max(folded[-1][1], e)
                folded[-1][2] += n
            else:
                folded.append([s, e, n])
        wm_ms = state.getCurrentWatermarkMs()
        closed = [it for it in folded
                  if it[1] // 1000 + timeout_ms < wm_ms]
        still_open = [it for it in folded
                      if it[1] // 1000 + timeout_ms >= wm_ms]
        if still_open:
            state.update(([it[0] for it in still_open],
                          [it[1] for it in still_open],
                          [it[2] for it in still_open]))
            # earliest pending deadline; must be strictly past the
            # current watermark or the state store rejects it
            deadline = min(it[1] for it in still_open) // 1000 + timeout_ms
            state.setTimeoutTimestamp(max(deadline, wm_ms + 1000))
        elif state.exists or closed:
            state.remove()
        if closed:
            yield pd.DataFrame({
                "key": [str(key[0])] * len(closed),
                "session_start_us": [it[0] for it in closed],
                "session_end_us": [it[1] for it in closed],
                "n_events": [it[2] for it in closed],
            })

    return (events_stream
            # project (not groupBy-expression): the stateful operator
            # needs a resolvable grouping COLUMN; the projection keeps
            # the event-time watermark because ts_col survives it
            .select(F.col(key_col).cast("string").alias("key"),
                    F.col(ts_col))
            .groupBy("key")
            .applyInPandasWithState(update, SESSION_OUTPUT_SCHEMA,
                                    SESSION_STATE_SCHEMA, "append",
                                    GroupStateTimeout.EventTimeTimeout))
