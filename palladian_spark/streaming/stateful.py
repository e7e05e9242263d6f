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

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
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
