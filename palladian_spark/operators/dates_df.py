"""Distributed DateAndTimeTagger: the full 42-format DateParser port
(textproc/dates.py) applied per turn in one Arrow pass.

Reference: extraction/entity/DateAndTimeTagger.java:43-59 over
RegExp.ALL_DATE_FORMATS + DATE_CONTEXT_YYYY.  Shuffle-free — the scan is a
narrow mapInPandas over (conv_id, turn_idx, text); at cluster scale it
inherits the input's partitioning and the 42 compiled patterns live once
per Python worker (module-level compile cache in textproc/dates.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

DATES_SCHEMA = ("conv_id string, turn_idx int, value string, fmt string, "
                "m_start int")


def tag_datetimes_df(transcripts: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """(conv_id, turn_idx, value, fmt, m_start) for every date occurrence.

    A cheap JVM-side prefilter would be unsound here: the 42 formats
    include bare YYYYWW/YYYYDDD digit runs, so any text containing 4+
    digits is a candidate — which in transcripts is nearly everything.
    """
    from palladian_spark.operators.mentions import ensure_map_parallelism
    # the scan is Python-CPU-bound (~0.7 ms/turn single-core): a small
    # single-file input must not pin the whole stage to one task
    transcripts = ensure_map_parallelism(transcripts)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from palladian_spark.textproc.dates import find_date_formats
        for pdf in it:
            out = {"conv_id": [], "turn_idx": [], "value": [], "fmt": [],
                   "m_start": []}
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf[text_col]):
                for value, fmt, idx in find_date_formats(text or ""):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(int(turn_idx))
                    out["value"].append(value)
                    out["fmt"].append(fmt)
                    out["m_start"].append(idx)
            yield pd.DataFrame(out)

    return (transcripts
            .select("conv_id", "turn_idx", text_col)
            .mapInPandas(run, DATES_SCHEMA))


DATES_NORM_SCHEMA = (
    "conv_id string, turn_idx int, value string, fmt string, m_start int, "
    "year int, month int, day int, hour int, minute int, second int, "
    "tz string")


def tag_datetimes_normalized_df(transcripts: DataFrame,
                                context_year: int,
                                text_col: str = "text") -> DataFrame:
    """tag_datetimes_df + the DateParserLogic normalization half
    (textproc/date_logic.py): every DATETIME mention carries typed
    (year, month, day, hour, minute, second, tz) fields, nulls where the
    format has no such part.  Same shuffle-free single Arrow pass — the
    parse is a per-mention dict dispatch, negligible next to the 42-regex
    scan.  ``context_year`` pins two-digit-year folding so results are
    deterministic (the reference uses the wall clock:
    DateParserLogic.java:573-582)."""
    from palladian_spark.operators.mentions import ensure_map_parallelism
    transcripts = ensure_map_parallelism(transcripts)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from palladian_spark.textproc.date_logic import parse_date
        from palladian_spark.textproc.dates import find_date_formats
        cols = ["conv_id", "turn_idx", "value", "fmt", "m_start",
                "year", "month", "day", "hour", "minute", "second", "tz"]
        for pdf in it:
            out = {c: [] for c in cols}
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf[text_col]):
                for value, fmt, idx in find_date_formats(text or ""):
                    parts = parse_date(value, fmt, context_year)
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(int(turn_idx))
                    out["value"].append(value)
                    out["fmt"].append(fmt)
                    out["m_start"].append(idx)
                    for f in ("year", "month", "day", "hour", "minute",
                              "second"):
                        out[f].append(None if parts is None
                                      else getattr(parts, f))
                    out["tz"].append(None if parts is None
                                     else parts.timezone)
            yield pd.DataFrame(
                {c: pd.array(out[c], dtype="Int32") if c in
                 ("year", "month", "day", "hour", "minute", "second")
                 else out[c] for c in cols})

    return (transcripts
            .select("conv_id", "turn_idx", text_col)
            .mapInPandas(run, DATES_NORM_SCHEMA))
