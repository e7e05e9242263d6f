"""asof_join / interval_join / hypertable_rollup semantics."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from palladian_spark.operators.temporal import (
    asof_join, hypertable_rollup, interval_join)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture()
def state_df(spark):
    return spark.createDataFrame([
        Row(user_id=1, ts=_ts(0), plan="free"),
        Row(user_id=1, ts=_ts(10), plan="pro"),
        Row(user_id=2, ts=_ts(5), plan="trial"),
    ])


@pytest.fixture()
def probe_df(spark):
    return spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=_ts(0)),    # equal ts -> matches
        Row(event_id=2, user_id=1, ts=_ts(9)),    # before upgrade
        Row(event_id=3, user_id=1, ts=_ts(10)),   # equal ts -> pro
        Row(event_id=4, user_id=1, ts=_ts(30)),   # well after
        Row(event_id=5, user_id=2, ts=_ts(4)),    # before any state
        Row(event_id=6, user_id=3, ts=_ts(1)),    # key with no states
    ])


def test_asof_backward_with_equal_ts(spark, probe_df, state_df):
    out = {r["event_id"]: (r["plan"], r["asof_ts"])
           for r in asof_join(probe_df, state_df, on=["user_id"]).collect()}
    assert out[1] == ("free", _ts(0))
    assert out[2] == ("free", _ts(0))
    assert out[3] == ("pro", _ts(10))
    assert out[4] == ("pro", _ts(10))
    assert out[5] == (None, None)
    assert out[6] == (None, None)
    assert len(out) == 6  # every probe survives exactly once


def test_asof_tolerance(spark, probe_df, state_df):
    out = {r["event_id"]: r["plan"]
           for r in asof_join(probe_df, state_df, on=["user_id"],
                              tolerance_seconds=5 * 60).collect()}
    assert out[3] == "pro"        # 0 min old
    assert out[4] is None         # 20 min old > 5 min tolerance
    assert out[2] is None         # 9 min old > 5 min tolerance


def test_asof_tolerance_boundary(spark, probe_df, state_df):
    out = {r["event_id"]: r["plan"]
           for r in asof_join(probe_df, state_df, on=["user_id"],
                              tolerance_seconds=9 * 60).collect()}
    assert out[2] == "free"       # exactly 9 min old: <= tolerance kept


def test_asof_column_clash_raises(spark, probe_df, state_df):
    with pytest.raises(ValueError, match="collide"):
        asof_join(probe_df.withColumn("plan", F.lit("x")), state_df,
                  on=["user_id"])


def test_asof_matches_pandas_merge_asof(spark):
    """Random-ish case vs pandas.merge_asof (the public reference
    semantics for backward as-of with allow_exact_matches=True)."""
    import pandas as pd
    probes = [(i, i % 3, _ts(i % 50, (7 * i) % 60)) for i in range(200)]
    states = [(k, _ts(m, s), f"s{k}-{m}-{s}")
              for k in range(3) for m in range(0, 50, 7) for s in (0, 30)]
    pdf = pd.DataFrame(probes, columns=["event_id", "user_id", "ts"])
    sdf = pd.DataFrame(states, columns=["user_id", "ts", "plan"])
    expected = pd.merge_asof(
        pdf.sort_values("ts", kind="stable"), sdf.sort_values("ts"),
        on="ts", by="user_id", direction="backward")
    exp = dict(zip(expected["event_id"], expected["plan"]))
    got = {r["event_id"]: r["plan"] for r in asof_join(
        spark.createDataFrame(pdf), spark.createDataFrame(sdf),
        on=["user_id"]).collect()}
    assert got == {k: (None if v != v else v) if isinstance(v, float) else v
                   for k, v in exp.items()}


def _brute_interval_join(points, intervals, end_inclusive=False):
    out = set()
    for pid, key, ts in points:
        for iid, ikey, s, e in intervals:
            if key != ikey:
                continue
            if ts >= s and (ts <= e if end_inclusive else ts < e):
                out.add((pid, iid))
    return out


def test_interval_join_matches_brute_force(spark):
    points = [(i, i % 2, _ts(i % 59, (11 * i) % 60)) for i in range(120)]
    intervals = [(j, j % 2, _ts((5 * j) % 55), _ts((5 * j) % 55 + (j % 7)))
                 for j in range(40)]
    pdf = spark.createDataFrame(points, ["event_id", "user_id", "ts"])
    idf = spark.createDataFrame(
        intervals, ["incident_id", "user_id", "start", "end"])
    for inclusive in (False, True):
        for bin_seconds in (60, 300, 7):  # incl. a width not dividing 60
            got = {(r["event_id"], r["incident_id"])
                   for r in interval_join(
                       pdf, idf.withColumnRenamed("user_id", "user_id"),
                       on=["user_id"], bin_seconds=bin_seconds,
                       end_inclusive=inclusive)
                   .select("event_id", "incident_id").collect()}
            assert got == _brute_interval_join(points, intervals, inclusive)


def test_interval_join_pair_meets_once(spark):
    """A long interval spanning many bins still yields ONE row per pair."""
    pdf = spark.createDataFrame([(1, 1, _ts(30))], ["event_id", "k", "ts"])
    idf = spark.createDataFrame([(9, 1, _ts(0), _ts(59))],
                                ["incident_id", "k", "start", "end"])
    rows = interval_join(pdf, idf, on=["k"], bin_seconds=60).collect()
    assert len(rows) == 1


def test_hypertable_rollup_cascade_equals_direct(spark):
    events = spark.createDataFrame(
        [(i, _ts(i % 59, (13 * i) % 60), f"t{i % 3}", float(i) * 1.01 - 7)
         for i in range(500)],
        ["event_id", "ts", "event_type", "value"])
    out = hypertable_rollup(events, resolutions=("5 minutes", "1 hour"))
    rolled = {(r["resolution"], r["window_start"], r["event_type"]):
              (r["n_events"], r["total_value"], r["min_value"],
               r["max_value"])
              for r in out.collect()}
    # direct group-bys of the raw table must agree at every level
    for res, secs in (("5 minutes", 300), ("1 hour", 3600)):
        direct = (events.groupBy(F.window("ts", res).alias("w"),
                                 "event_type")
                  .agg(F.count("*").alias("n"),
                       F.round(F.sum(F.col("value").cast("decimal(38,9)"))
                               .cast("double"), 6).alias("s"),
                       F.min("value").alias("mn"),
                       F.max("value").alias("mx")))
        for r in direct.collect():
            key = (res, r["w"]["start"], r["event_type"])
            assert rolled[key] == (r["n"], r["s"], r["mn"], r["mx"])
    n_fine = sum(v[0] for k, v in rolled.items() if k[0] == "5 minutes")
    n_coarse = sum(v[0] for k, v in rolled.items() if k[0] == "1 hour")
    assert n_fine == n_coarse == 500


def test_hypertable_rollup_rejects_non_multiple(spark):
    events = spark.createDataFrame([(1, _ts(0), "a", 1.0)],
                                   ["event_id", "ts", "event_type", "value"])
    with pytest.raises(ValueError, match="multiple"):
        hypertable_rollup(events, resolutions=("7 minutes", "1 hour"))
