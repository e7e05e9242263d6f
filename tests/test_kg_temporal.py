"""Temporal KG: SCD2 fact transitions and entity timelines."""

import datetime

from palladian_spark.operators.kg_temporal import (
    entity_timeline, fact_transitions)


def _d(day):
    return datetime.date(2026, 1, day)


def test_fact_transitions_scd2_intervals(spark):
    obs = spark.createDataFrame(
        # a-p: x (d1), x again (d2, no change), y (d3), x (d5) → 3 versions
        [("a", "p", "x", _d(1), "c1", 1),
         ("a", "p", "x", _d(2), "c1", 2),
         ("a", "p", "y", _d(3), "c2", 1),
         ("a", "p", "x", _d(5), "c3", 1),
         # b-p: single stable fact → one open interval
         ("b", "p", "z", _d(4), "c1", 3)],
        ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"])
    rows = {(r["subj"], r["version"]): r
            for r in fact_transitions(obs).collect()}
    a1, a2, a3 = rows[("a", 1)], rows[("a", 2)], rows[("a", 3)]
    assert (a1["obj"], a1["valid_from"], a1["valid_to"]) == ("x", _d(1), _d(3))
    assert (a2["obj"], a2["valid_from"], a2["valid_to"]) == ("y", _d(3), _d(5))
    assert (a3["obj"], a3["valid_from"], a3["valid_to"]) == ("x", _d(5), None)
    b = rows[("b", 1)]
    assert (b["obj"], b["valid_to"]) == ("z", None)
    assert len(rows) == 4


def test_fact_transitions_same_ts_total_order(spark):
    # Two different objects at the SAME timestamp: obj breaks the tie, so
    # the history is deterministic regardless of partitioning.
    obs = [("a", "p", "y", _d(1), "c1", 1), ("a", "p", "x", _d(1), "c1", 1)]
    df = spark.createDataFrame(
        obs, ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"])
    out1 = [(r["obj"], r["version"], r["valid_to"])
            for r in fact_transitions(df).collect()]
    out2 = [(r["obj"], r["version"], r["valid_to"])
            for r in fact_transitions(df.repartition(7)).collect()]
    assert sorted(out1) == sorted(out2)
    assert sorted(out1) == [("x", 1, _d(1)), ("y", 2, None)]


def test_fact_transitions_dedups_observations(spark):
    obs = [("a", "p", "x", _d(1), "c1", 1)] * 3
    df = spark.createDataFrame(
        obs, ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"])
    assert fact_transitions(df).count() == 1


def test_entity_timeline_roles_and_spans(spark):
    obs = spark.createDataFrame(
        [("a", "p", "b", _d(1), "c1", 1),
         ("a", "p", "b", _d(3), "c2", 1),
         ("b", "q", "c", _d(2), "c1", 2)],
        ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"])
    rows = {r["entity"]: r for r in entity_timeline(obs).collect()}
    b = rows["b"]
    assert (b["n_obs"], b["n_convs"], b["n_as_subj"], b["n_as_obj"]) \
        == (3, 2, 1, 2)
    assert (b["first_seen"], b["last_seen"]) == (_d(1), _d(3))
    assert rows["a"]["n_as_subj"] == 2 and rows["a"]["n_as_obj"] == 0
    assert rows["c"]["n_obs"] == 1
