"""Topic-shift segmentation and per-conversation entity salience."""

import math

from palladian_spark.operators.conv_analysis import (entity_salience,
                                                     turn_topic_shifts)


def test_topic_shifts_jaccard_and_boundary(spark):
    tr = spark.createDataFrame(
        [("c1", 1, "alpha beta gamma"),
         ("c1", 2, "alpha beta delta"),      # 2/4 overlap = 0.5
         ("c1", 3, "totally new words"),     # 0 overlap → boundary
         ("c2", 1, "solo conversation")],
        ["conv_id", "turn_idx", "text"])
    rows = {(r["conv_id"], r["turn_idx"]): (r["jaccard"], r["is_boundary"])
            for r in turn_topic_shifts(tr, threshold=0.2).collect()}
    assert rows[("c1", 1)] == (None, False)
    assert rows[("c1", 2)] == (0.5, False)
    assert rows[("c1", 3)] == (0.0, True)
    assert rows[("c2", 1)] == (None, False)


def test_topic_shifts_dedups_turn_keys(spark):
    # duplicate (conv, turn) keys: min(text) wins deterministically
    tr = spark.createDataFrame(
        [("c1", 1, "zz zz zz"), ("c1", 1, "aa bb cc"),
         ("c1", 2, "aa bb cc")],
        ["conv_id", "turn_idx", "text"])
    rows = {r["turn_idx"]: r["jaccard"]
            for r in turn_topic_shifts(tr).collect()}
    assert rows[2] == 1.0  # compared against 'aa bb cc', not 'zz zz zz'


def test_entity_salience_tfidf_shape(spark):
    obs = spark.createDataFrame(
        # e1 in both convs (df=2, idf=0); e2 only in c1 twice
        [("e1", "p", "e2", "c1", 1), ("e1", "p", "e2", "c1", 2),
         ("e1", "p", "x", "c2", 1)],
        ["subj", "pred", "obj", "conv_id", "turn_idx"])
    rows = {(r["conv_id"], r["entity"]): r
            for r in entity_salience(obs).collect()}
    e1c1 = rows[("c1", "e1")]
    assert (e1c1["n_mentions"], e1c1["df"], e1c1["salience"]) == (2, 2, 0.0)
    e2c1 = rows[("c1", "e2")]
    assert e2c1["n_mentions"] == 2 and e2c1["df"] == 1
    assert abs(e2c1["salience"] - round(2 * math.log(2), 6)) < 1e-9


def test_tool_usage_stats(spark):
    from palladian_spark.operators.conv_analysis import tool_usage_stats
    tr = spark.createDataFrame(
        [("c1", 1, "u", "x", "search", None),
         ("c1", 2, "a", "x", "code", None),
         ("c2", 1, "u", "x", "search", None),
         ("c2", 2, "a", "x", None, None)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    rows = {r["tool"]: r for r in tool_usage_stats(tr).collect()}
    assert set(rows) == {"search", "code"}
    s = rows["search"]
    assert (s["n_calls"], s["n_convs"], s["mean_turn_idx"]) == (2, 2, 1.0)
    assert rows["code"]["n_calls"] == 1


def test_conversation_windows(spark):
    from palladian_spark.operators.conv_analysis import conversation_windows
    tr = spark.createDataFrame(
        [("c1", t, "T%d" % t) for t in (1, 2, 3, 5, 9)]
        + [("c1", 2, "ZZZ"),       # duplicate turn key: min(text) wins
           ("c2", 7, "solo")],
        ["conv_id", "turn_idx", "text"])
    rows = {(r["conv_id"], r["window_idx"]): r
            for r in conversation_windows(tr, window=2).collect()}
    w0 = rows[("c1", 0)]
    assert (w0["n_turns"], w0["first_turn"], w0["last_turn"],
            w0["window_text"]) == (2, 1, 2, "T1 T2")
    assert rows[("c1", 1)]["window_text"] == "T3 T5"
    assert rows[("c1", 2)]["window_text"] == "T9"
    assert rows[("c2", 0)]["window_text"] == "solo"
