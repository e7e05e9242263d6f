"""Structural tests for kcore, random_walks and conflicting_observations."""

import datetime

from pyspark.sql import functions as F

from palladian_spark.graph import kcore, random_walks
from palladian_spark.operators.kg_temporal import conflicting_observations


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_kcore_peels_pendants_keeps_triangle(spark):
    # triangle a-b-c plus pendant chain c-d-e: 2-core = the triangle
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                       ("c", "d"), ("d", "e")])
    got = {r["node"]: r["degree"] for r in kcore(e, k=2, rounds=3).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_fixed_rounds_partial_peel(spark):
    # a long chain needs one round per endpoint pair; rounds=1 only
    # removes the outermost shell — deterministic intermediate state
    chain = [("n%d" % i, "n%d" % (i + 1)) for i in range(5)]
    got1 = {r["node"] for r in kcore(_edges(spark, chain),
                                     k=2, rounds=1).collect()}
    assert got1 == {"n1", "n2", "n3", "n4"}
    gotall = kcore(_edges(spark, chain), k=2, rounds=3).collect()
    assert gotall == []  # chain has no 2-core


def test_random_walks_deterministic_and_edge_valid(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    e = _edges(spark, pairs)
    w1 = sorted(map(tuple, random_walks(e, walk_len=3, seed=5).collect()))
    w2 = sorted(map(tuple, random_walks(e, walk_len=3, seed=5).collect()))
    assert w1 == w2 and w1
    # different seed must change at least one choice on this graph
    w3 = sorted(map(tuple, random_walks(e, walk_len=3, seed=6).collect()))
    assert w3 != w1
    # every consecutive step must traverse a real edge
    edge_set = set(pairs)
    by_walk = {}
    for walk_id, step, node in w1:
        by_walk.setdefault(walk_id, {})[step] = node
    for steps in by_walk.values():
        assert 0 in steps
        for s in range(1, max(steps) + 1):
            if s in steps:
                assert (steps[s - 1], steps[s]) in edge_set


def test_random_walks_stop_at_sinks(spark):
    # b is a sink: walks reaching b stop early instead of emitting nulls
    e = _edges(spark, [("a", "b")])
    rows = sorted(map(tuple, random_walks(e, walk_len=4, seed=1).collect()))
    # one walk (from a), two rows: a at step 0, b at step 1
    assert rows == [(0, 0, "a"), (0, 1, "b")]


def test_conflicting_observations_window_and_counts(spark):
    d = datetime.datetime
    obs = spark.createDataFrame(
        [("s1", "p", "x", d(2024, 1, 1), "c1", 1),
         ("s1", "p", "y", d(2024, 1, 5), "c1", 2),    # 4 days from x -> in
         ("s1", "p", "z", d(2024, 3, 1), "c2", 1),    # far from both -> out
         ("s2", "p", "x", d(2024, 1, 1), "c3", 1)],   # lone object, no pair
        ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"])
    got = conflicting_observations(obs, window_seconds=86400 * 30).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["subj"], r["obj_a"], r["obj_b"]) == ("s1", "x", "y")
    assert r["n_pairs"] == 1 and r["min_gap_s"] == 4 * 86400


def test_conflicting_observations_dedups_evidence(spark):
    d = datetime.datetime
    # the same (obj, ts) observed from many turns counts once
    obs = spark.createDataFrame(
        [("s", "p", "x", d(2024, 1, 1), "c1", i) for i in range(5)]
        + [("s", "p", "y", d(2024, 1, 2), "c9", 1)],
        ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"])
    got = conflicting_observations(obs, window_seconds=86400 * 30).collect()
    assert len(got) == 1 and got[0]["n_pairs"] == 1


def test_walk_skipgrams_window_and_weights(spark):
    from palladian_spark.operators.kg_training import walk_skipgrams
    walks = spark.createDataFrame(
        [(0, 0, "a"), (0, 1, "b"), (0, 2, "c"), (0, 3, "d"),
         (1, 0, "a"), (1, 1, "b")],
        ["walk_id", "step", "node"])
    got = {(r["center"], r["context"]): r["n_pairs"]
           for r in walk_skipgrams(walks, window=1).collect()}
    # adjacent pairs only; (a,b) occurs in both walks
    assert got[("a", "b")] == 2 and got[("b", "a")] == 2
    assert got[("b", "c")] == 1 and got[("c", "d")] == 1
    assert ("a", "c") not in got  # outside window=1
    wide = {(r["center"], r["context"]): r["n_pairs"]
            for r in walk_skipgrams(walks, window=2).collect()}
    assert wide[("a", "c")] == 1 and wide[("b", "d")] == 1
    assert ("a", "d") not in wide


def test_conv_graph_stats_counts_and_density(spark):
    from palladian_spark.graph import conv_graph_stats
    triples = spark.createDataFrame(
        [("c1", 1, "a", "p", "b"), ("c1", 2, "a", "p", "b"),  # dup edge
         ("c1", 3, "b", "p", "c"),
         ("c2", 1, "x", "q", "y")],
        ["conv_id", "turn_idx", "subj", "pred", "obj"])
    got = {r["conv_id"]: r for r in conv_graph_stats(triples).collect()}
    assert got["c1"]["n_nodes"] == 3 and got["c1"]["n_edges"] == 2
    assert abs(got["c1"]["density"] - round(2 / 6, 6)) < 1e-9
    assert got["c2"]["n_nodes"] == 2 and got["c2"]["n_edges"] == 1
    assert abs(got["c2"]["density"] - 0.5) < 1e-9


def test_biased_walks_p1q1_equals_first_order(spark):
    from palladian_spark.graph import biased_random_walks, random_walks
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("d", "a"), ("b", "d")]
    e = _edges(spark, pairs)
    # unit biases degenerate to the uniform first-order rule: cumulative
    # unit weights select rank == pick, exactly random_walks' choice
    w1 = sorted(map(tuple, random_walks(e, walk_len=3, seed=9).collect()))
    w2 = sorted(map(tuple, biased_random_walks(e, walk_len=3, seed=9)
                    .collect()))
    assert w1 == w2 and w1


def test_biased_walks_return_bias(spark):
    from palladian_spark.graph import biased_random_walks
    # at b (prev=a) neighbors are {a, c}; a tiny p (huge return weight)
    # forces the walk back to a
    e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")])
    rows = biased_random_walks(e, walk_len=2, seed=3,
                               p_num=1, p_den=10_000).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for steps in by_walk.values():
        if 2 in steps:
            assert steps[2] == steps[0]  # always returned


def test_biased_walks_inout_bias(spark):
    from palladian_spark.graph import biased_random_walks
    # at b (prev=a): neighbors {a, c, d}; edge a->c exists (common),
    # a->d does not (other).  Huge q penalizes d; tiny p penalty off,
    # so choice concentrates on {a (return), c (common)} — never d.
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
                       ("b", "d"), ("c", "a"), ("d", "b")])
    rows = biased_random_walks(e, walk_len=2, seed=5,
                               q_num=10_000, q_den=1).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    walked_from_a = by_walk[0]  # vocab id of 'a' is 0
    if walked_from_a.get(1) == "b" and 2 in walked_from_a:
        assert walked_from_a[2] != "d"


def test_kg_role_provenance_counts(spark):
    from palladian_spark.graph import kg_role_provenance
    triples = spark.createDataFrame(
        [("c1", 1, "a", "p", "b"), ("c1", 2, "a", "p", "b"),
         ("c1", 2, "a", "p", "b"),   # dup observation collapses
         ("c2", 1, "a", "p", "b"), ("c1", 1, "x", "q", "y")],
        ["conv_id", "turn_idx", "subj", "pred", "obj"])
    transcripts = spark.createDataFrame(
        [("c1", 1, "user"), ("c1", 2, "assistant"), ("c2", 1, "user")],
        ["conv_id", "turn_idx", "role"])
    got = {(r["subj"], r["pred"], r["obj"]): (r["n_user"], r["n_assistant"])
           for r in kg_role_provenance(triples, transcripts).collect()}
    assert got[("a", "p", "b")] == (2, 1)
    assert got[("x", "q", "y")] == (1, 0)


def test_random_walks_hash_ids(spark):
    from palladian_spark.graph import random_walks
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    e = _edges(spark, pairs)
    rows = random_walks(e, walk_len=3, seed=5,
                        id_strategy="hash").collect()
    assert rows
    # determinism + edge validity hold for the distributed-id path too
    again = random_walks(e, walk_len=3, seed=5,
                         id_strategy="hash").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    edge_set = set(pairs)
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for steps in by_walk.values():
        for s in range(1, max(steps) + 1):
            if s in steps:
                assert (steps[s - 1], steps[s]) in edge_set


def test_turn_latency_stats(spark):
    import datetime
    from palladian_spark.operators.conv_analysis import turn_latency_stats
    d = datetime.datetime
    t = spark.createDataFrame(
        [("c1", 1, "user", "hi", None, d(2024, 1, 1, 0, 0, 0)),
         ("c1", 2, "assistant", "yo", None, d(2024, 1, 1, 0, 0, 30)),
         ("c1", 3, "user", "ok", None, d(2024, 1, 1, 0, 1, 30)),
         ("c1", 3, "user", "ok", None, d(2024, 1, 1, 0, 9, 9)),  # dup turn
         ("c2", 1, "user", "x", None, d(2024, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    got = {r["conv_id"]: r for r in turn_latency_stats(t).collect()}
    r1 = got["c1"]
    # dup (conv, turn) collapses to its earliest ts
    assert r1["n_gaps"] == 2 and r1["max_gap_s"] == 60
    assert abs(r1["mean_gap_s"] - 45.0) < 1e-9
    assert abs(r1["mean_response_s"] - 30.0) < 1e-9  # user->assistant only
    assert "c2" not in got  # single-turn conv has no gaps


def test_match_motif_chain_and_cycle(spark):
    from palladian_spark.graph import match_motif
    triples = spark.createDataFrame(
        [("c", 1, "anna", "works_for", "acme"),
         ("c", 2, "acme", "located_in", "paris"),
         ("c", 3, "bob", "works_for", "globex"),
         ("c", 4, "anna", "works_for", "acme"),   # dup edge collapses
         ("c", 5, "paris", "twinned_with", "rome"),
         ("c", 6, "rome", "twinned_with", "paris")],
        ["conv_id", "turn_idx", "subj", "pred", "obj"])
    chain = match_motif(
        triples, "(a)-[works_for]->(b)-[located_in]->(c)").collect()
    assert [tuple(r) for r in chain] == [("anna", "acme", "paris")]
    cycle = match_motif(
        triples, "(x)-[twinned_with]->(y)-[twinned_with]->(x)").collect()
    assert sorted(map(tuple, cycle)) == [("paris", "rome"), ("rome", "paris")]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        match_motif(triples, "nonsense")


def test_skipgram_negatives_filtered(spark):
    from palladian_spark.operators.kg_training import skipgram_negatives
    pairs = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", 1), ("b", "a", 2), ("c", "a", 1)],
        ["center", "context", "n_pairs"])
    rows = skipgram_negatives(pairs, n_neg=3).collect()
    assert rows
    true = {("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")}
    for r in rows:
        # filtered protocol: no negative reproduces a true pair or self
        assert (r["center"], r["neg_context"]) not in true
        assert r["neg_context"] != r["context"]
        assert 0 <= r["k"] < 3
    # determinism
    again = skipgram_negatives(pairs, n_neg=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ktruss_keeps_clique_drops_tail(spark):
    from palladian_spark.graph import ktruss
    # K4 clique (every edge in 2 triangles) + pendant chain d-e-f
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    tail = [("d", "e"), ("e", "f")]
    e = _edges(spark, k4 + tail)
    got = {(r["u"], r["v"]): r["support"]
           for r in ktruss(e, k=4, rounds=2).collect()}
    assert set(got) == {tuple(sorted(p)) for p in k4}
    assert all(s == 2 for s in got.values())
    # k=3 keeps any edge in >= 1 triangle: the K4 edges survive, tail dies
    got3 = {(r["u"], r["v"]) for r in ktruss(e, k=3, rounds=2).collect()}
    assert got3 == {tuple(sorted(p)) for p in k4}


def test_ktruss_round_by_round_peel(spark):
    from palladian_spark.graph import ktruss
    # triangle a-b-c plus an edge c-d that forms no triangle: one round
    # removes c-d; the triangle is self-sustaining at k=3
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    one = {(r["u"], r["v"]) for r in ktruss(e, k=3, rounds=1).collect()}
    assert one == {("a", "b"), ("b", "c"), ("a", "c")}
