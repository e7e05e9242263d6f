"""Point-in-time KG (facts_as_of), entity summarization (top_facts) and
incremental degree maintenance (apply_degree_delta)."""

import datetime

from palladian_spark.operators.kg_temporal import facts_as_of, top_facts
from palladian_spark.graph import (apply_degree_delta, kg_degrees,
                                   kg_snapshot_diff)


def _d(day):
    return datetime.datetime(2026, 1, day)


_OBS_COLS = ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"]


def _obs(spark):
    return spark.createDataFrame(
        # a-p: x (d1) → y (d3) → x (d5); b-p: z (d4) stable
        [("a", "p", "x", _d(1), "c1", 1),
         ("a", "p", "x", _d(2), "c1", 2),
         ("a", "p", "y", _d(3), "c2", 1),
         ("a", "p", "x", _d(5), "c3", 1),
         ("b", "p", "z", _d(4), "c1", 3)],
        _OBS_COLS)


def test_facts_as_of_mid_history(spark):
    # At d4: a-p is in its 'y' interval [d3, d5); b-p's 'z' is current.
    out = {(r["subj"], r["pred"]): (r["obj"], r["version"])
           for r in facts_as_of(_obs(spark), "2026-01-04 00:00:00").collect()}
    assert out == {("a", "p"): ("y", 2), ("b", "p"): ("z", 1)}


def test_facts_as_of_boundaries(spark):
    # Interval is [valid_from, valid_to): at exactly d3 the 'y' version
    # has started; before d1 nothing exists yet.
    at_d3 = {(r["subj"], r["obj"]) for r in
             facts_as_of(_obs(spark), "2026-01-03 00:00:00").collect()}
    assert ("a", "y") in at_d3 and ("a", "x") not in at_d3
    assert facts_as_of(_obs(spark), "2025-12-31 00:00:00").count() == 0


def test_facts_as_of_latest_equals_current(spark):
    # As-of max(ts) must return exactly the open (valid_to IS NULL) facts.
    out = {(r["subj"], r["obj"]) for r in
           facts_as_of(_obs(spark), "2026-01-05 00:00:00").collect()}
    assert out == {("a", "x"), ("b", "z")}


def test_top_facts_rank_and_tiebreak(spark):
    rows = ([("s", "p", "hi", _d(i), f"c{i}", i) for i in range(1, 4)]  # 3×
            + [("s", "p", "lo", _d(4), "c4", 1),                        # 1×
               ("s", "q", "lo", _d(5), "c5", 1),                        # 1×, pred tie-break
               ("t", "p", "z", _d(6), "c6", 1)])
    df = spark.createDataFrame(rows, _OBS_COLS)
    out = top_facts(df, k=2).collect()
    by_subj = {}
    for r in out:
        by_subj.setdefault(r["subj"], []).append(
            (r["rank"], r["pred"], r["obj"], r["support"]))
    assert sorted(by_subj["s"]) == [(1, "p", "hi", 3), (2, "p", "lo", 1)]
    assert by_subj["t"] == [(1, "p", "z", 1)]
    assert all(len(v) <= 2 for v in by_subj.values())


def _triples(spark, rows):
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_apply_degree_delta_matches_recompute(spark):
    old = _triples(spark, [("a", "p", "b"), ("a", "p", "c"), ("b", "p", "c"),
                           ("d", "p", "e")])
    # new: drops (a,p,c) and the whole d-e edge; adds (c,p,a) and a new
    # node f — exercises added/removed/node-vanishes/new-node paths.
    new = _triples(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a"),
                           ("f", "p", "b")])
    diff = kg_snapshot_diff(old, new)
    inc = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in apply_degree_delta(kg_degrees(old), diff).collect()}
    full = {r["node"]: (r["out_degree"], r["in_degree"])
            for r in kg_degrees(new).collect()}
    assert inc == full
    assert "d" not in inc and "e" not in inc  # fell to (0, 0) → dropped


def test_apply_degree_delta_noop_diff(spark):
    t = _triples(spark, [("a", "p", "b"), ("b", "p", "c")])
    # Evidence drift only (duplicate observation rows) → 'changed' status,
    # distinct-edge degrees must not move.
    t_dup = t.unionAll(_triples(spark, [("a", "p", "b")]))
    diff = kg_snapshot_diff(t, t_dup)
    inc = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in apply_degree_delta(kg_degrees(t), diff).collect()}
    full = {r["node"]: (r["out_degree"], r["in_degree"])
            for r in kg_degrees(t_dup).collect()}
    assert inc == full


def test_recency_weighted_edges_buckets(spark):
    from palladian_spark.operators.kg_temporal import recency_weighted_edges
    d = datetime.datetime
    rows = [
        # now = 2026-01-01; ages: 0d, 400d (bucket 1), 3000d (capped 3)
        ("a", "p", "b", d(2026, 1, 1), "c1", 1),   # w = 8
        ("a", "p", "b", d(2024, 11, 28), "c2", 1),  # ~400d → bucket 1 → 4
        ("a", "p", "b", d(2017, 10, 15), "c3", 1),  # ~3000d → capped → 1
        ("x", "q", "y", d(2025, 12, 31), "c4", 1),  # 1d → bucket 0 → 8
    ]
    df = spark.createDataFrame(rows, _OBS_COLS)
    out = {(r["src"], r["pred"], r["dst"]): r["weight"]
           for r in recency_weighted_edges(df, half_life_days=365,
                                           cap=3).collect()}
    assert out == {("a", "p", "b"): 13, ("x", "q", "y"): 8}


def test_recency_weighted_edges_uniform_when_fresh(spark):
    # All observations inside one half-life → every contribution is 2^cap,
    # so weights reduce to 8 × the plain evidence count.
    from palladian_spark.operators.kg_temporal import recency_weighted_edges
    rows = [("a", "p", "b", _d(i), f"c{i}", 1) for i in range(1, 6)]
    df = spark.createDataFrame(rows, _OBS_COLS)
    [r] = recency_weighted_edges(df, half_life_days=365, cap=3).collect()
    assert r["weight"] == 5 * 8


def test_pagerank_warm_start_converges_faster(spark):
    from palladian_spark.graph import pagerank
    # skewed hub graph: the fixed point is far from uniform, so a cold
    # uniform start needs its full budget, while a warm start from the
    # old snapshot's converged vector absorbs a one-edge delta in 2
    # iterations.
    n = 40
    hub = ([(f"l{i}", "hub") for i in range(n)]
           + [("hub", f"l{i}") for i in range(5)])
    old = spark.createDataFrame(hub, ["src", "dst"])
    new = spark.createDataFrame(hub + [("l7", "l8")], ["src", "dst"])

    def pr(edges, k, init=None):
        return {r["node"]: r["rank"]
                for r in pagerank(edges, n_iter=k, round_decimals=None,
                                  init_ranks=init).collect()}

    truth = pr(new, 40)
    warm = pr(new, 2, init=spark.createDataFrame(
        [(k, v) for k, v in pr(old, 40).items()], ["node", "rank"]))
    cold = pr(new, 2)
    err_warm = max(abs(warm[k] - truth[k]) for k in truth)
    err_cold = max(abs(cold[k] - truth[k]) for k in truth)
    assert err_warm < err_cold / 5
    assert err_warm < 1e-3


def test_pagerank_warm_start_new_node_defaults(spark):
    from palladian_spark.graph import pagerank
    edges = spark.createDataFrame([("a", "b"), ("b", "a"), ("b", "c")],
                                  ["src", "dst"])
    init = spark.createDataFrame([("a", 0.5), ("b", 0.5)], ["node", "rank"])
    out = {r["node"] for r in
           pagerank(edges, n_iter=1, init_ranks=init).collect()}
    # node c is absent from the init vector but present in the graph
    assert out == {"a", "b", "c"}


def test_pmi_associations_ranks_specific_pairs(spark):
    import math
    from palladian_spark.relations import pmi_associations
    # hub co-occurs with everyone (chance); x-y co-occur only together
    pairs = spark.createDataFrame(
        [("hub", "a", 4), ("hub", "b", 4), ("hub", "c", 4),
         ("x", "y", 4)],
        ["left_value", "right_value", "n"])
    out = {(r["a"], r["b"]): r for r in pmi_associations(pairs).collect()}
    # N=16; x-y: m_x=m_y=4 → pmi = ln(4*4*16/(4*4)) = ln(16)
    assert abs(out[("x", "y")]["pmi"] - round(math.log(16.0), 6)) < 1e-9
    # hub-a: m_hub=12, m_a=4 → ln(4*4*16/(12*4)) = ln(16/3)
    assert abs(out[("hub", "a")]["pmi"]
               - round(math.log(16.0 / 3.0), 6)) < 1e-9
    assert out[("x", "y")]["pmi"] > out[("hub", "a")]["pmi"]


def test_pmi_associations_min_count_filter(spark):
    from palladian_spark.relations import pmi_associations
    pairs = spark.createDataFrame(
        [("a", "b", 5), ("a", "c", 1)],
        ["left_value", "right_value", "n"])
    out = pmi_associations(pairs, min_count=2)
    assert [(r["a"], r["b"]) for r in out.collect()] == [("a", "b")]


def test_apply_component_delta_matches_recompute(spark):
    from palladian_spark.graph import (apply_component_delta,
                                       connected_components)
    # old graph: {1,2,3} and {5,6}; batch merges them via 3-5, adds a
    # brand-new pair {8,9}, and an intra-component no-op 1-3
    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["a_id", "b_id"])
    new_pairs = spark.createDataFrame(
        [(3, 5), (8, 9), (1, 3)], ["a_id", "b_id"])
    old = connected_components(old_pairs)
    inc = {r["node"]: r["component"]
           for r in apply_component_delta(old, new_pairs).collect()}
    full = {r["node"]: r["component"]
            for r in connected_components(
                old_pairs.unionAll(new_pairs)).collect()}
    assert inc == full
    assert inc[6] == 1  # transitive merge reached the old {5,6} side


def test_apply_component_delta_chain_of_merges(spark):
    from palladian_spark.graph import (apply_component_delta,
                                       connected_components)
    # three old components chained together by two new pairs — the
    # label-level quotient must propagate transitively
    old_pairs = spark.createDataFrame(
        [(10, 11), (20, 21), (30, 31)], ["a_id", "b_id"])
    new_pairs = spark.createDataFrame(
        [(11, 20), (21, 30)], ["a_id", "b_id"])
    old = connected_components(old_pairs)
    inc = {r["node"]: r["component"]
           for r in apply_component_delta(old, new_pairs).collect()}
    full = {r["node"]: r["component"]
            for r in connected_components(
                old_pairs.unionAll(new_pairs)).collect()}
    assert inc == full and set(inc.values()) == {10}


from hypothesis import HealthCheck, given, settings, strategies as st

_EDGE = st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
    lambda p: p[0] != p[1])


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_EDGE, min_size=1, max_size=14),
       st.lists(_EDGE, min_size=1, max_size=6))
def test_component_delta_property(spark, old_edges, new_edges):
    """Incremental components == full recompute for arbitrary splits."""
    from palladian_spark.graph import (apply_component_delta,
                                       connected_components)
    old_p = spark.createDataFrame(list(set(old_edges)), ["a_id", "b_id"])
    new_p = spark.createDataFrame(list(set(new_edges)), ["a_id", "b_id"])
    inc = {r["node"]: r["component"]
           for r in apply_component_delta(
               connected_components(old_p), new_p).collect()}
    full = {r["node"]: r["component"]
            for r in connected_components(
                old_p.unionAll(new_p)).collect()}
    assert inc == full


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=12),
       st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=12))
def test_degree_delta_property(spark, old_t, new_t):
    """Incremental degrees == full recompute for arbitrary snapshots."""
    from palladian_spark.graph import (apply_degree_delta, kg_degrees,
                                       kg_snapshot_diff)
    old = spark.createDataFrame(
        [(f"n{a}", "p", f"n{b}") for a, b in old_t],
        ["subj", "pred", "obj"])
    new = spark.createDataFrame(
        [(f"n{a}", "p", f"n{b}") for a, b in new_t],
        ["subj", "pred", "obj"])
    inc = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in apply_degree_delta(
               kg_degrees(old), kg_snapshot_diff(old, new)).collect()}
    full = {r["node"]: (r["out_degree"], r["in_degree"])
            for r in kg_degrees(new).collect()}
    assert inc == full


def _tri_map(df):
    return {r["node"]: (r["degree"], r["triangles"], r["clustering"])
            for r in df.collect()}


def test_apply_triangle_delta_matches_recompute(spark):
    from palladian_spark.graph import apply_triangle_delta, kg_triangles
    # old graph: path 1-2-3-4 plus old edge 2-4 (one old triangle
    # 2-3-4).  The batch exercises all three cases at once:
    #   1 novel edge  — 1-3 closes the old wedge 1-2, 2-3;
    #   2 novel edges — 5-2 and 5-4 close over old 2-4;
    #   3 novel edges — brand-new triangle 7-8-9.
    old = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 4)], ["u", "v"])
    new = spark.createDataFrame(
        [(1, 3), (5, 2), (5, 4), (7, 8), (8, 9), (7, 9)], ["u", "v"])
    inc = apply_triangle_delta(kg_triangles(old), old, new)
    full = kg_triangles(old.unionAll(new))
    got, want = _tri_map(inc), _tri_map(full)
    assert got == want
    assert want[2][1] == 3  # 2 sits in the old, case-1 and case-2 ones


def test_apply_triangle_delta_ignores_known_edges(spark):
    """Re-delivered old edges and duplicates inside the batch are
    anti-joined / collapsed — the replay-idempotency contract."""
    from palladian_spark.graph import apply_triangle_delta, kg_triangles
    old = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["u", "v"])
    new = spark.createDataFrame(
        [(2, 1), (3, 1), (1, 4), (4, 1)], ["u", "v"])
    inc = apply_triangle_delta(kg_triangles(old), old, new)
    full = kg_triangles(old.unionAll(new))
    assert _tri_map(inc) == _tri_map(full)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_EDGE, min_size=1, max_size=16),
       st.lists(_EDGE, min_size=1, max_size=8))
def test_triangle_delta_property(spark, old_edges, new_edges):
    """Incremental triangle profile == full recompute for arbitrary
    splits (the three cases stay disjoint and exhaustive)."""
    from palladian_spark.graph import apply_triangle_delta, kg_triangles
    old_p = spark.createDataFrame(list(set(old_edges)), ["u", "v"])
    new_p = spark.createDataFrame(list(set(new_edges)), ["u", "v"])
    inc = apply_triangle_delta(kg_triangles(old_p), old_p, new_p)
    full = kg_triangles(old_p.unionAll(new_p))
    assert _tri_map(inc) == _tri_map(full)
