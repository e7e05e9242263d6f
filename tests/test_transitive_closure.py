"""graph.transitive_closure — path-doubling min-hop closure."""

from itertools import product

from palladian_spark.graph import transitive_closure


def _floyd(nodes, edges):
    inf = float("inf")
    d = {(a, b): inf for a, b in product(nodes, nodes)}
    for a, b in edges:
        d[(a, b)] = min(d[(a, b)], 1)
    for k, i, j in product(nodes, nodes, nodes):
        if d[(i, k)] + d[(k, j)] < d[(i, j)]:
            d[(i, j)] = d[(i, k)] + d[(k, j)]
    return {(a, b): int(v) for (a, b), v in d.items()
            if v < inf and a != b}


def _run(spark, edges, max_rounds=16):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["src"], r["dst"]): r["dist"]
           for r in transitive_closure(df, max_rounds=max_rounds).collect()}
    nodes = sorted({n for e in edges for n in e})
    assert got == _floyd(nodes, edges)


def test_chain_distances(spark):
    _run(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])


def test_branching_and_shortcut_takes_min(spark):
    # a→b→c→d plus shortcut a→c: dist(a,d) must be 2 via the shortcut
    _run(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])


def test_cycle_is_irreflexive(spark):
    # 3-cycle: every ordered pair reachable, self-paths excluded
    _run(spark, [("x", "y"), ("y", "z"), ("z", "x")])


def test_doubling_covers_deep_chains_in_log_rounds(spark):
    # 9-node chain (diameter 8): 4 doubling rounds must suffice
    chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
    _run(spark, chain, max_rounds=4)


def test_duplicate_and_self_edges_ignored(spark):
    _run(spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")])
