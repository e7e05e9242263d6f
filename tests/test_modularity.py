"""graph.modularity / graph.quotient_graph on a known two-triangle graph."""

import pytest

from palladian_spark.graph import modularity, quotient_graph

# two triangles bridged by c—d
EDGES = [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")]
LABELS = [("a", 0), ("b", 0), ("c", 0), ("d", 1), ("e", 1), ("f", 1)]


@pytest.fixture(scope="module")
def graph_dfs(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    lab = spark.createDataFrame(LABELS, "node string, label int")
    return e, lab


def test_modularity_terms(spark, graph_dfs):
    e, lab = graph_dfs
    rows = {r["community"]: r for r in modularity(e, lab).collect()}
    # m = 7; each triangle: 3 internal edges, degree sum 7 (2+2+3)
    for c in (0, 1):
        assert rows[c]["n_nodes"] == 3
        assert rows[c]["internal_edges"] == 3
        assert rows[c]["degree_sum"] == 7
        assert rows[c]["q_term"] == pytest.approx(3 / 7 - 0.25, abs=1e-6)
    # Q for this classic split
    q = sum(r["q_term"] for r in rows.values())
    assert q == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-5)


def test_modularity_trivial_partition_is_zero(spark, graph_dfs):
    e, _ = graph_dfs
    one = spark.createDataFrame([(n, 0) for n, _ in LABELS],
                                "node string, label int")
    rows = modularity(e, one).collect()
    assert len(rows) == 1
    # all edges internal, degree sum = 2m → q = 1 − 1 = 0
    assert rows[0]["q_term"] == pytest.approx(0.0, abs=1e-9)


def test_modularity_handles_duplicate_and_reversed_edges(spark, graph_dfs):
    _, lab = graph_dfs
    noisy = spark.createDataFrame(
        EDGES + [("b", "a"), ("a", "b"), ("x", "x")],
        "src string, dst string")
    rows = {r["community"]: r for r in modularity(noisy, lab).collect()}
    assert rows[0]["internal_edges"] == 3          # dupes collapsed
    assert rows[0]["degree_sum"] == 7


def test_quotient_graph(spark, graph_dfs):
    e, lab = graph_dfs
    got = {(r["c_u"], r["c_v"]): r["weight"]
           for r in quotient_graph(e, lab).collect()}
    assert got == {(0, 0): 3, (1, 1): 3, (0, 1): 1}
