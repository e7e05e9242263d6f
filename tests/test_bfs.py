"""BFS distance labels from seed nodes."""

from palladian_spark.graph import bfs_levels


def test_bfs_levels_path_graph(spark):
    # a - b - c - d - e (undirected path), seed = a, depth 3
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    out = {r["node"]: r["dist"]
           for r in bfs_levels(e, seeds, max_depth=3).collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}  # e is 4 hops: absent


def test_bfs_min_distance_wins_on_cycles(spark):
    # triangle a-b-c plus chord: every node within 1 of a except none
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    out = {r["node"]: r["dist"]
           for r in bfs_levels(e, seeds, max_depth=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 1}  # c via the direct edge, not 2


def test_bfs_multi_seed(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("c", "d")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("c",)], ["node"])
    out = {r["node"]: r["dist"]
           for r in bfs_levels(e, seeds, max_depth=1).collect()}
    assert out == {"a": 0, "c": 0, "b": 1, "d": 1}
