"""HITS hubs/authorities: exact integer path-count scores, end-normalized."""

from palladian_spark.graph import hits


def test_hits_two_iter_goldens(spark):
    # a→b, a→c, b→c.  Unnormalized: a1 = in-degree (b:1, c:2);
    # h1: a=3, b=2, c=0; a2: b=3, c=5; h2: a=8, b=5, c=0.
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"])
    rows = {r["node"]: r for r in hits(e, n_iter=2).collect()}
    assert (rows["a"]["hub"], rows["b"]["hub"], rows["c"]["hub"]) == (8, 5, 0)
    assert (rows["a"]["auth"], rows["b"]["auth"], rows["c"]["auth"]) \
        == (0, 3, 5)
    assert abs(rows["a"]["hub_norm"] - 8 / 13) < 1e-15
    assert abs(rows["c"]["auth_norm"] - 5 / 8) < 1e-15


def test_hits_partitioning_invariance_and_dedup(spark):
    rows = [("n%d" % i, "n%d" % ((i * 7) % 23)) for i in range(200)]
    rows += rows[:50]  # duplicate edges must not double-count
    e = spark.createDataFrame(rows, ["src", "dst"])
    key = lambda r: (r["node"], r["hub"], r["auth"])
    a = sorted(map(key, hits(e, n_iter=2).collect()))
    b = sorted(map(key, hits(e.repartition(13), n_iter=2).collect()))
    assert a == b
    # scores are exact longs, never floats
    assert all(isinstance(h, int) and isinstance(x, int)
               for _, h, x in a)
