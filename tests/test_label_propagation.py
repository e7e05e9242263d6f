"""Deterministic synchronous label propagation."""

from palladian_spark.graph import label_propagation


def _e(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst"])


def test_two_cliques_with_bridge(spark):
    # K3 {a,b,c} — bridge c–d — K3 {d,e,f}.  After 3 synchronous
    # min-tie-break rounds the cliques collapse to labels 'a' and 'c'
    # (hand-traced: round 2 still shuffles ties; round 3 settles).
    e = _e(spark, [("a", "b"), ("a", "c"), ("b", "c"),
                   ("c", "d"),
                   ("d", "e"), ("d", "f"), ("e", "f")])
    lab = {r["node"]: r["label"]
           for r in label_propagation(e, n_iter=3).collect()}
    assert lab["a"] == lab["b"] == lab["c"]
    assert lab["d"] == lab["e"] == lab["f"]
    assert lab["a"] != lab["d"]


def test_one_iteration_neighbor_min(spark):
    # star u–{m,n,p}: after 1 round the center takes min neighbor 'm';
    # every leaf sees only 'u'.
    e = _e(spark, [("u", "m"), ("u", "n"), ("u", "p")])
    lab = {r["node"]: r["label"]
           for r in label_propagation(e, n_iter=1).collect()}
    assert lab["u"] == "m"
    assert lab["m"] == lab["n"] == lab["p"] == "u"


def test_partitioning_invariance_and_selfloop_drop(spark):
    rows = [("n%d" % i, "n%d" % ((i * 3 + 1) % 17)) for i in range(60)]
    rows += [("n1", "n1")]  # self loop must be dropped
    e = _e(spark, rows)
    key = lambda r: (r["node"], r["label"])
    a = sorted(map(key, label_propagation(e, n_iter=3).collect()))
    b = sorted(map(key,
                   label_propagation(e.repartition(11), n_iter=3).collect()))
    assert a == b
