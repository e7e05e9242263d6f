"""KG snapshot diff and one-row structural summary."""

from palladian_spark.graph import kg_snapshot_diff, kg_summary


def _t(spark, rows):
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_snapshot_diff_statuses(spark):
    old = _t(spark, [("a", "p", "b"), ("a", "p", "b"),   # evidence 2
                     ("b", "p", "c"),                    # removed
                     ("c", "q", "d")])                   # unchanged
    new = _t(spark, [("a", "p", "b"),                    # evidence 2 → 1
                     ("c", "q", "d"),
                     ("x", "p", "y")])                   # added
    rows = {(r["subj"], r["pred"], r["obj"]):
            (r["status"], r["old_evidence"], r["new_evidence"])
            for r in kg_snapshot_diff(old, new).collect()}
    assert rows[("a", "p", "b")] == ("changed", 2, 1)
    assert rows[("b", "p", "c")] == ("removed", 1, 0)
    assert rows[("c", "q", "d")] == ("unchanged", 1, 1)
    assert rows[("x", "p", "y")] == ("added", 0, 1)
    assert len(rows) == 4


def test_summary_counts_and_degrees(spark):
    # a→b, a→c, b→c (+ a duplicate observation that must not count)
    t = _t(spark, [("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"),
                   ("a", "p", "b")])
    [r] = kg_summary(t).collect()
    assert (r["n_nodes"], r["n_edges"], r["n_predicates"]) == (3, 3, 2)
    assert (r["max_out_degree"], r["max_in_degree"]) == (2, 2)
    assert abs(r["avg_out_degree"] - 1.0) < 1e-12
