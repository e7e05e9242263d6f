"""Structural properties of the late-round KG operators — the invariants
that must hold for ANY input, checked on randomized-but-deterministic
data (no Hypothesis Spark round-trips; one generated corpus, many
assertions)."""

import datetime

from pyspark.sql import functions as F

from palladian_spark.graph import hits, kg_snapshot_diff, label_propagation
from palladian_spark.operators.kg_fusion import validate_triples
from palladian_spark.operators.kg_temporal import fact_transitions


def _obs(spark, n=120):
    rows = []
    for i in range(n):
        s = "E%d" % (i % 7)
        p = "p%d" % (i % 3)
        o = "E%d" % ((i * 5 + 2) % 11)
        ts = datetime.date(2026, 1 + (i * 3) % 12, 1 + (i * 7) % 28)
        rows.append((s, p, o, ts, "c%d" % (i % 9), i % 13))
    return spark.createDataFrame(
        rows, ["subj", "pred", "obj", "ts", "conv_id", "turn_idx"])


def test_fact_transitions_intervals_partition_timeline(spark):
    out = fact_transitions(_obs(spark)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r["subj"], r["pred"]), []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r["version"])
        # versions are 1..k dense
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            # each interval closes exactly where the next opens
            assert a["valid_to"] == b["valid_from"]
            # consecutive versions always change the object
            assert a["obj"] != b["obj"]
        # only the last interval is open
        assert rows[-1]["valid_to"] is None
        assert all(r["valid_to"] is not None for r in rows[:-1])


def test_hits_totals_and_norms(spark):
    e = _obs(spark).select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst"))
    rows = hits(e, n_iter=2).collect()
    assert abs(sum(r["hub_norm"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["auth_norm"] for r in rows) - 1.0) < 1e-9
    assert all(r["hub"] >= 0 and r["auth"] >= 0 for r in rows)


def test_label_propagation_labels_are_nodes(spark):
    e = _obs(spark).select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst"))
    out = label_propagation(e, n_iter=2).collect()
    nodes = {r["node"] for r in out}
    assert all(r["label"] in nodes for r in out)
    assert len(out) == len(nodes)  # one label per node


def test_snapshot_diff_accounts_for_everything(spark):
    obs = _obs(spark)
    old = obs.where(F.col("turn_idx") <= 5)
    out = kg_snapshot_diff(old, obs).collect()
    # new side covers the old side here, so nothing is 'removed' and the
    # new_evidence totals must equal the full observation count
    assert not any(r["status"] == "removed" for r in out)
    assert sum(r["new_evidence"] for r in out) == obs.count()
    assert sum(r["old_evidence"] for r in out) == old.count()
    for r in out:
        if r["status"] == "added":
            assert r["old_evidence"] == 0 and r["new_evidence"] > 0
        elif r["status"] == "unchanged":
            assert r["old_evidence"] == r["new_evidence"]
        elif r["status"] == "changed":
            assert 0 < r["old_evidence"] != r["new_evidence"] > 0


def test_validate_triples_one_row_per_triple(spark):
    t = _obs(spark).select("subj", "pred", "obj")
    out = validate_triples(t)
    n_distinct = t.distinct().count()
    assert out.count() == n_distinct
    assert out.select("subj", "pred", "obj").distinct().count() == n_distinct
