"""Personalized PageRank: seed-restart proximity ranking."""

import pytest

from palladian_spark.graph import pagerank


def _e(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst"])


def _seeds(spark, *nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


def test_ppr_chain_goldens(spark):
    # chain a→b→c→d, seed a, 3 iterations, hand-traced:
    # r3 = {a: 0.15, b: 0.85·0.15, c: 0.85²·0.15, d: 0.85³} — the
    # initial unit mass travels as a wave, the restart feeds the head.
    e = _e(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    r = {x["node"]: x["rank"]
         for x in pagerank(e, n_iter=3,
                           seeds=_seeds(spark, "a")).collect()}
    assert abs(r["a"] - 0.15) < 1e-12
    assert abs(r["b"] - 0.1275) < 1e-12
    assert abs(r["c"] - 0.108375) < 1e-12
    assert abs(r["d"] - 0.614125) < 1e-12
    # a non-seed node with no path from the seed gets no restart mass
    e2 = _e(spark, [("a", "b"), ("x", "y")])
    r2 = {x["node"]: x["rank"]
          for x in pagerank(e2, n_iter=3,
                            seeds=_seeds(spark, "a")).collect()}
    assert r2["x"] == 0.0 and r2["y"] == 0.0
    assert r2["a"] > 0 and r2["b"] > 0


def test_ppr_multi_seed_splits_restart(spark):
    e = _e(spark, [("a", "b"), ("c", "b")])
    r = {x["node"]: x["rank"]
         for x in pagerank(e, n_iter=1,
                           seeds=_seeds(spark, "a", "c")).collect()}
    # restart = 0.15 · 0.5 on each seed; b (not a seed — no restart)
    # collects both damped contributions: 0.85 · (0.5 + 0.5)
    assert abs(r["a"] - 0.075) < 1e-12 and abs(r["c"] - 0.075) < 1e-12
    assert abs(r["b"] - 0.85) < 1e-12


def test_ppr_empty_seeds_raises(spark):
    e = _e(spark, [("a", "b")])
    with pytest.raises(ValueError):
        pagerank(e, seeds=_seeds(spark))
