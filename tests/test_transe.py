"""TransE trainer: convergence, determinism, partitioning invariance."""

import numpy as np
import pytest

from palladian_spark.transe import (
    TransEModel, link_prediction_ranks, transe_train,
)


def _toy_kg(spark, partitions=None):
    """Two clusters of entities bridged by relation 0: (i, 0, i+4) for
    i<4, plus intra-cluster relation 1 links — enough structure that
    training separates true tails from corrupted ones."""
    rows = [(i, 0, i + 4) for i in range(4)]
    rows += [(0, 1, 1), (1, 1, 2), (2, 1, 3), (4, 1, 5), (5, 1, 6),
             (6, 1, 7)]
    df = spark.createDataFrame(rows, ["s_idx", "p_idx", "o_idx"])
    if partitions:
        df = df.repartition(partitions)
    return df, rows


def test_transe_loss_decreases(spark):
    df, _ = _toy_kg(spark)
    model = transe_train(df, n_entities=8, n_relations=2, dim=8,
                         epochs=6, lr=0.05, seed=3)
    assert len(model.losses) == 6
    assert model.losses[-1] < model.losses[0]


def test_transe_deterministic_across_partitionings(spark):
    df1, _ = _toy_kg(spark, partitions=1)
    df8, _ = _toy_kg(spark, partitions=8)
    m1 = transe_train(df1, n_entities=8, n_relations=2, dim=8,
                      epochs=3, lr=0.05, seed=3)
    m8 = transe_train(df8, n_entities=8, n_relations=2, dim=8,
                      epochs=3, lr=0.05, seed=3)
    np.testing.assert_array_equal(m1.entities, m8.entities)
    np.testing.assert_array_equal(m1.relations, m8.relations)
    assert m1.losses == m8.losses


def test_transe_ranks_true_tails_better_than_random(spark):
    df, rows = _toy_kg(spark)
    model = transe_train(df, n_entities=8, n_relations=2, dim=16,
                         epochs=30, lr=0.1, seed=5)
    ranks = link_prediction_ranks(model, rows)
    # mean rank must beat the uniform-random expectation (n+1)/2 = 4.5
    assert ranks.mean() < 3.5


def test_transe_score_api():
    model = TransEModel(np.zeros((2, 4)), np.ones((1, 4)), [])
    # h + r − t = 1-vector → energy = 4
    assert model.score(0, 0, 1) == pytest.approx(4.0)


def _np_filtered_ranks(model, test_rows, known_rows):
    """Brute-force filtered protocol for comparison."""
    E, R = model.entities, model.relations
    known = {}
    for s, p, o in known_rows:
        known.setdefault((s, p), set()).add(o)
    out = []
    for s, p, o in test_rows:
        d = E[s] + R[p] - E
        en = (d * d).sum(axis=1)
        for t in known.get((s, p), set()) - {o}:
            en[t] = np.inf
        out.append(int((en < en[o]).sum()) + 1)
    return out


def test_filtered_ranks_match_numpy_protocol(spark):
    from palladian_spark.transe import link_prediction_ranks_df
    df, rows = _toy_kg(spark)
    model = transe_train(df, n_entities=8, n_relations=2, dim=8,
                         epochs=5, lr=0.05, seed=3)
    got = {(r["s_idx"], r["p_idx"], r["o_idx"]): r["rank"]
           for r in link_prediction_ranks_df(model, df, known=df).collect()}
    want = dict(zip([tuple(r) for r in rows],
                    _np_filtered_ranks(model, rows, rows)))
    assert got == want


def test_unfiltered_ranks_match_driver_ranker(spark):
    from palladian_spark.transe import link_prediction_ranks_df
    df, rows = _toy_kg(spark)
    model = transe_train(df, n_entities=8, n_relations=2, dim=8,
                         epochs=5, lr=0.05, seed=3)
    got = {(r["s_idx"], r["p_idx"], r["o_idx"]): r["rank"]
           for r in link_prediction_ranks_df(model, df).collect()}
    raw = link_prediction_ranks(model, rows)
    assert [got[tuple(r)] for r in rows] == list(raw)


def test_evaluate_link_prediction_metrics(spark):
    from palladian_spark.transe import evaluate_link_prediction
    df, rows = _toy_kg(spark)
    model = transe_train(df, n_entities=8, n_relations=2, dim=16,
                         epochs=30, lr=0.1, seed=5)
    m = evaluate_link_prediction(model, df, known=df, ks=(1, 3))
    ranks = _np_filtered_ranks(model, rows, rows)
    assert m["n"] == len(rows)
    assert m["mean_rank"] == pytest.approx(np.mean(ranks))
    assert m["mrr"] == pytest.approx(np.mean([1 / r for r in ranks]))
    assert m["hits_at_3"] == pytest.approx(np.mean([r <= 3 for r in ranks]))
    # filtering can only improve (lower) ranks vs raw
    raw = evaluate_link_prediction(model, df, known=None, ks=(1, 3))
    assert m["mean_rank"] <= raw["mean_rank"]
