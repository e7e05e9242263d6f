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
