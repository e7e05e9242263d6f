"""Negative sampling + leakage-safe split semantics."""

from pyspark.sql import Row

from palladian_spark.operators.kg_training import (
    entity_split, entity_vocabulary, negative_samples)


def _triples(spark):
    rows = [("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"),
            ("c", "p", "d"), ("d", "q", "a"), ("a", "p", "b")]  # dup
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_vocabulary_dense_and_sorted(spark):
    vocab = {r["entity"]: r["idx"]
             for r in entity_vocabulary(_triples(spark)).collect()}
    assert vocab == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_negatives_filtered_and_deterministic(spark):
    t = _triples(spark)
    out1 = {(r["subj"], r["pred"], r["obj"], r["k"]): r["neg_obj"]
            for r in negative_samples(t, n_neg=3).collect()}
    out2 = {(r["subj"], r["pred"], r["obj"], r["k"]): r["neg_obj"]
            for r in negative_samples(t.repartition(7), n_neg=3).collect()}
    assert out1 == out2  # partitioning-independent
    true = {("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"),
            ("c", "p", "d"), ("d", "q", "a")}
    for (s, p, o, k), neg in out1.items():
        assert (s, p, o) in true
        assert neg != o                      # no no-op corruption
        assert (s, p, neg) not in true       # filtered protocol
        assert 0 <= k < 3
    # at most one row per (triple, slot)
    assert len(out1) == len(set(out1))


def test_negatives_nonempty_on_real_vocab(spark):
    t = spark.createDataFrame(
        [(f"e{i}", "p", f"e{(i * 7 + 1) % 50}") for i in range(200)],
        ["subj", "pred", "obj"])
    out = negative_samples(t, n_neg=2)
    n = out.count()
    distinct_triples = t.distinct().count()
    # filtering removes some slots, but the bulk survives
    assert 0.5 * distinct_triples * 2 < n <= distinct_triples * 2


def test_entity_split_pair_consistency(spark):
    t = spark.createDataFrame(
        [(f"e{i % 20}", f"p{i % 3}", f"e{(i * 13 + 5) % 20}")
         for i in range(300)], ["subj", "pred", "obj"])
    out = entity_split(t, valid_frac=0.2, test_frac=0.2).collect()
    fold_by_pair = {}
    for r in out:
        pair = tuple(sorted((r["subj"], r["obj"])))
        fold_by_pair.setdefault(pair, set()).add(r["fold"])
    # every unordered entity pair lives in exactly one fold
    assert all(len(folds) == 1 for folds in fold_by_pair.values())
    folds = {f for r in out for f in [r["fold"]]}
    assert folds == {"train", "valid", "test"}
