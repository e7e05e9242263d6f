"""Bigram-LM perplexity (operators/lm_perplexity.py, round 3)."""

import math

import pytest


def test_self_perplexity_hand_computed(spark):
    from palladian_spark.operators.lm_perplexity import self_perplexity
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["ppl"])
           for r in self_perplexity(docs).collect()}
    # corpus bigrams: (<s>,a)x2 (a,b)x3 (b,a)x1 ; contexts: <s>:2 a:3 b:1
    # V = |{a, b}| = 2 ; add-1 smoothing
    def lp(c12, c1):
        return math.log((c12 + 1) / (c1 + 2))

    d1 = lp(2, 2) + lp(3, 3) + lp(1, 1) + lp(3, 3)
    assert got[1][0] == 4
    assert got[1][1] == pytest.approx(math.exp(-d1 / 4), abs=1e-6)
    d2 = lp(2, 2) + lp(3, 3)
    assert got[2][1] == pytest.approx(math.exp(-d2 / 2), abs=1e-6)


def test_unseen_document_scores_finite(spark):
    from palladian_spark.operators.lm_perplexity import (
        perplexity, train_bigram_lm)
    train = spark.createDataFrame([(1, "a b a b")],
                                  "doc_id long, text string")
    model = train_bigram_lm(train)
    new = spark.createDataFrame([(9, "z q z")],
                                "doc_id long, text string")
    r = perplexity(new, *model).collect()[0]
    assert r["ppl"] > 0 and math.isfinite(r["ppl"])
    # fully-unseen text must score WORSE than in-distribution text
    seen = perplexity(train, *model).collect()[0]
    assert r["ppl"] > seen["ppl"]


def test_perplexity_deterministic_across_partitionings(spark):
    from palladian_spark.operators.lm_perplexity import self_perplexity
    rows = [(i, " ".join(f"w{(i * j) % 13}" for j in range(30)))
            for i in range(200)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(23)
    ra = sorted((r["doc_id"], r["ppl"]) for r in self_perplexity(a).collect())
    rb = sorted((r["doc_id"], r["ppl"]) for r in self_perplexity(b).collect())
    assert ra == rb
