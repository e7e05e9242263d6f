"""TF-IDF / BM25 operators (operators/tfidf.py, round 3)."""

import math

import pytest


def _docs(spark):
    return spark.createDataFrame(
        [(1, "spark table join"),
         (2, "spark spark query"),
         (3, "window agg sort")],
        "doc_id long, text string")


def test_tf_idf_hand_computed(spark):
    from palladian_spark.operators.tfidf import tf_idf
    got = {(r["doc_id"], r["term"]): (r["tf"], r["tfidf"])
           for r in tf_idf(_docs(spark)).collect()}
    n = 3

    def idf(df):
        return math.log((n + 1) / (df + 1)) + 1

    assert got[(2, "spark")][0] == 2
    assert got[(2, "spark")][1] == pytest.approx(2 * idf(2), abs=1e-6)
    assert got[(1, "join")][1] == pytest.approx(1 * idf(1), abs=1e-6)
    # every (doc, term) of the corpus appears exactly once
    assert len(got) == 8


def test_top_keywords_rank_and_tiebreak(spark):
    from palladian_spark.operators.tfidf import top_keywords
    got = [(r["term"], r["kw_rank"])
           for r in top_keywords(_docs(spark), k=2)
           .where("doc_id = 1").orderBy("kw_rank").collect()]
    # doc 1: 'join' and 'table' tie on tf-idf (both df=1, tf=1) → term asc;
    # 'spark' (df=2) scores lower and is cut by k=2
    assert got == [("join", 1), ("table", 2)]


def test_bm25_hand_computed(spark):
    from palladian_spark.operators.tfidf import bm25_scores
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(_docs(spark), ["spark", "query"]).collect()}
    n, k1, b, avgdl = 3, 1.2, 0.75, 3.0

    def idf(df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def part(tf, df, dl):
        return idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == pytest.approx(part(1, 2, 3), abs=1e-6)
    assert got[2] == pytest.approx(part(2, 2, 3) + part(1, 1, 3), abs=1e-6)
    assert got[3] == 0.0  # no query term → left-join zero row


def test_bm25_deterministic_across_partitionings(spark):
    from palladian_spark.operators.tfidf import bm25_scores
    rows = [(i, f"w{i % 7} spark w{i % 5} table query w{i % 3}")
            for i in range(300)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(41)
    ra = sorted((r["doc_id"], r["bm25"])
                for r in bm25_scores(a, ["spark", "query"]).collect())
    rb = sorted((r["doc_id"], r["bm25"])
                for r in bm25_scores(b, ["spark", "query"]).collect())
    assert ra == rb
