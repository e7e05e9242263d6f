"""Benchmark decontamination (operators/decontamination.py, round 3)."""


def test_ngram_overlap_and_filter(spark):
    from palladian_spark.operators.decontamination import (
        decontaminate, ngram_overlap_flags)
    eval_docs = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "clean document about ships and harbors in old towns"),
         (2, "leaked copy the secret benchmark answer is forty two "
             "exactly end"),
         (3, "partial overlap secret benchmark answer here only"),
         (4, "tiny doc")],
        "doc_id long, text string")
    flags = {r["doc_id"]: r["n_hits"]
             for r in ngram_overlap_flags(train, eval_docs, n=5).collect()}
    assert flags[1] == 0
    assert flags[2] >= 1          # contains full 5-grams of the benchmark
    assert flags[3] == 0          # only a 3-word fragment — below n
    assert flags[4] == 0          # shorter than n → no full n-grams
    kept = {r["doc_id"] for r in
            decontaminate(train, eval_docs, n=5).collect()}
    assert kept == {1, 3, 4}


def test_case_insensitive_matching(spark):
    from palladian_spark.operators.decontamination import (
        ngram_overlap_flags)
    eval_docs = spark.createDataFrame(
        [(0, "Alpha Beta Gamma Delta Epsilon")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "prefix alpha beta gamma delta epsilon suffix")],
        "doc_id long, text string")
    flags = ngram_overlap_flags(train, eval_docs, n=5).collect()
    assert flags[0]["n_hits"] == 1
