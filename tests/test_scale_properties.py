"""Scale-property tests: the things that must hold at 1000 executors,
checked structurally at local scale — skew handling, plan shape (no Python
in relational operators), salting spread."""

import pytest

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


PY_NODES = ("ArrowEval", "BatchEval", "FlatMapGroupsInPandas", "MapInPandas")


def _assert_jvm_only(df, name):
    plan = _plan(df)
    for node in PY_NODES:
        assert node not in plan, f"{name} plan contains Python node {node}"


def test_relational_operators_are_jvm_only(spark):
    """Every operator we claim is 'pure Catalyst' must show NO Python eval
    node in its executed plan — this is the 100 TB contract."""
    from palladian_spark.operators.mentions import (
        combine_adjacent_df, remove_nested_df)
    from palladian_spark.operators.dedup import (
        minhash_dedup_pairs, ngram_jaccard_pairs, simhash)
    from palladian_spark.operators.text_quality import (
        bpe_token_counts, language_id, quality_scores)
    from palladian_spark.classification.train_df import (
        build_dictionary_df, category_priors_df, classify_df)
    from palladian_spark.ner.train_df import (
        build_annotation_dictionary_df, build_case_dictionary_df)

    mentions = spark.createDataFrame(
        [("c", 0, 0, 5, "Alpha", "X", 1.0), ("c", 0, 2, 4, "ph", "X", 1.0)],
        "conv_id string, turn_idx int, start int, end int, value string,"
        " tag string, conf double")
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta", "en"), (1, "alpha beta gamma", "de")],
        "doc_id long, text string, lang string")
    transcripts = spark.createDataFrame(
        [("c", 0, "Alpha works in Berlin.")],
        "conv_id string, turn_idx int, text string")

    _assert_jvm_only(remove_nested_df(mentions), "remove_nested_df")
    _assert_jvm_only(combine_adjacent_df(mentions), "combine_adjacent_df")
    _assert_jvm_only(minhash_dedup_pairs(docs), "minhash_dedup_pairs")
    _assert_jvm_only(ngram_jaccard_pairs(docs), "ngram_jaccard_pairs")
    _assert_jvm_only(simhash(docs), "simhash")
    _assert_jvm_only(language_id(docs), "language_id")
    _assert_jvm_only(quality_scores(docs), "quality_scores")
    _assert_jvm_only(bpe_token_counts(docs), "bpe_token_counts")
    d = build_dictionary_df(docs, "lang")
    p = category_priors_df(docs, "lang")
    _assert_jvm_only(d, "build_dictionary_df")
    _assert_jvm_only(classify_df(docs, d, p, ["doc_id"]), "classify_df")
    _assert_jvm_only(build_case_dictionary_df(transcripts),
                     "build_case_dictionary_df")
    _assert_jvm_only(build_annotation_dictionary_df(
        mentions.select("value", "tag")), "build_annotation_dictionary_df")


def test_scan_prunes_columns(spark):
    """Column pruning must reach the parquet scan: a 2-column projection
    over documents reads only those columns (ReadSchema check)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(docs.select("doc_id", F.length("text").alias("n")))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "lang" not in read_schema[0] and "source" not in read_schema[0]


def test_salting_spreads_hot_conversation(spark):
    """One conversation holding 50% of all turns must land on many
    partitions after the salted repartition (mention extraction is
    turn-local, so this is lossless)."""
    from palladian_spark.data.transcripts import generate_transcripts_df
    from palladian_spark.operators.mentions import repartition_salted
    gen = generate_transcripts_df(spark, 2000, hot_fraction=0.5)
    parts = (repartition_salted(gen, 8)
             .where(F.col("conv_id") == "conv-hot")
             .select(F.spark_partition_id().alias("pid"))
             .distinct().count())
    assert parts >= 6


def test_hot_conversation_pipeline_pr(spark):
    """End-to-end P/R gate on a skewed table (one conversation = 50% of
    turns): skew must not change results."""
    from palladian_spark.data.transcripts import (
        generate_transcripts_df, generated_gold_triples_df)
    from palladian_spark.evaluation import triple_prf
    from palladian_spark.pipeline import default_model, run_pipeline
    gen = generate_transcripts_df(spark, 800, n_convs=20,
                                  hot_fraction=0.5).cache()
    gold = generated_gold_triples_df(gen)
    result = run_pipeline(spark, gen.drop("_gen_id"))
    prf = triple_prf(result.triples, gold)
    assert prf.precision >= 0.95
    assert prf.recall >= 0.95
