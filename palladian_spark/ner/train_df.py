"""Distributed NER-training aggregations (SURVEY.md §2.5 training table).

The pure-Python builders in ner/train.py carry golden-test parity on small
texts; these are the cluster-scale forms — every one is a hash aggregation
or window over the mention/token tables, shuffling on the natural key.

  buildEntityDictionary (PalladianNer.java:326-333)  → groupBy(value, tag)
  buildCaseDictionary   (PalladianNer.java:191-222)  → token explode + agg
  buildAnnotationDictionary (PalladianNer.java:335-346) → char-5-gram
                                                          explode + agg
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from palladian_spark.textproc.tokenize import TOKEN_SPLIT_REGEX


def build_entity_dictionary_df(mentions: DataFrame) -> DataFrame:
    """Surface form → type counts from tagged mentions
    (PalladianNer.java:326-333): one map-side-combinable hash agg."""
    return (mentions.groupBy("value", "tag")
            .agg(F.count("*").alias("n")))


def build_case_dictionary_df(transcripts: DataFrame,
                             min_prob: float = 0.5) -> DataFrame:
    """Tokens that are usually lowercase when NOT at sentence start
    (PalladianNer.java:191-222, getCaseSignature StringHelper.java:1827-1860)
    — the relational single-sentence-per-turn form: tokenize JVM-side with
    the verbatim reference regex, drop the sentence-initial token (position
    0), aggregate the lowercase fraction per lowercased token.

    (The offset-exact multi-sentence variant lives in ner/train.py and is
    golden-tested; this one is the shape that runs over 10^12 turns.)
    """
    toks = F.regexp_extract_all(F.col("text"),
                                F.lit(f"(?s)({TOKEN_SPLIT_REGEX})"), 1)
    exploded = (transcripts
                .select(F.posexplode(toks).alias("pos", "token"))
                .where(F.col("pos") > 0)
                # letter-initial tokens only (case has no meaning otherwise)
                .where(F.col("token").rlike(r"^\p{L}")))
    return (exploded
            .groupBy(F.lower(F.col("token")).alias("token"))
            .agg(F.count("*").alias("n_total"),
                 F.sum(F.when(F.col("token") == F.lower(F.col("token")), 1)
                       .otherwise(0)).alias("n_lower"))
            .withColumn("prob", F.col("n_lower") / F.col("n_total"))
            .where(F.col("prob") > min_prob))


def build_annotation_dictionary_df(mentions: DataFrame, n: int = 5,
                                   padding: bool = True) -> DataFrame:
    """Char-n-gram → tag counts over mention VALUES
    (ANNOTATION_FEATURE_SETTING = chars(5) + characterPadding,
    PalladianNerTrainingSettings.java:83): JVM n-gram explode + hash agg."""
    pad = "#" * (n - 1)
    source = F.lower(F.col("value"))
    padded = F.concat(F.lit(pad), source, F.lit(pad)) if padding else source
    # sequence(1, 0) counts DOWN in Spark — guard short strings with a
    # typed empty array instead
    idx = F.when(F.length(padded) >= n,
                 F.sequence(F.lit(1), F.length(padded) - (n - 1))) \
        .otherwise(F.expr("CAST(array() AS array<int>)"))
    grams = F.filter(
        F.transform(idx, lambda i: padded.substr(i, F.lit(n))),
        # all-padding grams are skipped (CharacterNGramTokenizer.java:72-78)
        lambda g: g != F.lit("#" * n))
    return (mentions
            .select(F.explode(grams).alias("term"), F.col("tag").alias("category"))
            .groupBy("term", "category")
            .agg(F.count("*").alias("n")))
