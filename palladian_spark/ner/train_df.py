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


def char_ngram_col(source, n: int = 5, padding: bool = True):
    """array<string> of lowercase char n-grams of ``source`` — the JVM
    building block for the n-gram dictionaries."""
    pad = "#" * (n - 1)
    low = F.lower(source)
    padded = F.concat(F.lit(pad), low, F.lit(pad)) if padding else low
    # sequence(1, 0) counts DOWN in Spark — guard short strings with a
    # typed empty array instead
    idx = F.when(F.length(padded) >= n,
                 F.sequence(F.lit(1), F.length(padded) - (n - 1))) \
        .otherwise(F.expr("CAST(array() AS array<int>)"))
    return F.filter(
        F.transform(idx, lambda i: padded.substr(i, F.lit(n))),
        # all-padding grams are skipped (CharacterNGramTokenizer.java:72-78)
        lambda g: g != F.lit("#" * n))


def build_annotation_dictionary_df(mentions: DataFrame, n: int = 5,
                                   padding: bool = True) -> DataFrame:
    """Char-n-gram → tag counts over mention VALUES
    (ANNOTATION_FEATURE_SETTING = chars(5) + characterPadding,
    PalladianNerTrainingSettings.java:83): JVM n-gram explode + hash agg."""
    grams = char_ngram_col(F.col("value"), n, padding)
    return (mentions
            .select(F.explode(grams).alias("term"), F.col("tag").alias("category"))
            .groupBy("term", "category")
            .agg(F.count("*").alias("n")))


def error1_mentions_df(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """ERROR1 set of the reference's evaluation (NamedEntityRecognizer.java
    :98-184 categories): predicted mentions overlapping NO gold span of the
    same turn.  One range-condition left-anti join on (conv_id, turn_idx)."""
    g = gold.select(F.col("conv_id").alias("g_conv"),
                    F.col("turn_idx").alias("g_turn"),
                    F.col("start").alias("g_start"),
                    F.col("end").alias("g_end"))
    cond = ((predicted["conv_id"] == g["g_conv"])
            & (predicted["turn_idx"] == g["g_turn"])
            & (predicted["start"] < g["g_end"])
            & (g["g_start"] < predicted["end"]))
    return predicted.join(g, cond, "left_anti")


def complete_retrain_df(transcripts: DataFrame, gold: DataFrame, model,
                        n: int = 5, padding: bool = True):
    """Distributed Complete-mode retrain (PalladianNer.java:418-436;
    SURVEY.md §2.5 training row 7): second tagging pass over the training
    corpus, ERROR1 taggings become ###NO_ENTITY### instances in a rebuilt
    annotation dictionary, and ERROR1 values never seen as gold values form
    the removeAnnotations set.

    The round-1 per-text Python form (ner/train.py:complete_retrain) is the
    golden twin; this is the corpus-level shape: one fused tagging pass +
    one overlap anti-join + one value anti-join + one dictionary agg — all
    shuffles keyed on (conv_id, turn_idx) or the value itself.

    Returns (annotation_dictionary_df, remove_annotations_df):
      * annotation_dictionary_df — (term, category, n) char-n-gram counts
        over gold values (typed) ∪ ERROR1 values (###NO_ENTITY###)
      * remove_annotations_df    — distinct lowercased ERROR1 values that
        never appear as a gold value (column ``remove_value``)
    """
    from palladian_spark.operators.mentions import extract_mentions
    from palladian_spark.textproc.taggers import NO_ENTITY

    predicted = extract_mentions(transcripts, model)
    error1 = error1_mentions_df(predicted, gold)

    training = (gold.select("value", "tag")
                .unionByName(error1.select(
                    "value", F.lit(NO_ENTITY).alias("tag"))))
    ann_dict = build_annotation_dictionary_df(training, n, padding)

    gold_values = gold.select(
        F.lower(F.col("value")).alias("remove_value")).distinct()
    remove = (error1
              .select(F.lower(F.col("value")).alias("remove_value"))
              .distinct()
              .join(gold_values, "remove_value", "left_anti"))
    return ann_dict, remove


def build_context_dictionary_df(transcripts: DataFrame, mentions: DataFrame,
                                window: int = 40, n: int = 5) -> DataFrame:
    """Char-n-gram → tag counts over each mention's ±window-char context
    string ``trim(left) + '__' + trim(right)`` (buildContextDictionary,
    PalladianNer.java:894-906; context shape NerHelper.java:300-307;
    CONTEXT_FEATURE_SETTING = chars(5) no padding): join mentions to their
    turn text, slice JVM-side, explode grams, hash agg."""
    joined = mentions.join(
        transcripts.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"])
    s0 = F.greatest(F.col("start") - window, F.lit(0))
    left = F.trim(F.col("text").substr(s0 + 1, F.col("start") - s0))
    right = F.trim(F.col("text").substr(F.col("end") + 1, F.lit(window)))
    context = F.concat(left, F.lit("__"), right)
    grams = char_ngram_col(context, n, padding=False)
    return (joined
            .select(F.explode(grams).alias("term"), F.col("tag").alias("category"))
            .groupBy("term", "category")
            .agg(F.count("*").alias("n")))


def build_left_contexts_df(transcripts: DataFrame, mentions: DataFrame,
                           size: int = 3, min_count: int = 1) -> DataFrame:
    """Boundary-fixing left contexts (buildLeftContexts,
    PalladianNer.java:860-892 + NerHelper.getLeftContexts:244-264):
    cumulative 1..size word windows left of each mention (digits → '§'),
    kept when uppercase-starting and occurring more often OUTSIDE than
    inside entity values (ratio < 1, outside ≥ 2, total ≥ min_count).

    Two hash aggregations + one join — the distributed twin of the Python
    builder (equivalence-tested).
    """
    joined = mentions.join(
        transcripts.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"])
    prefix = F.col("text").substr(F.lit(1), F.col("start"))
    words = F.filter(F.split(prefix, " "), lambda w: w != F.lit(""))
    # mention at text start → no words → sequence(1, 0) would count DOWN
    # and slice(…, 0, …) is invalid: guard with a typed empty array
    ks = F.when(F.size(words) > 0,
                F.sequence(F.lit(1), F.least(F.size(words), F.lit(size)))) \
        .otherwise(F.expr("CAST(array() AS array<int>)"))
    windows = F.transform(
        ks, lambda k: F.regexp_replace(
            F.array_join(F.slice(words, -k, k), " "), r"\d", "§"))
    outside = (joined
               .select(F.explode(windows).alias("ctx"))
               .where(F.col("ctx") != "")
               .groupBy("ctx").agg(F.count("*").alias("n_outside")))

    # inside counts: cumulative word prefixes of every mention VALUE
    vwords = F.split(F.col("value"), " ")
    vks = F.sequence(F.lit(1), F.size(vwords))
    prefixes = F.transform(
        vks, lambda k: F.array_join(F.slice(vwords, 1, k), " "))
    inside = (mentions
              .select(F.explode(prefixes).alias("ctx"))
              .groupBy("ctx").agg(F.count("*").alias("n_inside")))

    return (outside
            .join(inside, "ctx", "left")
            .withColumn("n_inside", F.coalesce("n_inside", F.lit(0)))
            .where(F.col("ctx").rlike(r"^\p{Lu}"))
            .where(F.col("n_outside") + F.col("n_inside") >= min_count)
            .where((F.col("n_inside") / F.col("n_outside") < 1)
                   & (F.col("n_outside") >= 2))
            .select(F.col("ctx").alias("left_context"),
                    "n_outside", "n_inside"))
