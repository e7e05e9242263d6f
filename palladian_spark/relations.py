"""Pattern-based relation extraction → (subj, pred, obj) triples.

The reference has no end-to-end relation extractor; this stage composes its
building blocks exactly as SURVEY.md §2.7 lays out:
  * sentence windows            — PalladianSentenceDetector (textproc.tokenize)
  * typed mentions              — the NER chain (ner.tag)
  * same-sentence co-occurrence — CoOccurrenceRetriever.java:27-60 shape
  * inter-mention token windows — NerHelper.java:244-298 shape
  * pattern mining              — PatternAnalyzer.java:46-64 shape
    (mine_patterns_df: frequent inter-mention windows by type pair)

A triple fires when the ordered mention pair (a before b) in one sentence
has an inter-mention window that fully matches a predicate pattern.
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple, Optional, Sequence

import pandas as pd
import regex

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

from palladian_spark.ner.model import NerModel
from palladian_spark.ner.tag import ClassifiedAnnotation, get_annotations
from palladian_spark.textproc.taggers import tag_dates, tag_smileys, tag_urls
from palladian_spark.textproc.tokenize import sentences as split_sentences


class PredicatePattern(NamedTuple):
    pred: str
    window_regex: str                 # fullmatch against the inter-mention window
    subj_types: Optional[frozenset]   # None = any
    obj_types: Optional[frozenset]


def pattern(pred: str, window_regex: str, subj_types=None, obj_types=None) -> PredicatePattern:
    return PredicatePattern(
        pred, window_regex,
        frozenset(subj_types) if subj_types else None,
        frozenset(obj_types) if obj_types else None)


# seed predicate dictionary (FIXTURES.md §8 shape)
DEFAULT_PATTERNS: List[PredicatePattern] = [
    pattern("works_for", r"\s*,?\s*(works|worked|working)\s+(for|at)\s*",
            {"PER"}, {"ORG"}),
    pattern("located_in", r"\s*,?\s*(is|was)?\s*(located|based)?\s*in\s*",
            {"ORG"}, {"LOC"}),
    pattern("met", r"\s*,?\s*met(\s+with)?\s*", {"PER"}, {"PER"}),
    pattern("visited", r"\s*,?\s*visited\s*", {"PER"}, {"LOC"}),
]

TRIPLE_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("subj_start", IntegerType()),
    StructField("subj_end", IntegerType()),
    StructField("obj_start", IntegerType()),
    StructField("obj_end", IntegerType()),
    StructField("conf", DoubleType()),
])


def triples_from_mentions(text: str, mentions: Sequence[ClassifiedAnnotation],
                          patterns: Sequence[PredicatePattern]) -> List[tuple]:
    """Per-turn kernel: same-sentence ordered mention pairs × patterns."""
    if not mentions:
        return []
    masks = tag_urls(text) + tag_dates(text) + tag_smileys(text)
    out: List[tuple] = []
    compiled = [(p, regex.compile(p.window_regex)) for p in patterns]
    for sent in split_sentences(text, masks):
        s_lo, s_hi = sent.start, sent.start + len(sent.value)
        in_sent = [m for m in mentions if m.start >= s_lo and m.end <= s_hi]
        for i, subj in enumerate(in_sent):
            for obj in in_sent[i + 1:]:
                if obj.start < subj.end:
                    continue  # overlapping/nested — no window
                window = text[subj.end:obj.start]
                for p, rx in compiled:
                    if p.subj_types and subj.tag not in p.subj_types:
                        continue
                    if p.obj_types and obj.tag not in p.obj_types:
                        continue
                    if rx.fullmatch(window):
                        conf = min(
                            subj.scores.get(subj.tag, 1.0) if subj.scores else 1.0,
                            obj.scores.get(obj.tag, 1.0) if obj.scores else 1.0)
                        out.append((subj.value, p.pred, obj.value,
                                    subj.start, subj.end, obj.start, obj.end,
                                    float(conf)))
                        break
    return out


def extract_triples(transcripts: DataFrame, model: NerModel,
                    patterns: Sequence[PredicatePattern] = tuple(DEFAULT_PATTERNS),
                    ensure_parallelism: bool = True) -> DataFrame:
    """The fused hot path: text → NER chain → sentence pairing → triples in
    ONE Arrow-batched stage (model + patterns broadcast).  With
    ``ensure_parallelism`` (default) the input is salted-repartitioned to
    full parallelism first — the stage is Python-CPU-bound, so it must
    never inherit a coalesced 1-partition plan from a small upstream join."""
    from palladian_spark.operators.mentions import ensure_map_parallelism
    if ensure_parallelism:
        transcripts = ensure_map_parallelism(transcripts)
    spark = transcripts.sparkSession
    model_bc = spark.sparkContext.broadcast(model)
    patterns = list(patterns)

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = model_bc.value
        cache: dict = {}
        cols = ("conv_id", "turn_idx", "subj", "pred", "obj", "subj_start",
                "subj_end", "obj_start", "obj_end", "conf")
        for pdf in iterator:
            out = {k: [] for k in cols}
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                if text is None:
                    continue
                mentions = get_annotations(text, m, classify_cache=cache)
                for row in triples_from_mentions(text, mentions, patterns):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    for k, v in zip(cols[2:], row):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return (transcripts
            .select("conv_id", "turn_idx", "text")
            .mapInPandas(run, TRIPLE_SCHEMA))


def canonicalize_triples(triples: DataFrame, entity_dict: DataFrame,
                         metric: str = "jaro_winkler",
                         threshold: float = 0.9,
                         persist: bool = True) -> DataFrame:
    """Replace subj/obj surface forms with canonical entity surfaces via the
    linking stage (broadcast joins), then dedup per (conv, turn, s, p, o).

    Scale notes: the raw triple stream is persisted (memory+disk) before
    linking — the linker needs DISTINCT surfaces and the final join needs
    the rows again, and without pinning, Spark would re-run the expensive
    upstream NER stage for each.  (On a cluster the raw stream is the
    checkpointed ``triples_raw`` lineage table — see pipeline.run_pipeline —
    which serves the same purpose durably.)  subj and obj surfaces are
    linked in ONE pass over their union, and the surface→canonical mapping
    is broadcast back, so the only shuffles are the distinct and the final
    dedup agg.
    """
    from palladian_spark.linking import link_mentions

    if persist:
        from pyspark import StorageLevel
        triples = triples.persist(StorageLevel.MEMORY_AND_DISK)

    surfaces = (triples.select(F.col("subj").alias("value"))
                .unionByName(triples.select(F.col("obj").alias("value")))
                .distinct()
                .withColumn("conv_id", F.lit(""))
                .withColumn("turn_idx", F.lit(0)))
    mapping = (link_mentions(surfaces, entity_dict, metric, threshold)
               .where(F.col("canonical").isNotNull())
               .select(F.col("value").alias("_surface"),
                       F.col("canonical").alias("_canon")))
    mapping = F.broadcast(mapping)

    out = (triples
           .join(mapping.withColumnRenamed("_surface", "_s_surface")
                        .withColumnRenamed("_canon", "_s_canon"),
                 triples.subj == F.col("_s_surface"), "left")
           .withColumn("subj", F.coalesce("_s_canon", "subj"))
           .drop("_s_surface", "_s_canon"))
    out = (out
           .join(mapping.withColumnRenamed("_surface", "_o_surface")
                        .withColumnRenamed("_canon", "_o_canon"),
                 out.obj == F.col("_o_surface"), "left")
           .withColumn("obj", F.coalesce("_o_canon", "obj"))
           .drop("_o_surface", "_o_canon"))
    return (out.groupBy("conv_id", "turn_idx", "subj", "pred", "obj")
            .agg(F.min("subj_start").alias("subj_start"),
                 F.min("subj_end").alias("subj_end"),
                 F.min("obj_start").alias("obj_start"),
                 F.min("obj_end").alias("obj_end"),
                 F.max("conf").alias("conf")))


def cooccurrence_pairs(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """Same-sentence mention pair counts (CoOccurrenceRetriever.java:27-60):
    the (subj, obj) candidate generator as a relational self-join keyed by
    (conv_id, turn_idx, sent_idx)."""
    m = (mentions.alias("m")
         .join(sentences.alias("s"),
               (F.col("m.conv_id") == F.col("s.conv_id"))
               & (F.col("m.turn_idx") == F.col("s.turn_idx"))
               & (F.col("m.start") >= F.col("s.sent_start"))
               & (F.col("m.end") <= F.col("s.sent_start")
                  + F.length("s.sentence")))
         .select("m.conv_id", "m.turn_idx", "s.sent_idx",
                 "m.start", "m.end", "m.value", "m.tag"))
    a, b = m.alias("a"), m.alias("b")
    pairs = (a.join(b, (F.col("a.conv_id") == F.col("b.conv_id"))
                    & (F.col("a.turn_idx") == F.col("b.turn_idx"))
                    & (F.col("a.sent_idx") == F.col("b.sent_idx"))
                    & (F.col("a.end") <= F.col("b.start"))))
    return (pairs.groupBy(F.col("a.value").alias("left_value"),
                          F.col("a.tag").alias("left_tag"),
                          F.col("b.value").alias("right_value"),
                          F.col("b.tag").alias("right_tag"))
            .count())


def mine_patterns_df(transcripts: DataFrame, model: NerModel,
                     min_count: int = 2, max_window_chars: int = 60) -> DataFrame:
    """PatternAnalyzer-shaped mining (PatternAnalyzer.java:46-64): frequent
    inter-mention windows per (subj_type, obj_type), descending by count —
    seeds for the predicate dictionary."""
    spark = transcripts.sparkSession
    model_bc = spark.sparkContext.broadcast(model)

    schema = StructType([
        StructField("subj_type", StringType()),
        StructField("obj_type", StringType()),
        StructField("window", StringType()),
    ])

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = model_bc.value
        for pdf in iterator:
            out = {"subj_type": [], "obj_type": [], "window": []}
            for text in pdf["text"]:
                if text is None:
                    continue
                mentions = get_annotations(text, m)
                masks = tag_urls(text) + tag_dates(text) + tag_smileys(text)
                for sent in split_sentences(text, masks):
                    s_lo = sent.start
                    s_hi = sent.start + len(sent.value)
                    in_sent = [x for x in mentions
                               if x.start >= s_lo and x.end <= s_hi]
                    for i, a in enumerate(in_sent):
                        for b in in_sent[i + 1:]:
                            if b.start < a.end:
                                continue
                            window = text[a.end:b.start].strip().lower()
                            if 0 < len(window) <= max_window_chars:
                                out["subj_type"].append(a.tag)
                                out["obj_type"].append(b.tag)
                                out["window"].append(window)
            yield pd.DataFrame(out)

    raw = transcripts.select("conv_id", "turn_idx", "text").mapInPandas(run, schema)
    return (raw.groupBy("subj_type", "obj_type", "window").count()
            .where(F.col("count") >= min_count)
            .orderBy(F.desc("count")))
