"""Distributed NER-training builders ≡ Python builders (context dictionary,
left contexts) on shared synthetic texts."""

import pytest

from palladian_spark.textproc.taggers import Annotation

TEXTS = [
    ("c0", 0, "President Bob Miller met Alice Johnson in Berlin today.",
     [(10, "Bob Miller", "PER"), (25, "Alice Johnson", "PER"),
      (42, "Berlin", "LOC")]),
    ("c0", 1, "President Carol Davis visited Paris on March 3.",
     [(10, "Carol Davis", "PER"), (30, "Paris", "LOC")]),
    ("c1", 0, "Later President Bob Miller left Berlin for Paris quickly.",
     [(16, "Bob Miller", "PER"), (32, "Berlin", "LOC"),
      (43, "Paris", "LOC")]),
]


@pytest.fixture(scope="module")
def frames(spark):
    t_rows = [(c, i, text) for c, i, text, _ in TEXTS]
    m_rows = [(c, i, s, s + len(v), v, tag, 1.0)
              for c, i, text, anns in TEXTS for s, v, tag in anns]
    t = spark.createDataFrame(t_rows, "conv_id string, turn_idx int, text string")
    m = spark.createDataFrame(
        m_rows, "conv_id string, turn_idx int, start int, end int,"
        " value string, tag string, conf double")
    return t, m


def test_context_dictionary_df_matches_python(spark, frames):
    from palladian_spark.ner.train import build_context_dictionary
    from palladian_spark.ner.train_df import build_context_dictionary_df
    t, m = frames

    # python builder runs per text; merge counts across texts
    expected: dict = {}
    for _, _, text, anns in TEXTS:
        model = build_context_dictionary(
            text, [Annotation(s, v, tag) for s, v, tag in anns])
        for term, cats in model.terms.items():
            for cat, n in cats.items():
                expected[(term, cat)] = expected.get((term, cat), 0) + n

    got = {(r["term"], r["category"]): r["n"]
           for r in build_context_dictionary_df(t, m).collect()}
    assert got == expected


def test_complete_retrain_df_matches_python(spark):
    """Corpus-level Complete-mode retrain ≡ per-text Python form
    (PalladianNer.java:418-436): same ERROR1 set, same removeAnnotations,
    NO_ENTITY present in the rebuilt annotation dictionary."""
    from palladian_spark.ner.model import NerModel
    from palladian_spark.ner.tag import get_annotations
    from palladian_spark.ner.train import (
        build_annotation_dictionary, build_entity_dictionary,
        complete_retrain)
    from palladian_spark.ner.train_df import complete_retrain_df
    from palladian_spark.textproc.taggers import NO_ENTITY, Annotation

    corpus = [
        ("c0", 0, "Alice Johnson visited Berlin. The Thing happened again.",
         [(0, "Alice Johnson", "PER"), (22, "Berlin", "LOC")]),
        ("c0", 1, "Alice Johnson met Bob Miller. Weird Stuff occurred.",
         [(0, "Alice Johnson", "PER"), (18, "Bob Miller", "PER")]),
        ("c1", 0, "Berlin welcomed Bob Miller warmly yesterday evening.",
         [(0, "Berlin", "LOC"), (16, "Bob Miller", "PER")]),
    ]
    all_gold = [Annotation(s, v, t)
                for _, _, _, anns in corpus for s, v, t in anns]
    model = NerModel()
    model.entity_dictionary = build_entity_dictionary(all_gold)
    model.annotation_dictionary = build_annotation_dictionary(all_gold)

    # python twin, merged corpus-level: per-text ERROR1 union
    expected_remove = set()
    gold_values = {a.value.lower() for a in all_gold}
    for _, _, text, anns in corpus:
        m = NerModel()
        m.entity_dictionary = model.entity_dictionary
        m.annotation_dictionary = model.annotation_dictionary
        m = complete_retrain(text, [Annotation(s, v, t)
                                    for s, v, t in anns], m)
        expected_remove |= m.remove_annotations
    assert "the thing" in expected_remove     # the planted false positive

    t = spark.createDataFrame([(c, i, text) for c, i, text, _ in corpus],
                              "conv_id string, turn_idx int, text string")
    g = spark.createDataFrame(
        [(c, i, s, s + len(v), v, tag, 1.0)
         for c, i, _, anns in corpus for s, v, tag in anns],
        "conv_id string, turn_idx int, start int, end int, value string,"
        " tag string, conf double")
    ann_dict, remove = complete_retrain_df(t, g, model)
    got_remove = {r["remove_value"] for r in remove.collect()}
    assert got_remove == expected_remove
    assert ann_dict.where(f"category = '{NO_ENTITY}'").count() > 0


def test_left_contexts_df_matches_python(spark, frames):
    from palladian_spark.ner.train import build_left_contexts
    from palladian_spark.ner.train_df import build_left_contexts_df
    t, m = frames

    # python builder: aggregate counts over the corpus by concatenating —
    # run it per text and merge the underlying counters manually
    from collections import Counter
    from palladian_spark.ner.contexts import get_left_contexts
    from palladian_spark.textproc.tokenize import starts_uppercase
    outside: Counter = Counter()
    inside: Counter = Counter()
    for _, _, text, anns in TEXTS:
        for s, v, tag in anns:
            outside.update(get_left_contexts(Annotation(s, v, tag), text, 3))
            parts = v.split(" ")
            for i in range(len(parts)):
                inside[" ".join(parts[:i + 1])] += 1
    expected = set()
    for ctx, n_out in outside.items():
        if starts_uppercase(ctx) and n_out >= 2 \
                and inside.get(ctx, 0) / n_out < 1:
            expected.add(ctx)

    got = {r["left_context"]
           for r in build_left_contexts_df(t, m).collect()}
    assert got == expected
    assert "President" in got          # the boundary-fixing prefix
