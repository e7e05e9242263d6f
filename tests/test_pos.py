"""POS tagging & chunking tests: rule-tagger Python↔JVM equivalence,
classifier tagger training/tagging, chunker equivalence."""

import pytest

from palladian_spark.textproc.pos import (
    ClassifierPosTagger, chunk_phrases, normalize_tag, pos_tag_rules,
    rule_pos_tag,
)

TRICKY_TOKENS = [
    "Customer", "works", "for", "in", "the", "a", "1.5", "42", "s", "ss",
    "boss", "quickly", "running", "jumped", "U.S.", ".", "...", "&",
    "iPhone", "Berlin", "cats", "é", "Émile", "x",
]


def test_rule_tagger_basics():
    assert rule_pos_tag("Customer") == "NNP"
    assert rule_pos_tag("works") == "VBZ"
    assert rule_pos_tag("for") == "IN"
    assert rule_pos_tag("the") == "DT"
    assert rule_pos_tag("1.5") == "CD"
    assert rule_pos_tag(".") == "."
    assert rule_pos_tag("quickly") == "RB"
    assert rule_pos_tag("running") == "VBG"
    assert rule_pos_tag("jumped") == "VBD"
    assert rule_pos_tag("boss") == "NN"      # 'ss' guard
    assert rule_pos_tag("s") == "VBZ"        # single 's' matches endswith


def test_rule_tagger_python_jvm_equivalence(spark):
    from pyspark.sql import functions as F
    from palladian_spark.operators.pos_df import rule_pos_col
    df = spark.createDataFrame([(t,) for t in TRICKY_TOKENS], "token string")
    got = {r["token"]: r["pos"]
           for r in df.withColumn("pos", rule_pos_col(F.col("token"))).collect()}
    for t in TRICKY_TOKENS:
        assert got[t] == rule_pos_tag(t), t


def test_normalize_tag():
    assert normalize_tag("NN-TL") == "NN"
    assert normalize_tag("vbz") == "VBZ"


TRAIN = [
    ("the", "DT"), ("dog", "NN"), ("dogs", "NNS"), ("barks", "VBZ"),
    ("barked", "VBD"), ("loud", "JJ"), ("loudly", "RB"), ("Berlin", "NP"),
    ("in", "IN"), ("runs", "VBZ"), ("cat", "NN"), ("the", "DT"),
    ("sleeps", "VBZ"), ("Paris", "NP"),
]


def test_classifier_pos_tagger_seen_words():
    tagger = ClassifierPosTagger().train(TRAIN)
    assert tagger.tag_word("the") == "DT"
    assert tagger.tag_word("dog") == "NN"
    assert tagger.tag_word("Berlin") == "NP"
    assert tagger.tag_word("barks") == "VBZ"


def test_classifier_pos_tagger_generalizes_by_features():
    tagger = ClassifierPosTagger().train(TRAIN)
    # unseen capitalized word → NP via startsUppercase/first-char features
    assert tagger.tag_word("Munich") in ("NP", "NNP")
    # aligned tagging keeps tokenizer offsets
    tagged = tagger.tag("the dog barks in Berlin.")
    assert [t.value for t, _ in tagged] == \
        ["the", "dog", "barks", "in", "Berlin", "."]
    assert tagged[0][0].start == 0 and tagged[4][0].start == 17


def test_chunk_phrases_np():
    tagged = pos_tag_rules("Customer C5 works for Supplier S12 in Nation N3.")
    chunks = chunk_phrases(tagged, "NP")
    assert [(c[0], c[2]) for c in chunks] == [
        (0, "Customer C5"), (22, "Supplier S12"), (38, "Nation N3")]
    # char offsets line up with the source text
    text = "Customer C5 works for Supplier S12 in Nation N3."
    for start, end, phrase in chunks:
        assert text[start:end] == phrase


def test_np_chunks_df_matches_python(spark):
    from palladian_spark.operators.pos_df import np_chunks_df, pos_tag_df
    texts = [
        ("c0", 0, "Customer C5 works for Supplier S12 in Nation N3."),
        ("c0", 1, "the quick dog barked loudly in Berlin yesterday."),
        ("c1", 0, "Paris. 42 cats."),
    ]
    df = spark.createDataFrame(texts, "conv_id string, turn_idx int, text string")
    got = sorted((r["conv_id"], r["turn_idx"], r["chunk_start"],
                  r["chunk_end"], r["phrase"])
                 for r in np_chunks_df(pos_tag_df(df)).collect())
    expected = sorted(
        (cid, tix, c[0], c[1], c[2])
        for cid, tix, text in texts
        for c in chunk_phrases(pos_tag_rules(text), "NP"))
    assert got == expected
