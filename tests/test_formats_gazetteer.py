"""Format conversions (FileFormatParser / NerHelper.tag semantics),
gazetteer DictionaryTagger, equalize/Complete-mode training."""

import pytest

from palladian_spark.textproc.formats import (
    annotations_from_column, annotations_from_xml, column_to_xml, get_tags_from_column,
    get_text, tag_text, xml_to_column,
)
from palladian_spark.textproc.taggers import Annotation

COLUMN = "\n".join([
    "John\tPER", "Smith\tPER", "lives\tO", "in\tO", "Berlin\tLOC", ".\tO",
])
XML = "<PER>John Smith</PER> lives in <LOC>Berlin</LOC> ."


def test_column_to_xml_roundtrip():
    assert column_to_xml(COLUMN) == XML
    assert xml_to_column(XML) == COLUMN


def test_get_text_and_tags():
    assert get_text(XML) == "John Smith lives in Berlin ."
    assert get_tags_from_column(COLUMN) == {"PER", "O", "LOC"}


def test_annotations_from_column_combined():
    text, anns = annotations_from_column(COLUMN)
    assert text == "John Smith lives in Berlin ."
    assert [(a.start, a.value, a.tag) for a in anns] == [
        (0, "John Smith", "PER"), (20, "Berlin", "LOC")]
    for a in anns:
        assert text[a.start:a.end] == a.value


def test_annotations_from_xml_offsets():
    text, anns = annotations_from_xml(XML)
    assert text == "John Smith lives in Berlin ."
    assert [(a.start, a.value, a.tag) for a in anns] == [
        (0, "John Smith", "PER"), (20, "Berlin", "LOC")]


def test_tag_text_render_and_invariant():
    text = "John Smith lives in Berlin ."
    anns = [Annotation(0, "John Smith", "PER"), Annotation(20, "Berlin", "LOC")]
    assert tag_text(text, anns, "XML") == XML
    assert tag_text(text, anns, "BRACKETS") == \
        "[PER John Smith ] lives in [LOC Berlin ] ."
    assert tag_text(text, anns, "SLASHES") == \
        "John/PER Smith/PER lives in Berlin/LOC ."
    with pytest.raises(AssertionError):
        tag_text(text, [Annotation(1, "John", "PER")], "XML")


def test_tag_text_drops_nested():
    text = "John Smith lives here."
    anns = [Annotation(0, "John Smith", "PER"), Annotation(5, "Smith", "PER")]
    assert tag_text(text, anns) == "<PER>John Smith</PER> lives here."


# ---------------------------------------------------------------------------
# gazetteer
# ---------------------------------------------------------------------------

def test_dictionary_tag_df(spark):
    from palladian_spark.operators.mentions import dictionary_tag_df
    t = spark.createDataFrame(
        [("c", 0, "Alice Johnson met Acme Corporation in berlin today.")],
        "conv_id string, turn_idx int, text string")
    ed = spark.createDataFrame(
        [("Alice Johnson", "PER"), ("Acme Corporation", "ORG"),
         ("Berlin", "LOC")], "surface string, concept string")
    got = sorted((r["start"], r["value"], r["tag"])
                 for r in dictionary_tag_df(t, ed).collect())
    # match is case-insensitive on the normalized key ("berlin" hits LOC)
    assert got == [(0, "Alice Johnson", "PER"),
                   (18, "Acme Corporation", "ORG"),
                   (38, "berlin", "LOC")]


def test_dictionary_tag_df_denests_overlaps(spark):
    from palladian_spark.operators.mentions import dictionary_tag_df
    t = spark.createDataFrame([("c", 0, "New York City is big.")],
                              "conv_id string, turn_idx int, text string")
    ed = spark.createDataFrame(
        [("New York City", "LOC"), ("New York", "LOC"), ("York", "LOC")],
        "surface string, concept string")
    got = [(r["start"], r["value"]) for r in dictionary_tag_df(t, ed).collect()]
    assert got == [(0, "New York City")]


# ---------------------------------------------------------------------------
# training completions
# ---------------------------------------------------------------------------

def test_equalize_type_counts_deterministic():
    from palladian_spark.ner.train import equalize_type_counts
    anns = [Annotation(i * 10, f"P{i}", "PER") for i in range(5)] \
        + [Annotation(100 + i * 10, f"L{i}", "LOC") for i in range(2)]
    out = equalize_type_counts(anns)
    by_tag = {}
    for a in out:
        by_tag.setdefault(a.tag, []).append(a)
    assert len(by_tag["PER"]) == 2 and len(by_tag["LOC"]) == 2
    # deterministic: earliest-offset annotations survive
    assert [a.value for a in by_tag["PER"]] == ["P0", "P1"]
    assert equalize_type_counts(anns) == out


def test_complete_retrain_learns_false_positives():
    from palladian_spark.ner.model import NerModel
    from palladian_spark.ner.tag import get_annotations
    from palladian_spark.ner.train import (
        build_annotation_dictionary, build_entity_dictionary, complete_retrain)
    from palladian_spark.textproc.taggers import NO_ENTITY

    text = "Alice Johnson visited Berlin. The Thing happened again."
    gold = [Annotation(0, "Alice Johnson", "PER"), Annotation(22, "Berlin", "LOC")]
    model = NerModel()
    model.entity_dictionary = build_entity_dictionary(gold)
    model.annotation_dictionary = build_annotation_dictionary(gold)

    before = {a.value for a in get_annotations(text, model,
                                               tag_urls_too=False,
                                               tag_dates_too=False)}
    assert "The Thing" in before      # false positive from StringTagger

    model = complete_retrain(text, gold, model)
    assert "the thing" in model.remove_annotations
    assert NO_ENTITY in model.annotation_dictionary.document_counts

    after = {a.value for a in get_annotations(text, model,
                                              tag_urls_too=False,
                                              tag_dates_too=False)}
    assert "The Thing" not in after   # rule #2 now removes it
    assert "Alice Johnson" in after and "Berlin" in after
