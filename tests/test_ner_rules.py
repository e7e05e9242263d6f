"""Golden tests for NER helper rules and training builders.

Expectations from PalladianNerTest.java:19-74.
"""

from palladian_spark.ner.contexts import get_character_context, get_left_contexts
from palladian_spark.ner.train import build_case_dictionary
from palladian_spark.textproc.taggers import (
    Annotation,
    is_date_fragment,
    remove_date_fragment,
    remove_nested,
)


def test_remove_date_fragment():
    r = remove_date_fragment(Annotation(10, "June John Hiatt", ""))
    assert r.start == 15 and r.value == "John Hiatt"

    r = remove_date_fragment(Annotation(0, "John Hiatt June", ""))
    assert r.start == 0 and r.value == "John Hiatt"

    r = remove_date_fragment(Annotation(0, "Apr. John Hiatt", ""))
    assert r.start == 5 and r.value == "John Hiatt"

    r = remove_date_fragment(Annotation(0, "John Hiatt Apr.", ""))
    assert r.start == 0 and r.value == "John Hiatt"

    assert remove_date_fragment(Annotation(0, "John Hiatt", "")) is None


def test_is_date_fragment():
    assert not is_date_fragment("June John Hiatt")
    assert is_date_fragment("January")
    assert is_date_fragment("JANUARY")
    assert is_date_fragment("January ")


def test_get_left_contexts():
    text = ("Blistering heat blanketed much of the eastern United States for the "
            "third straight day on Sunday, after violent storms that took at "
            "least a dozen lives and knocked out power to more than 3 million "
            "customers.")
    ann = Annotation(46, "United States", "")
    contexts = get_left_contexts(ann, text, 3)
    assert contexts == ["eastern", "the eastern", "of the eastern"]


def test_get_character_context():
    text = "aaa bbb Entity ccc ddd"
    ann = Annotation(8, "Entity", "")
    ctx = get_character_context(ann, text, 40)
    assert ctx == "aaa bbb__ccc ddd"


def test_build_case_dictionary_golden():
    text = ("Despite their shared upbringing and involvement in the Spanish "
            "Treason, the conspirators chose not to reveal the plot to him until "
            "14 October 1605, shortly after his father died, and just weeks "
            "before the planned explosion. According to his confession, the "
            "meeting took place at the home of Tresham's brother-in-law, Lord "
            "Stourton, in Clerkenwell.")
    case_dict = build_case_dictionary(text)
    assert len(case_dict) == 33
    assert "despite" not in case_dict    # sentence-start token skipped
    assert "according" not in case_dict  # sentence-start token skipped
    assert "involvement" in case_dict


def test_remove_nested():
    anns = [
        Annotation(0, "United States of America", "X"),
        Annotation(0, "United", "X"),
        Annotation(7, "States", "X"),
        Annotation(30, "USA", "X"),
    ]
    kept = remove_nested(anns)
    assert [a.value for a in kept] == ["United States of America", "USA"]
