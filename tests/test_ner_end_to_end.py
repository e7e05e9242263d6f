"""End-to-end NER kernel test: train on a tiny annotated corpus, tag new text.

Mirrors the shape of the reference integration test (PalladianNerIT.java)
at unit scale: the model must pick up dictionary entities exactly and
classify unseen-but-similar surface forms via the char-5-gram dictionaries.
"""

from palladian_spark.ner.model import NerModel
from palladian_spark.ner.tag import get_annotations
from palladian_spark.ner.train import train_english
from palladian_spark.textproc.taggers import Annotation

TRAIN_TEXT = (
    "John Smith works for Acme Corporation in Berlin. "
    "Mary Jones works for Globex Corporation in Paris. "
    "Acme Corporation hired Peter Brown last year. "
    "Berlin is a large city and Paris is a large city. "
    "Anna Miller works for Initech Corporation in London. "
    "Globex Corporation opened an office in London. "
)


def _find_all(text, value):
    out, idx = [], 0
    while True:
        idx = text.find(value, idx)
        if idx == -1:
            return out
        out.append(idx)
        idx += 1


def train_annotations():
    anns = []
    for value, tag in [
        ("John Smith", "PER"), ("Mary Jones", "PER"), ("Peter Brown", "PER"),
        ("Anna Miller", "PER"),
        ("Acme Corporation", "ORG"), ("Globex Corporation", "ORG"),
        ("Initech Corporation", "ORG"),
        ("Berlin", "LOC"), ("Paris", "LOC"), ("London", "LOC"),
    ]:
        for start in _find_all(TRAIN_TEXT, value):
            anns.append(Annotation(start, value, tag))
    return anns


def test_train_and_tag():
    model = train_english(TRAIN_TEXT, train_annotations())
    assert model.entity_dictionary.terms["Berlin"] == {"LOC": 2}

    text = "Peter Brown works for Globex Corporation in Berlin."
    result = get_annotations(text, model)
    by_value = {a.value: a.tag for a in result}
    assert by_value.get("Peter Brown") == "PER"
    assert by_value.get("Globex Corporation") == "ORG"
    assert by_value.get("Berlin") == "LOC"
    # offsets must slice the text exactly (per-turn text-equality invariant)
    for a in result:
        assert text[a.start:a.end] == a.value


def test_unseen_similar_surface_form():
    model = train_english(TRAIN_TEXT, train_annotations())
    # "Initech Corporation" patterns → unseen "Vandelay Corporation" should
    # still classify ORG via the char-5-gram annotation + context dictionaries
    text = "Peter Brown works for Vandelay Corporation in London."
    result = get_annotations(text, model)
    tags = {a.value: a.tag for a in result}
    assert tags.get("Vandelay Corporation") == "ORG"
