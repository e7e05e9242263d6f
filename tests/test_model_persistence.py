"""NerModel persistence round-trip (replaces PalladianNer.saveModel /
loadModel, PalladianNer.java:155-182) — the model must tag identically
after a save/load cycle."""

from palladian_spark.ner.model import NerModel
from palladian_spark.ner.tag import get_annotations
from palladian_spark.ner.train import train_english
from palladian_spark.textproc.taggers import Annotation


def test_model_save_load_roundtrip(tmp_path):
    text = ("Alice Johnson works for Acme Corporation in Berlin. "
            "Acme Corporation is based in Berlin.")
    gold = [Annotation(0, "Alice Johnson", "PER"),
            Annotation(24, "Acme Corporation", "ORG"),
            Annotation(44, "Berlin", "LOC"),
            Annotation(52, "Acme Corporation", "ORG"),
            Annotation(81, "Berlin", "LOC")]
    model = train_english(text, gold)
    model.remove_annotations = {"the thing"}
    model.concept_likelihood_order = ["PER", "ORG", "LOC"]

    path = str(tmp_path / "model")
    model.save(path)
    loaded = NerModel.load(path)

    assert loaded.language_mode == model.language_mode
    assert loaded.lower_case_dictionary == model.lower_case_dictionary
    assert loaded.left_contexts == model.left_contexts
    assert loaded.remove_annotations == {"the thing"}
    assert loaded.concept_likelihood_order == ["PER", "ORG", "LOC"]
    assert loaded.entity_dictionary.terms == model.entity_dictionary.terms
    assert loaded.annotation_dictionary.terms == model.annotation_dictionary.terms

    before = [(a.start, a.value, a.tag) for a in get_annotations(text, model)]
    after = [(a.start, a.value, a.tag) for a in get_annotations(text, loaded)]
    assert before == after and before  # identical, and non-empty
