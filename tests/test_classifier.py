"""Golden tests for the dictionary text classifier.

Manning IR 4-doc corpus with expected class+probability per scorer
(PalladianTextClassifierTest.java:24-62).
"""

import pytest

from palladian_spark.classification.dictionary import (
    BayesScorer,
    CategoryEqualizationScorer,
    DefaultScorer,
    DictionaryBuilder,
    DictionaryModel,
    FeatureSetting,
    classify,
    document_terms,
    most_likely,
)

DOCS = [
    ("Chinese Beijing Chinese", "yes"),
    ("Chinese Chinese Shanghai", "yes"),
    ("Chinese Macao", "yes"),
    ("Tokyo Japan Chinese", "no"),
]
TEST_TEXT = "Chinese Chinese Chinese Tokyo Japan"


def train_model(setting=None):
    setting = setting or FeatureSetting.words()
    builder = DictionaryBuilder(setting)
    for text, label in DOCS:
        builder.add_text(text, label)
    return builder.create()


def test_model_statistics():
    model = train_model()
    assert model.num_uniq_terms == 6
    assert model.num_documents == 4
    assert model.num_terms == 9
    assert model.document_counts == {"yes": 3, "no": 1}
    assert model.term_counts == {"yes": 6, "no": 3}
    assert model.terms["chinese"] == {"yes": 3, "no": 1}


def test_default_scorer():
    model = train_model()
    name, prob = most_likely(classify(TEST_TEXT, model, DefaultScorer()))
    assert name == "no"
    assert prob == pytest.approx(0.79, abs=0.01)


def test_bayes_priors():
    model = train_model()
    name, prob = most_likely(classify(TEST_TEXT, model, BayesScorer(priors=True)))
    assert name == "yes"
    assert prob == pytest.approx(0.74, abs=0.01)


def test_bayes_priors_complement():
    model = train_model()
    name, prob = most_likely(
        classify(TEST_TEXT, model, BayesScorer(priors=True, complement=True)))
    assert name == "yes"
    assert prob == pytest.approx(0.88, abs=0.01)


def test_word_term_length_filter():
    # word unigrams keep only terms with length in [3, 20]
    terms = document_terms("a an the word extraordinarily-long-term-beyond",
                           FeatureSetting.words())
    assert "a" not in terms and "an" not in terms
    assert "the" in terms and "word" in terms


def test_max_terms_cap_keeps_first_seen():
    setting = FeatureSetting(feature_type="word", min_n=1, max_n=1, max_terms=2)
    terms = document_terms("alpha beta gamma alpha", setting)
    assert terms == ["alpha", "beta"]


def test_pruning():
    builder = DictionaryBuilder(FeatureSetting.words(), min_count=2)
    for text, label in DOCS:
        builder.add_text(text, label)
    model = builder.create()
    assert "chinese" in model.terms
    assert "macao" not in model.terms


def test_json_roundtrip():
    model = train_model()
    clone = DictionaryModel.from_json(model.to_json())
    assert clone.terms == model.terms
    assert clone.document_counts == model.document_counts
    name, prob = most_likely(classify(TEST_TEXT, clone, DefaultScorer()))
    assert name == "no"


def test_category_equalization_scorer():
    model = train_model()
    probs = classify(TEST_TEXT, model, CategoryEqualizationScorer())
    # equalization divides by the prior, boosting the rare "no" class further
    assert most_likely(probs)[0] == "no"
    assert probs["no"] > 0.79
