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


def test_char_terms_col_matches_python(spark):
    """JVM char-n-gram term extraction ≡ dictionary.document_terms on the
    char branch, including first-seen maxTerms capping and padding."""
    from pyspark.sql import functions as F
    from palladian_spark.classification.dictionary import (
        FeatureSetting, document_terms)
    from palladian_spark.classification.train_df import char_terms_col

    texts = ["Hello World", "aaa", "ab", "", "Mixed CASE text 42!",
             "padded", "x"]
    settings = [
        FeatureSetting.chars(4),
        FeatureSetting.chars(3, 5),
        FeatureSetting.chars(5, padding=True),
        FeatureSetting("char", 2, 3, max_terms=6),
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for setting in settings:
        got = [r["terms"] for r in
               df.select(char_terms_col(F.col("text"), setting)
                         .alias("terms")).collect()]
        want = [document_terms(t, setting) for t in texts]
        assert got == want, setting


def test_language_id_clf_self_consistent(spark):
    """Classifier language ID: deterministic, one prediction per doc, and
    on cleanly-separated vocabularies it recovers the training label."""
    from palladian_spark.operators.text_quality import language_id_clf
    rows = [
        ("d1", "en", "the cat sat on the mat with the hat"),
        ("d2", "en", "the dog ran to the park with the ball"),
        ("d3", "xx", "zuzu qixi vovo zuzu qixi wuwu zuzu"),
        ("d4", "xx", "qixi zuzu wuwu vovo qixi zuzu yxyx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    got = {r["doc_id"]: r["lang_pred"]
           for r in language_id_clf(docs).collect()}
    assert got == {"d1": "en", "d2": "en", "d3": "xx", "d4": "xx"}


def test_char_terms_rows_match_python(spark):
    """The exploded-offsets single-n char path (codegen fast path) must
    produce exactly document_terms' distinct set, first-seen capped."""
    from palladian_spark.classification.dictionary import (
        FeatureSetting, document_terms)
    from palladian_spark.classification.train_df import doc_terms_df

    texts = ["Hello World", "aaa", "ab", "Mixed CASE text 42!", "x",
             "mississippi"]
    for setting in [FeatureSetting.chars(4),
                    FeatureSetting.chars(5, padding=True),
                    FeatureSetting("char", 3, 3, max_terms=4)]:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        got = {}
        for r in doc_terms_df(df, "text", setting).collect():
            got.setdefault(r["doc_id"], set()).add(r["term"])
        want = {i: set(document_terms(t, setting))
                for i, t in enumerate(texts) if document_terms(t, setting)}
        assert got == want, setting


def test_classify_bayes_df_matches_python(spark):
    """Relational BayesScorer(LAPLACE+PRIORS) ≡ the golden-tested Python
    classify on the Manning corpus."""
    from pyspark.sql import functions as F
    from palladian_spark.classification.train_df import (
        build_dictionary_df, category_priors_df, classify_bayes_df)

    model = train_model()
    scorer = BayesScorer(laplace=True, priors=True)
    texts = [TEST_TEXT, "Chinese Macao", "Tokyo Japan Japan", "unseen words"]
    expected = {}
    for i, text in enumerate(texts):
        probs = classify(text, model, scorer)
        cat, p = most_likely(probs)
        expected[i] = (cat, round(p, 6))

    train = spark.createDataFrame(DOCS, "text string, label string") \
        .select(F.col("label"), F.col("text"))
    d = build_dictionary_df(train, "label")
    pr = category_priors_df(train, "label")
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r["doc_id"]: (r["predicted"], r["prob"])
           for r in classify_bayes_df(docs, d, pr, ["doc_id"],
                                      round_decimals=6).collect()}
    assert got == expected


def test_language_id_model_size_is_bounded_by_default():
    # the safe path must be the DEFAULT path: min_count derives from the
    # corpus size, so an open-vocabulary corpus cannot collect an
    # unbounded model without someone explicitly asking for it
    from palladian_spark.operators.text_quality import _derive_min_count
    assert _derive_min_count(500) == 1          # small corpora stay exact
    assert _derive_min_count(199_999) == 1
    assert _derive_min_count(400_000) == 2
    assert _derive_min_count(1_000_000_000) == 5000


def test_language_id_hard_cap_fails_loudly(spark):
    import pytest
    from palladian_spark.operators.text_quality import language_id_clf
    # 40 docs of distinct text → well over 30 distinct 4-grams; a cap of
    # 30 must refuse to collect rather than truncate silently
    docs = spark.createDataFrame(
        [(i, f"unique text body number {i} with words", "en")
         for i in range(40)], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="max_model_terms"):
        language_id_clf(docs, max_model_terms=30).collect()


def test_classify_df_empty_model_degrades_gracefully(spark):
    # empty corpus / everything pruned must fall back to ('', 0.0) rows,
    # not die building a zero-column argmax (round-3 review regression)
    from palladian_spark.classification.train_df import classify_df
    docs = spark.createDataFrame([(1, "some text")],
                                 "doc_id long, text string")
    empty_d = spark.createDataFrame(
        [], "term string, category string, count double")
    empty_p = spark.createDataFrame(
        [], "category string, num_documents double")
    rows = classify_df(docs, empty_d, empty_p, ["doc_id"]).collect()
    assert [(r["predicted"], r["prob"]) for r in rows] == [("", 0.0)]
