"""Tests for tokenization / segmentation kernels.

N-gram semantics per CharacterNGramTokenizer.java:34-78 and
NGramWrapperIterator.java:35-71; case-signature goldens from
StringHelper.java:1815-1826; sub-phrases from StringHelper.java:2062-2082;
left/right context goldens from PalladianNerTest.java:38-47.
"""

from palladian_spark.textproc.tokenize import (
    char_edge_ngrams,
    char_ngrams,
    get_case_signature,
    get_sub_phrases,
    sentences,
    tokenize,
    word_tokens,
    iter_word_ngrams,
)
from palladian_spark.textproc.taggers import Annotation, tag_urls


def test_word_tokens_offsets():
    text = "Mr. Smith visited the U.S.A. in 2009."
    toks = word_tokens(text)
    for t in toks:
        assert text[t.start:t.end] == t.value
    assert "U.S.A." in [t.value for t in toks]


def test_tokenize_dollar_and_tags():
    assert "$1.23" in tokenize("it costs $1.23 today")
    assert "<b>" in tokenize("a <b>bold</b> move")


def test_char_ngrams_plain():
    # "word" 2..2 → wo, or, rd
    assert char_ngrams("word", 2, 2) == ["wo", "or", "rd"]
    # variable range, offset-major then length order
    assert char_ngrams("abcd", 2, 3) == ["ab", "abc", "bc", "bcd", "cd"]


def test_char_ngrams_padded():
    # padding = (n-1) '#' each side; all-padding grams skipped
    grams = char_ngrams("ab", 3, 3, padding=True)
    assert grams == ["##a", "#ab", "ab#", "b##"]


def test_word_ngrams():
    grams = list(iter_word_ngrams("the quick brown", 1, 2))
    assert grams == ["the", "the quick", "quick", "quick brown", "brown"]


def test_edge_ngrams():
    assert char_edge_ngrams("word", 3) == ["wor", "ord"]
    assert char_edge_ngrams("word", 3, must_hit_left_edge=True) == ["wor"]
    assert char_edge_ngrams("ab", 3) == []


def test_case_signature():
    assert get_case_signature("Hello") == "Aa"
    assert get_case_signature("this is nice") == "a a a"
    assert get_case_signature("SUPER 8") == "A 0"
    assert get_case_signature("Super!? 8 Zorro") == "Aa- 0 Aa"


def test_sub_phrases():
    assert get_sub_phrases("quick brown fox") == [
        "quick", "quick brown", "quick brown fox", "brown", "brown fox", "fox",
    ]


def test_sentences_basic():
    text = "This is one sentence. And here is another! Is this the third?"
    sents = sentences(text)
    assert [s.value for s in sents] == [
        "This is one sentence.", "And here is another!", "Is this the third?",
    ]
    for s in sents:
        assert text[s.start:s.start + len(s.value)] == s.value


def test_sentences_abbreviation_guard():
    text = "Dr. Smith arrived at 5 pm. He was late."
    sents = sentences(text)
    assert len(sents) == 2
    assert sents[0].value == "Dr. Smith arrived at 5 pm."


def test_sentences_url_masking():
    text = "Visit http://example.com/a.b for info. Then leave."
    masks = [Annotation(a.start, a.value, a.tag) for a in tag_urls(text)]
    sents = sentences(text, mask_spans=masks)
    assert len(sents) == 2
    assert sents[0].value == "Visit http://example.com/a.b for info."


def test_skip_grams_interleaved():
    # SkipGramWrapperIterator.java:30-54: each >2-word n-gram is followed
    # by its 'first last' skip-gram; 1/2-word grams pass through
    from palladian_spark.textproc.tokenize import iter_skip_grams
    assert list(iter_skip_grams("a b c d", 1, 3)) == [
        "a", "a b", "a b c", "a c",
        "b", "b c", "b c d", "b d",
        "c", "c d", "d"]


def test_palladian_trim():
    from palladian_spark.textproc.tokenize import palladian_trim
    assert palladian_trim("  ,hello-  ") == "hello"
    # keepCharacters: quotes survive when listed (Tokenizer.java:330)
    assert palladian_trim('"Hello World."', keep='“”"') == '"Hello World."'
    assert palladian_trim('"Hello World."') == "Hello World"


def test_get_sentences_only_real():
    # Tokenizer.java:316-342: terminal punctuation + length > 8 + > 2 words
    from palladian_spark.textproc.tokenize import get_sentences
    text = ("This is a real sentence. Go! Short. "
            "And here is another good one? banana")
    assert get_sentences(text, only_real_sentences=True) == [
        "This is a real sentence.", "And here is another good one?"]
    assert get_sentences(text)[:2] == ["This is a real sentence.", "Go!"]


def test_word_ngrams_df_matches_python(spark):
    """Relational n-gram/skip-gram windows ≡ iter_word_ngrams +
    iter_skip_grams per turn."""
    from palladian_spark.operators.mentions import (
        word_ngrams_df, word_tokens_df)
    from palladian_spark.textproc.tokenize import (
        iter_skip_grams, iter_word_ngrams)
    texts = [("c0", 0, "Customer C7 works for Supplier S2 in Nation N1."),
             ("c0", 1, "Short one."),
             ("c1", 0, "x")]
    t = spark.createDataFrame(texts,
                              "conv_id string, turn_idx int, text string")
    got = {}
    rows = word_ngrams_df(word_tokens_df(t), max_n=3,
                          skip_grams=True).collect()
    for r in rows:
        got.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (r["kind"], r["gram"]))
    for conv, turn, text in texts:
        grams = [("gram", g) for g in iter_word_ngrams(text, 1, 3)]
        skips = [("skip", p[0] + " " + p[-1])
                 for g in iter_word_ngrams(text, 1, 3)
                 if len(p := g.split(" ")) > 2]
        want = sorted(grams + skips)
        assert sorted(got[(conv, turn)]) == want, (conv, turn)


def test_split_sentences_df_only_real_last_line(spark):
    """Review fix: the only-real filter must emit the TRIMMED LAST LINE
    (Tokenizer.java:327-336), offset-anchored into the original text."""
    from palladian_spark.operators.mentions import split_sentences_df
    text = "Header line\nThis is a perfectly real sentence here."
    t = spark.createDataFrame([("c0", 0, text)],
                              "conv_id string, turn_idx int, text string")
    rows = split_sentences_df(t, only_real_sentences=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sentence"] == "This is a perfectly real sentence here."
    assert text[r["sent_start"]:r["sent_start"] + len(r["sentence"])] == \
        r["sentence"]


def test_session_islands_preserves_user_tb_column(spark):
    """Review fix: a pre-existing user column named _tb must survive when
    the synthetic tiebreak was never added."""
    from palladian_spark.operators.events import session_islands
    rows = [("u1", "2024-01-01 10:00:00", 1, "keepme"),
            ("u1", "2024-01-01 10:05:00", 2, "keepme2")]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_id int, _tb string") \
        .withColumn("ts", __import__("pyspark.sql.functions",
                                     fromlist=["f"]).to_timestamp("ts"))
    out = session_islands(df)
    assert "_tb" in out.columns
    assert {r["_tb"] for r in out.collect()} == {"keepme", "keepme2"}
