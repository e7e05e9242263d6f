"""Golden tests for the similarity toolkit.

Expected values copied from the reference unit tests:
  LevenshteinSimilarityTest.java:10-17, JaroWinklerDistanceTest.java:12-51,
  CharacterNGramSimilarityTest.java:13-53, TokenSimilarityTest.java.
"""

import pytest

from palladian_spark.textproc.similarity import (
    char_ngram_similarity,
    jaro_winkler_similarity,
    levenshtein_similarity,
    token_similarity,
)


def test_levenshtein():
    assert levenshtein_similarity("Levenshtein", "Lenvinsten") == pytest.approx(0.64, abs=0.01)
    assert levenshtein_similarity("Levenshtein", "Levensthein") == pytest.approx(0.82, abs=0.01)
    assert levenshtein_similarity("Levenshtein", "Levenshten") == pytest.approx(0.91, abs=0.01)
    assert levenshtein_similarity("Levenshtein", "Levenshtein") == 1
    assert levenshtein_similarity("", "") == 1


JARO_WINKLER_GOLDENS = [
    ("", "", 1), ("MARHTA", "", 0), ("", "MARHTA", 0), ("MARHTA", "MARHTA", 1),
    ("MARTHA", "MARHTA", 0.961), ("DWAYNE", "DUANE", 0.84),
    ("DIXON", "DICKSONX", 0.813), ("SHACKLEFORD", "SHACKELFORD", 0.982),
    ("DUNNINGHAM", "CUNNIGHAM", 0.896), ("NICHLESON", "NICHULSON", 0.956),
    ("JONES", "JOHNSON", 0.832), ("MASSEY", "MASSIE", 0.933),
    ("ABROMS", "ABRAMS", 0.922), ("JERALDINE", "GERALDINE", 0.926),
    ("MARHTA", "MARTHA", 0.961), ("MICHELLE", "MICHAEL", 0.921),
    ("JULIES", "JULIUS", 0.933), ("TANYA", "TONYA", 0.880),
    ("SEAN", "SUSAN", 0.805), ("JON", "JOHN", 0.933),
    ("cat", "car", 0.822),
    ("http://movies.yahoo.com/browse/list/q", "http://movies.yahoo.com/browse/list/r", 0.989),
    ("http://movies.yahoo.com/browse/list/r", "http://movies.yahoo.com/browse/list/q", 0.989),
]


@pytest.mark.parametrize("s1,s2,expected", JARO_WINKLER_GOLDENS)
def test_jaro_winkler(s1, s2, expected):
    assert jaro_winkler_similarity(s1, s2) == pytest.approx(expected, abs=0.001)


NGRAM_GOLDENS = {
    "dice": [("", "", 1.0), ("", "string", 0.0), ("a", "a", 1.0), ("cat", "cat", 1.0),
             ("cat", "caat", 0.727), ("cat", "dog", 0.0), ("philipp", "philip", 0.824),
             ("philipp", "p", 0.333), ("word", "wort", 0.5)],
    "jaccard": [("", "", 1.0), ("", "string", 0.0), ("a", "a", 1.0), ("cat", "cat", 1.0),
                ("cat", "caat", 0.571), ("cat", "dog", 0.0), ("philipp", "philip", 0.7),
                ("philipp", "p", 0.2), ("word", "wort", 0.333)],
    "overlap": [("", "", 1.0), ("", "string", 0.0), ("a", "a", 1.0), ("cat", "cat", 1.0),
                ("cat", "caat", 0.8), ("cat", "dog", 0.0), ("philipp", "philip", 0.875),
                ("philipp", "p", 0.666), ("word", "wort", 0.5)],
}


@pytest.mark.parametrize("kind", ["dice", "jaccard", "overlap"])
def test_char_ngram_similarity(kind):
    for s1, s2, expected in NGRAM_GOLDENS[kind]:
        assert char_ngram_similarity(s1, s2, 3, kind) == pytest.approx(expected, abs=0.01), (s1, s2)


def test_token_jaccard():
    s1 = "Earthquake Shakes Mexico City"
    s2 = "Panic as earthquake hits Mexico City"
    s3 = "Powerful Quake Rattles Mexico"
    s4 = "Ukraine protesters reject Geneva peace deal"
    s5 = "Ukraine calls Easter truce in east"
    assert token_similarity(s1, s2) == pytest.approx(0.4286, abs=0.001)
    assert token_similarity(s2, s3) == pytest.approx(0.1111, abs=0.001)
    assert token_similarity(s1, s3) == pytest.approx(0.1429, abs=0.001)
    assert token_similarity(s1, s4) == 0
    assert token_similarity(s1, s5) == 0
