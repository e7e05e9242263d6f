"""Property tests for the NER-kernel fast paths.

Each fast path (sentence-split terminator gate, memoized date-fragment
stripping, window-match memo) must be OUTPUT-IDENTICAL to the plain
implementation it shortcuts — these tests compare against inline
re-implementations of the slow path on randomized inputs.
"""

import random

import pytest

from palladian_spark.relations import (
    DEFAULT_PATTERNS, compile_patterns, triples_from_mentions,
)
from palladian_spark.ner.tag import ClassifiedAnnotation
from palladian_spark.textproc import tokenize as tk
from palladian_spark.textproc.taggers import (
    _FRAGMENT_ANY, _FRAGMENT_BEGIN, _FRAGMENT_END, Annotation,
    remove_date_fragment,
)


def _sentences_regex_path(text, mask_spans=None):
    """The pre-fast-path implementation (always runs the split regex)."""
    masked = text
    if mask_spans:
        chars = list(text)
        for span in mask_spans:
            for i in range(span.start, min(span.end, len(chars))):
                chars[i] = "M"
        masked = "".join(chars)
    out = []

    def _emit(start, end):
        value = masked[start:end]
        lstripped = value.lstrip()
        left = len(value) - len(lstripped)
        trimmed = lstripped.rstrip()
        if trimmed:
            s = start + left
            out.append(tk.Token(s, text[s:s + len(trimmed)]))

    last = 0
    for m in tk._SENTENCE_PATTERN_EN.finditer(masked):
        _emit(last, m.end())
        last = m.end()
    if last < len(masked):
        _emit(last, len(masked))
    return out


def _remove_date_fragment_uncached(ann):
    """The pre-memoization implementation (PalladianNer.java:828-849)."""
    if not _FRAGMENT_ANY.search(ann.value):
        return None
    new_value = ann.value
    new_offset = ann.start
    for begin_re, end_re in zip(_FRAGMENT_BEGIN, _FRAGMENT_END):
        text_len = len(new_value)
        if begin_re.search(new_value):
            new_value = begin_re.sub(" ", new_value).strip()
            new_offset += text_len - len(new_value)
        if end_re.search(new_value):
            new_value = end_re.sub(" ", new_value).strip()
    if new_value == ann.value:
        return None
    return Annotation(new_offset, new_value, ann.tag)


def test_sentence_fastpath_equivalence():
    rng = random.Random(11)
    words = ["Hello", "world", "Dr.", "Smith", "e.g", "etc", "A.B.", "x",
             "?!", "no", "Mr", "ok.", "Wow!", "what?", "...", "", " ",
             "St. Paul", "1.23", "end."]
    cases = ["", ".", "?", "!", "a.", "a?", "Hi", "Hi.", "Hi. There.",
             "One! Two? Three.", "No terminator at all",
             "Only final terminator."]
    for _ in range(2000):
        cases.append(" ".join(rng.choice(words)
                              for _ in range(rng.randint(0, 8))))
    for c in cases:
        assert tk.sentences(c) == _sentences_regex_path(c), repr(c)


def test_sentence_fastpath_with_masks():
    # masked 'M'-runs must not disturb the gate (they contain no terminator)
    text = "Visit http://x.co/a.b now"
    masks = [tk.Token(6, "http://x.co/a.b")]
    assert tk.sentences(text, masks) == _sentences_regex_path(text, masks)


def test_fragment_memo_equivalence():
    rng = random.Random(13)
    frag_words = ["Monday", "May", "Jan", "Sept.", "DECEMBER", "Friday",
                  "Apple", "Court", "X", "June 1", "Maybe", "mar", "Sunday"]
    for _ in range(3000):
        v = " ".join(rng.choice(frag_words)
                     for _ in range(rng.randint(1, 4)))
        st = rng.randint(0, 50)
        got = remove_date_fragment(Annotation(st, v, "T"))
        want = _remove_date_fragment_uncached(Annotation(st, v, "T"))
        assert got == want, (v, st)


def test_window_match_cache_equivalence():
    """triples_from_mentions with and without a match_cache agree."""
    pats = list(DEFAULT_PATTERNS)
    compiled = compile_patterns(pats)
    texts = [
        ("Anna Smith works for Acme Corp in Paris.",
         [ClassifiedAnnotation(0, "Anna Smith", "PER", {"PER": 0.9}),
          ClassifiedAnnotation(21, "Acme Corp", "ORG", {"ORG": 0.8}),
          ClassifiedAnnotation(34, "Paris", "LOC", {"LOC": 0.7})]),
        ("Bob met Carol. Carol visited Rome.",
         [ClassifiedAnnotation(0, "Bob", "PER", {}),
          ClassifiedAnnotation(8, "Carol", "PER", {}),
          ClassifiedAnnotation(15, "Carol", "PER", {}),
          ClassifiedAnnotation(29, "Rome", "LOC", {})]),
    ]
    cache = {}
    for text, mentions in texts:
        plain = triples_from_mentions(text, mentions, pats, compiled=compiled)
        cached1 = triples_from_mentions(text, mentions, pats,
                                        compiled=compiled, match_cache=cache)
        cached2 = triples_from_mentions(text, mentions, pats,
                                        compiled=compiled, match_cache=cache)
        assert plain == cached1 == cached2
    assert cache  # the memo actually populated


def test_fragment_cache_offset_independence():
    """Memoized stripping must still shift per-annotation offsets."""
    a = remove_date_fragment(Annotation(0, "Monday John", "PER"))
    b = remove_date_fragment(Annotation(100, "Monday John", "PER"))
    assert a is not None and b is not None
    assert a.value == b.value == "John"
    assert b.start - a.start == 100
