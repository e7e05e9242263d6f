"""POS tagging (SURVEY.md §2.7).

Two taggers, mirroring the reference's split between learned and rule
behavior:

  * ``ClassifierPosTagger`` — the PalladianPosTagger shape
    (extraction/pos/PalladianPosTagger.java:63-77,151-168): a per-token
    dictionary classifier over hand features (startsUppercase, length
    1/2/3, isNumber, completelyUppercase, first/last chars, normalized
    length) + the word itself, trained from (word, TAG) pairs the way the
    reference trains from Brown-corpus word/TAG files (:110-135).
    Pure-Python kernel for the Arrow-batched stage; broadcast model.
  * ``rule_pos_tag`` — a deterministic closed-class + suffix fallback
    (the behavior PalladianPosTagger converges to for frequent tokens),
    expressible as one Catalyst CASE chain so a SQL oracle can replicate
    it exactly (operators/pos_df.py).

Tag alignment & normalization follow AbstractPosTagger.java:32-74:
tags are UPPERCASE, ``normalize_tag`` strips the ``-…`` suffix.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple

from palladian_spark.classification.dictionary import (
    DictionaryBuilder, DictionaryModel, FeatureSetting, classify, most_likely,
)
from palladian_spark.textproc.tokenize import Token, word_tokens

_NUMBER_RE = re.compile(r"^[0-9]+([.,][0-9]+)?$")

# closed-class dictionary for the rule tagger (deterministic, mirrored in
# the SQL oracle); Brown-style tags
CLOSED_CLASS: Dict[str, str] = {
    "the": "DT", "a": "DT", "an": "DT",
    "of": "IN", "in": "IN", "for": "IN", "on": "IN", "at": "IN",
    "with": "IN", "by": "IN", "from": "IN", "over": "IN",
    "to": "TO", "and": "CC", "or": "CC", "but": "CC",
    "is": "VBZ", "was": "VBD", "are": "VBP", "were": "VBD",
    "be": "VB", "been": "VBN", "being": "VBG",
    "he": "PRP", "she": "PRP", "it": "PRP", "they": "PRP",
    "i": "PRP", "we": "PRP", "you": "PRP",
    "not": "RB", "very": "RB",
}


def normalize_tag(tag: str) -> str:
    """Strip '-…' suffixes (AbstractPosTagger.java:72-74)."""
    return tag.split("-")[0].upper()


def rule_pos_tag(token: str) -> str:
    """Deterministic fallback tagger — rule order is the contract:
    punctuation → number → closed class → proper noun → suffixes → NN."""
    if not any(c.isalnum() for c in token):
        return "."
    if _NUMBER_RE.match(token):
        return "CD"
    low = token.lower()
    if low in CLOSED_CLASS:
        return CLOSED_CLASS[low]
    if token[0].isupper():
        return "NNP"
    if low.endswith("ly"):
        return "RB"
    if low.endswith("ing"):
        return "VBG"
    if low.endswith("ed"):
        return "VBD"
    if low.endswith("s") and not low.endswith("ss"):
        return "VBZ"
    return "NN"


def pos_tag_rules(text: str) -> List[Tuple[Token, str]]:
    """Tokenize + rule-tag a text (the AbstractPosTagger.getAnnotations
    shape: aligned (token, TAG) pairs)."""
    return [(tok, rule_pos_tag(tok.value)) for tok in word_tokens(text)]


# ---------------------------------------------------------------------------
# classifier-based tagger (PalladianPosTagger shape)
# ---------------------------------------------------------------------------

def token_features(word: str) -> List[str]:
    """The hand feature set (PalladianPosTagger.java:151-168), encoded as
    prefixed feature terms for the dictionary classifier (the
    UniversalClassifier nominal features become terms)."""
    feats = [f"w={word.lower()}"]
    if word and word[0].isupper():
        feats.append("startsUppercase")
    if len(word) == 1:
        feats.append("length1")
    elif len(word) == 2:
        feats.append("length2")
    elif len(word) == 3:
        feats.append("length3")
    if _NUMBER_RE.match(word):
        feats.append("isNumber")
    if word.isupper():
        feats.append("completelyUppercase")
    if word:
        feats.append(f"first={word[0].lower()}")
        feats.append(f"last={word[-1].lower()}")
    feats.append(f"nlen={min(len(word), 10)}")
    # suffix character n-grams stand in for the char-1..7-gram text
    # classifier half of UniversalClassifier (PalladianPosTagger.java:63-77)
    low = word.lower()
    for n in (2, 3):
        if len(low) >= n:
            feats.append(f"suf{n}={low[-n:]}")
    return feats


class ClassifierPosTagger:
    """Per-token dictionary classifier, trained from (word, TAG) pairs."""

    def __init__(self, model: Optional[DictionaryModel] = None):
        self.model = model

    def train(self, tagged_words: Iterable[Tuple[str, str]]) -> "ClassifierPosTagger":
        builder = DictionaryBuilder(FeatureSetting.words(1))
        for word, tag in tagged_words:
            builder.add_document(token_features(word), normalize_tag(tag))
        self.model = builder.create()
        return self

    def tag_word(self, word: str) -> str:
        assert self.model is not None, "train() or load a model first"
        probs = classify_features(token_features(word), self.model)
        if not probs:
            return rule_pos_tag(word)
        tag, prob = most_likely(probs)
        return tag if prob > 0 else rule_pos_tag(word)

    def tag(self, text: str) -> List[Tuple[Token, str]]:
        """AbstractPosTagger.getAnnotations shape: aligned token/tag pairs."""
        return [(tok, self.tag_word(tok.value)) for tok in word_tokens(text)]


def classify_features(features: List[str], model: DictionaryModel):
    """Classify a pre-extracted feature-term list (bypasses the text
    preprocessor — features ARE the terms here)."""
    from palladian_spark.classification.dictionary import (
        DefaultScorer, normalize_scores)
    scorer = DefaultScorer()
    sums: Dict[str, float] = {}
    for term in dict.fromkeys(features):
        entries = model.terms.get(term, {})
        dict_count = sum(entries.values())
        for category, count in entries.items():
            s = scorer.score(count, dict_count, 1, 0, 0, 0, 0)
            sums[category] = sums.get(category, 0) + s
    matched = sum(sums.values()) != 0
    final: Dict[str, float] = {}
    for category in model.document_counts:
        prior = model.category_prior(category)
        final[category] = scorer.score_category(
            sums.get(category, 0.0), prior, matched)
    return normalize_scores(final)


# ---------------------------------------------------------------------------
# UniversalClassifier POS tagger (PalladianPosTagger parity, round 2)
#
# The reference builds a UniversalClassifier with TEXT (char-1..7-gram
# PalladianTextClassifier over the word) + BAYES (NaiveBayes over the
# nominal hand features) and sums the two probability distributions
# (UniversalClassifier.java:83-95 via CategoryEntriesBuilder.add).  This is
# that shape, expressed as closed-form algebra so the Spark relational twin
# (operators/pos_df.py:pos_tag_clf_df) and its DuckDB oracle can replicate
# every number bit-for-bit:
#
#   TEXT:  terms(w) = distinct lowercase char 1..7-grams;
#          score(w,c) = Σ_t (n(t,c)/n(t))²; p_text = score/Σ (prior if no
#          term matched — DefaultScorer's unmatched branch)
#   BAYES: lp(w,c) = ln(prior_c) + Σ_f ln((n(f,v,c)+λ)/(n_c+λK)), λ=1e-5,
#          log space (NaiveBayesClassifier.java:83-115);
#          p_bayes = 1 − lp/Σ_c lp  (CategoryEntriesBuilder log-inversion)
#   combine: p = (p_text + p_bayes) normalized; argmax, ties → tag asc
#
# Feature normalizations are ASCII simplifications of the StringHelper
# helpers (startsUppercase/isCompletelyUppercase/isNumberOrNumberWord,
# PalladianPosTagger.java:151-168) so Spark SQL and DuckDB compute them
# identically; Unicode-category nuances are out of scope for the fixtures.
# ---------------------------------------------------------------------------

_NUMBER_WORDS = ("one", "two", "three", "four", "five", "six", "seven",
                 "eight", "nine", "ten", "eleven", "twelve")
_NORM_KEEP_RE = re.compile(r"[^`'\",.:;*()]")
BAYES_LAPLACE = 0.00001


def universal_features(word: str) -> List[Tuple[str, str]]:
    """The 12 (feature, value) pairs of PalladianPosTagger.extractFeatures
    (:151-168), values stringified for the nominal Bayes counts."""
    wl = len(word)
    low = word.lower()
    is_num = bool(_NUMBER_RE.match(word)) or low in _NUMBER_WORDS
    return [
        ("startsUppercase", str(bool(word[:1].isupper())).lower()),
        ("length1", str(wl == 1).lower()),
        ("length2", str(wl == 2).lower()),
        ("length3", str(wl == 3).lower()),
        ("length", str(wl)),
        ("number", str(is_num).lower()),
        ("completelyUppercase", str(wl > 0 and word.isupper()).lower()),
        ("normalizedLength", str(len(_NORM_KEEP_RE.sub("", word)))),
        ("lastCharacter", word[-1:] if wl else ""),
        ("firstCharacter", word[:1] if wl else ""),
        ("lastTwoCharacters", word[-2:] if wl > 1 else ""),
        ("word", word),
    ]


def _char_grams_1_7(word: str) -> List[str]:
    """Distinct lowercase char 1..7-grams, first-seen order."""
    low = word.lower()
    seen: dict = {}
    n_chars = len(low)
    for off in range(n_chars):
        for ln in range(1, min(7, n_chars - off) + 1):
            seen.setdefault(low[off:off + ln], None)
    return list(seen)


class UniversalPosTagger:
    """Per-token TEXT + BAYES classifier trained from (word, TAG) pairs."""

    def __init__(self, corpus: Optional[Iterable[Tuple]] = None):
        """``corpus``: (word, TAG) pairs or (word, TAG, weight) triples —
        weight stands in for token frequency in a real corpus slice
        (data/pos_corpus.POS_CORPUS_WEIGHTED is the bundled default)."""
        if corpus is None:
            from palladian_spark.data.pos_corpus import POS_CORPUS_WEIGHTED
            corpus = POS_CORPUS_WEIGHTED
        triples = [(row[0], normalize_tag(row[1]),
                    int(row[2]) if len(row) > 2 else 1) for row in corpus]
        self.categories = sorted({t for _, t, _ in triples})
        self.cat_counts: Dict[str, int] = {}
        self.term_counts: Dict[str, Dict[str, int]] = {}
        self.feat_counts: Dict[Tuple[str, str], Dict[str, int]] = {}
        for word, tag, w in triples:
            self.cat_counts[tag] = self.cat_counts.get(tag, 0) + w
            for term in _char_grams_1_7(word):
                by_cat = self.term_counts.setdefault(term, {})
                by_cat[tag] = by_cat.get(tag, 0) + w
            for fname, fvalue in universal_features(word):
                by_cat = self.feat_counts.setdefault((fname, fvalue), {})
                by_cat[tag] = by_cat.get(tag, 0) + w
        self.n_docs = sum(self.cat_counts.values())

    def probabilities(self, word: str) -> Dict[str, float]:
        import math
        priors = {c: self.cat_counts[c] / self.n_docs
                  for c in self.categories}
        # TEXT half
        text_score: Dict[str, float] = {c: 0.0 for c in self.categories}
        matched = False
        for term in _char_grams_1_7(word):
            by_cat = self.term_counts.get(term)
            if not by_cat:
                continue
            matched = True
            tot = sum(by_cat.values())
            for cat, n in by_cat.items():
                text_score[cat] += (n / tot) ** 2
        if matched:
            total = sum(text_score.values())
            p_text = {c: text_score[c] / total for c in self.categories}
        else:
            p_text = priors
        # BAYES half (log space)
        k = len(self.categories)
        lp: Dict[str, float] = {}
        for cat in self.categories:
            v = math.log(priors[cat])
            n_cat = self.cat_counts[cat]
            for fname, fvalue in universal_features(word):
                n = self.feat_counts.get((fname, fvalue), {}).get(cat, 0)
                v += math.log((n + BAYES_LAPLACE)
                              / (n_cat + BAYES_LAPLACE * k))
            lp[cat] = v
        lp_total = sum(lp.values())
        p_bayes = {c: 1.0 - lp[c] / lp_total for c in self.categories}
        # combine (CategoryEntriesBuilder.add + create)
        s = {c: p_text[c] + p_bayes[c] for c in self.categories}
        total = sum(s.values())
        return {c: s[c] / total for c in self.categories}

    def tag_word(self, word: str) -> str:
        probs = self.probabilities(word)
        return max(sorted(probs), key=lambda c: probs[c])

    def tag(self, text: str) -> List[Tuple[Token, str]]:
        """AbstractPosTagger.getAnnotations shape: aligned (token, TAG)."""
        return [(tok, self.tag_word(tok.value)) for tok in word_tokens(text)]


# ---------------------------------------------------------------------------
# phrase chunking (PhraseChunker.java:11-25 interface)
# ---------------------------------------------------------------------------

NP_TAGS = {"DT", "JJ", "NN", "NNS", "NNP", "NNPS", "CD"}
VP_TAGS = {"VB", "VBD", "VBG", "VBN", "VBP", "VBZ", "MD", "RB", "TO"}


def chunk_phrases(tagged: List[Tuple[Token, str]],
                  kind: str = "NP") -> List[Tuple[int, int, str]]:
    """Marker-based chunking: maximal runs of in-set tags become one chunk
    (start_char, end_char, phrase).  The python twin of
    operators/pos_df.np_chunks_df — equivalence-tested."""
    tags = NP_TAGS if kind == "NP" else VP_TAGS
    chunks: List[Tuple[int, int, str]] = []
    run: List[Token] = []
    for tok, tag in tagged + [(Token(-1, ""), "_END_")]:
        if tag in tags:
            run.append(tok)
            continue
        if run:
            chunks.append((run[0].start, run[-1].end,
                           " ".join(t.value for t in run)))
            run = []
    return chunks
