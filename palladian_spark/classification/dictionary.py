"""The dictionary text classifier.

Re-implements the reference's term-dictionary classifier:
  * feature extraction — classification/text/Preprocessor.java:27-77,
    FeatureSetting.java:59-93 (defaults: maxTerms=800, caseSensitive=false,
    word-term length filter [3,20])
  * model build — classification/text/DictionaryTrieModel.java:83-128
    (a plain (term, category) → count table plus global counters; the trie
    is a Java-memory optimization we don't need — the model lives as a
    broadcast dict / Parquet table)
  * scoring — PalladianTextClassifier.java:210-276 with pluggable scorers:
    DefaultScorer (squared term-category probability,
    PalladianTextClassifier.java:101-133), BayesScorer
    (classification/text/BayesScorer.java:41-108), and
    CategoryEqualizationScorer (ExperimentalScorers.java:19-25)
  * normalization — core/CategoryEntriesBuilder.java:134-164 (scores → probs
    summing to 1; negative totals treated as log-probs and inverted)

Golden expectations (Manning IR 4-doc corpus): P("no")=0.79 DefaultScorer,
P("yes")=0.74 Bayes(PRIORS), P("yes")=0.88 Bayes(PRIORS, COMPLEMENT) —
PalladianTextClassifierTest.java:36-62.
"""

from __future__ import annotations

import json
import math
from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from palladian_spark.textproc.tokenize import iter_char_ngrams, iter_word_ngrams

CHAR_NGRAMS = "char"
WORD_NGRAMS = "word"


@dataclass(frozen=True)
class FeatureSetting:
    """Feature-extraction config (FeatureSetting.java:59-93)."""
    feature_type: str = CHAR_NGRAMS
    min_n: int = 4
    max_n: int = 7
    # None = uncapped (language profiles): downstream plans then use a
    # plain distinct with no first-seen ordering machinery at all
    max_terms: Optional[int] = 800
    case_sensitive: bool = False
    character_padding: bool = False
    min_term_length: int = 3
    max_term_length: int = 20

    @staticmethod
    def chars(min_n: int, max_n: Optional[int] = None, *,
              padding: bool = False) -> "FeatureSetting":
        return FeatureSetting(CHAR_NGRAMS, min_n, max_n if max_n is not None else min_n,
                              character_padding=padding)

    @staticmethod
    def words(min_n: int = 1, max_n: Optional[int] = None) -> "FeatureSetting":
        return FeatureSetting(WORD_NGRAMS, min_n, max_n if max_n is not None else min_n)

    def to_dict(self) -> dict:
        return {
            "feature_type": self.feature_type, "min_n": self.min_n,
            "max_n": self.max_n, "max_terms": self.max_terms,
            "case_sensitive": self.case_sensitive,
            "character_padding": self.character_padding,
            "min_term_length": self.min_term_length,
            "max_term_length": self.max_term_length,
        }

    @staticmethod
    def from_dict(d: dict) -> "FeatureSetting":
        return FeatureSetting(**d)


# The two NER feature settings (PalladianNerTrainingSettings.java:83-88).
ANNOTATION_FEATURE_SETTING = FeatureSetting.chars(5, padding=True)
CONTEXT_FEATURE_SETTING = FeatureSetting.chars(5)


def extract_terms(text: str, setting: FeatureSetting) -> Iterator[str]:
    """Term stream per Preprocessor.java:27-77: lowercase unless
    case-sensitive; char- or word-n-grams; term-length filter [min,max]
    applies to WORD n-grams only."""
    if not setting.case_sensitive:
        text = text.lower()
    if setting.feature_type == CHAR_NGRAMS:
        yield from iter_char_ngrams(text, setting.min_n, setting.max_n,
                                    setting.character_padding)
    else:
        for term in iter_word_ngrams(text, setting.min_n, setting.max_n):
            if setting.min_term_length <= len(term) <= setting.max_term_length:
                yield term


def document_terms(text: str, setting: FeatureSetting) -> List[str]:
    """First-seen distinct terms, capped at maxTerms — the cap keeps
    FIRST-seen terms (PalladianTextClassifier.java:202-204), which makes
    iteration order part of the contract."""
    seen: dict[str, None] = {}
    for term in extract_terms(text, setting):
        if term not in seen:
            seen[term] = None
            if setting.max_terms is not None \
                    and len(seen) >= setting.max_terms:
                break
    return list(seen)


def document_term_counts(text: str, setting: FeatureSetting) -> Dict[str, int]:
    """Term → in-document count, stopping once maxTerms distinct terms seen
    (PalladianTextClassifier.java:216-219)."""
    counts: Counter[str] = Counter()
    for term in extract_terms(text, setting):
        # the reference stops the whole iteration once maxTerms distinct
        # terms have been seen (even for repeats of known terms)
        if setting.max_terms is not None and len(counts) >= setting.max_terms:
            break
        counts[term] += 1
    return dict(counts)


@dataclass
class DictionaryModel:
    """term → {category: count} with the global counters the scorers need
    (classification/text/DictionaryModel.java:14-113)."""
    setting: FeatureSetting
    terms: Dict[str, Dict[str, float]] = field(default_factory=dict)
    # per-category number of documents (priors) and term-count sums
    document_counts: Dict[str, float] = field(default_factory=dict)
    term_counts: Dict[str, float] = field(default_factory=dict)
    num_documents: float = 0

    @property
    def num_uniq_terms(self) -> int:
        return len(self.terms)

    @property
    def num_terms(self) -> float:
        return sum(self.term_counts.values())

    def category_prior(self, category: str) -> float:
        if self.num_documents == 0:
            return 0.0
        return self.document_counts.get(category, 0) / self.num_documents

    # -- persistence (replaces the reference's gzip Java serialization,
    #    PalladianNer.java:155-182, with JSON; Parquet form in ner/model.py)
    def to_json(self) -> str:
        return json.dumps({
            "setting": self.setting.to_dict(), "terms": self.terms,
            "document_counts": self.document_counts,
            "term_counts": self.term_counts, "num_documents": self.num_documents,
        })

    @staticmethod
    def from_json(s: str) -> "DictionaryModel":
        d = json.loads(s)
        return DictionaryModel(
            setting=FeatureSetting.from_dict(d["setting"]), terms=d["terms"],
            document_counts=d["document_counts"], term_counts=d["term_counts"],
            num_documents=d["num_documents"])


class DictionaryBuilder:
    """Accumulates (term, category, weight) counts (DictionaryTrieModel.java:83-100).
    ``min_count`` prunes terms whose total count is below the threshold at
    create() time (PruningStrategies.java:36-55)."""

    def __init__(self, setting: FeatureSetting, min_count: int = 1):
        self.setting = setting
        self.min_count = min_count
        self._terms: Dict[str, Dict[str, float]] = {}
        self._document_counts: Dict[str, float] = {}
        self._term_counts: Dict[str, float] = {}
        self._num_documents = 0.0

    def add_document(self, terms: Iterable[str], category: str,
                     weight: float = 1.0) -> None:
        n = 0
        for term in terms:
            entry = self._terms.setdefault(term, {})
            entry[category] = entry.get(category, 0) + weight
            n += 1
        self._term_counts[category] = self._term_counts.get(category, 0) + weight * n
        self._document_counts[category] = self._document_counts.get(category, 0) + weight
        self._num_documents += weight

    def add_text(self, text: str, category: str, weight: float = 1.0) -> None:
        self.add_document(document_terms(text, self.setting), category, weight)

    def create(self) -> DictionaryModel:
        terms = self._terms
        if self.min_count > 1:
            terms = {t: cats for t, cats in terms.items()
                     if sum(cats.values()) >= self.min_count}
        return DictionaryModel(self.setting, terms, self._document_counts,
                               self._term_counts, self._num_documents)


# ---------------------------------------------------------------------------
# scorers
# ---------------------------------------------------------------------------

class DefaultScorer:
    """(termCategoryCount / dictCount)²; unmatched doc → prior distribution."""
    score_non_matches = False

    def score(self, term_category_count: float, dict_count: float,
              doc_count: float, category_sum: float, num_uniq_terms: float,
              num_docs: float, num_terms: float) -> float:
        if dict_count == 0:
            return 0.0
        p = term_category_count / dict_count
        return p * p

    def score_category(self, summed: float, category_probability: float,
                       matched: bool) -> float:
        return summed if matched else category_probability


class CategoryEqualizationScorer(DefaultScorer):
    """DefaultScorer ÷ prior — used by NER context classification
    (ExperimentalScorers.java:19-25, applied at PalladianNer.java:796)."""

    def score_category(self, summed: float, category_probability: float,
                       matched: bool) -> float:
        score = super().score_category(summed, category_probability, matched)
        return score / category_probability if matched else score


class BayesScorer:
    """Naive Bayes with LAPLACE / PRIORS / FREQUENCIES / COMPLEMENT options
    (BayesScorer.java:41-108)."""

    def __init__(self, laplace: bool = False, priors: bool = False,
                 frequencies: bool = False, complement: bool = False):
        self.laplace = laplace
        self.priors = priors
        self.frequencies = frequencies
        self.complement = complement

    @property
    def score_non_matches(self) -> bool:
        return self.laplace or self.complement

    def score(self, term_category_count: float, dict_count: float,
              doc_count: float, category_sum: float, num_uniq_terms: float,
              num_docs: float, num_terms: float) -> float:
        numerator = (dict_count - term_category_count if self.complement
                     else term_category_count) + (1 if self.laplace else 0)
        denominator = (num_terms - category_sum if self.complement
                       else category_sum) + (num_uniq_terms if self.laplace else 0)
        if numerator == 0 or denominator == 0:
            return 0.0
        if self.frequencies:
            idf = math.log((num_docs + 1) / (dict_count + 1))
            weight = math.log(doc_count + 1) * idf
        else:
            weight = doc_count
        return weight * math.log(numerator / denominator)

    def score_category(self, summed: float, category_probability: float,
                       matched: bool) -> float:
        if matched:
            sign = -1.0 if self.complement else 1.0
            prior = math.log(category_probability) if self.priors else 0.0
            return sign * summed + prior
        return category_probability


def normalize_scores(scores: Dict[str, float]) -> Dict[str, float]:
    """Scores → probability distribution (CategoryEntriesBuilder.java:134-164):
    p = score/total; when total < 0 (summed log-probs) p = 1 - score/total."""
    total = sum(scores.values())
    out = {}
    for name, score in scores.items():
        if total == 0:
            p = 0.0
        else:
            p = score / total
            if total < 0:
                p = 1 - p
        out[name] = p
    return out


def classify(text: str, model: DictionaryModel, scorer=None) -> Dict[str, float]:
    """Score a document against the model → {category: probability}
    (PalladianTextClassifier.java:210-269)."""
    scorer = scorer or DefaultScorer()
    term_counts = document_term_counts(text, model.setting)

    num_uniq = model.num_uniq_terms
    num_docs = model.num_documents
    num_terms = model.num_terms
    score_non_matches = scorer.score_non_matches

    sums: Dict[str, float] = {}
    for term, doc_count in term_counts.items():
        entries = model.terms.get(term, {})
        dict_count = sum(entries.values())
        for category, count in entries.items():
            category_sum = model.term_counts.get(category, 0)
            s = scorer.score(count, dict_count, doc_count, category_sum,
                             num_uniq, num_docs, num_terms)
            sums[category] = sums.get(category, 0) + s
        if score_non_matches:
            for category, category_sum in model.term_counts.items():
                if category not in entries:
                    s = scorer.score(0, dict_count, doc_count, category_sum,
                                     num_uniq, num_docs, num_terms)
                    sums[category] = sums.get(category, 0) + s

    matched = sum(sums.values()) != 0
    final: Dict[str, float] = {}
    for category in model.document_counts:
        term_score = sums.get(category, 0.0)
        prior = model.category_prior(category)
        final[category] = scorer.score_category(term_score, prior, matched)
    return normalize_scores(final)


def most_likely(probs: Dict[str, float]) -> Tuple[str, float]:
    if not probs:
        return ("", 0.0)
    name = max(probs, key=lambda k: probs[k])
    return name, probs[name]
