"""NER training: builds the model dictionaries from (text, gold annotations).

Pure-Python kernels mirroring PalladianNer.java's training operators; the
Spark layer (operators/ner_spark.py) expresses the same builds as
explode→groupBy aggregations over a corpus DataFrame, merging per-partition
partial builders — both paths produce identical models on identical input.

  * build_entity_dictionary     — PalladianNer.java:326-333
  * build_annotation_dictionary — PalladianNer.java:335-346
  * build_context_dictionary    — PalladianNer.java:894-906
  * build_left_contexts         — PalladianNer.java:860-892
  * build_case_dictionary       — PalladianNer.java:191-222
    (golden: 33 entries for the Gunpowder-Plot paragraph,
    PalladianNerTest.java:64-74)
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, List, Set, Tuple

from palladian_spark.classification.dictionary import (
    ANNOTATION_FEATURE_SETTING,
    CONTEXT_FEATURE_SETTING,
    DictionaryBuilder,
    DictionaryModel,
    FeatureSetting,
)
from palladian_spark.ner.contexts import WINDOW_SIZE, get_character_context, get_left_contexts
from palladian_spark.ner.model import NerModel
from palladian_spark.textproc.taggers import Annotation
from palladian_spark.textproc.tokenize import get_case_signature, starts_uppercase, word_tokens


def build_entity_dictionary(annotations: Iterable[Annotation],
                            min_count: int = 1) -> DictionaryModel:
    """Surface form → type counts: each annotation value is one single-term
    document labelled with its tag."""
    builder = DictionaryBuilder(FeatureSetting.words(), min_count=min_count)
    for ann in annotations:
        builder.add_document([ann.value], ann.tag)
    return builder.create()


def build_annotation_dictionary(annotations: Iterable[Annotation],
                                min_count: int = 1) -> DictionaryModel:
    """Char-5-gram (padded) classifier over annotation VALUES."""
    builder = DictionaryBuilder(ANNOTATION_FEATURE_SETTING, min_count=min_count)
    for ann in annotations:
        builder.add_text(ann.value, ann.tag)
    return builder.create()


def build_context_dictionary(text: str, annotations: Iterable[Annotation],
                             min_count: int = 1) -> DictionaryModel:
    """Char-5-gram classifier over the ±40-char context of each annotation."""
    builder = DictionaryBuilder(CONTEXT_FEATURE_SETTING, min_count=min_count)
    for ann in annotations:
        builder.add_text(get_character_context(ann, text, WINDOW_SIZE), ann.tag)
    return builder.create()


def build_left_contexts(text: str, annotations: Iterable[Annotation],
                        min_count: int = 1) -> Set[str]:
    """Uppercase-starting 1-3 word prefixes that occur more often OUTSIDE
    than inside entities (ratio < 1, outside ≥ 2, total ≥ min_count)."""
    left_context_counts: Counter[str] = Counter()
    inside_counts: Counter[str] = Counter()
    for ann in annotations:
        left_context_counts.update(get_left_contexts(ann, text, 3))
        parts = ann.value.split(" ")
        for i in range(len(parts)):
            inside_counts[" ".join(parts[:i + 1])] += 1
    out: Set[str] = set()
    for left_context, outside in left_context_counts.items():
        if starts_uppercase(left_context):
            inside = inside_counts.get(left_context, 0)
            if outside + inside >= min_count:
                if inside / outside < 1 and outside >= 2:
                    out.add(left_context)
    return out


def case_dictionary_entries(text: str) -> List[Tuple[str, str]]:
    """(lowercased token, case-signature-first-letter) pairs for tokens NOT
    at a sentence start (PalladianNer.java:191-216).  Exposed separately so
    the Spark path can aggregate the pairs with groupBy."""
    pairs: List[Tuple[str, str]] = []
    skip = True  # skip first token and tokens following . ? !
    for tok in word_tokens(text):
        token = tok.value
        if skip:
            skip = False
        elif re.fullmatch(r"[.?!]", token):
            skip = True
        else:
            trimmed = token.strip()
            if len(trimmed) > 1:
                sig = get_case_signature(trimmed)
                if sig.lower().startswith("a"):
                    pairs.append((trimmed.lower(), sig[0]))
    return pairs


def build_case_dictionary(text: str) -> Set[str]:
    """Tokens whose lowercase probability > 0.5 (PalladianNer.java:191-222)."""
    counts: dict[str, Counter] = {}
    for token, sig in case_dictionary_entries(text):
        counts.setdefault(token, Counter())[sig] += 1
    out: Set[str] = set()
    for token, sigs in counts.items():
        total = sum(sigs.values())
        if total and sigs.get("a", 0) / total > 0.5:
            out.add(token)
    return out


def train_english(text: str, annotations: List[Annotation],
                  min_count: int = 1) -> NerModel:
    """The English training job (PalladianNer.java:381-416, without the
    optional Complete-mode retrain, which pipeline.py runs as a second pass)."""
    model = NerModel()
    model.lower_case_dictionary = build_case_dictionary(text)
    model.left_contexts = build_left_contexts(text, annotations, min_count)
    model.context_dictionary = build_context_dictionary(text, annotations, min_count)
    model.entity_dictionary = build_entity_dictionary(annotations, min_count)
    model.annotation_dictionary = build_annotation_dictionary(annotations, min_count)
    return model


def equalize_type_counts(annotations: List[Annotation]) -> List[Annotation]:
    """Downsample every tag to the minimum per-tag count
    (PalladianNer.java:390-404) — deterministic: annotations are taken in
    (start, −end, value) order per tag, so the same input always yields the
    same subsample (the Spark form is a row_number window ≤ k)."""
    by_tag: dict[str, List[Annotation]] = {}
    for ann in annotations:
        by_tag.setdefault(ann.tag, []).append(ann)
    if not by_tag:
        return []
    k = min(len(v) for v in by_tag.values())
    out: List[Annotation] = []
    for tag in sorted(by_tag):
        ordered = sorted(by_tag[tag], key=lambda a: (a.start, -a.end, a.value))
        out.extend(ordered[:k])
    return sorted(out, key=lambda a: (a.start, -a.end, a.value))


def complete_retrain(text: str, gold: List[Annotation],
                     model: NerModel) -> NerModel:
    """Complete-mode second pass (PalladianNer.java:418-436): self-evaluate
    on the training text; taggings that hit NO gold span (ERROR1) become
    ``###NO_ENTITY###`` training instances for a rebuilt annotation
    dictionary, and ERROR1 values that never appear as gold values join the
    removeAnnotations set."""
    from palladian_spark.ner.tag import get_annotations
    from palladian_spark.textproc.taggers import NO_ENTITY

    predicted = get_annotations(text, model)
    gold_sorted = sorted(gold, key=lambda a: (a.start, -a.end))
    gold_values = {g.value.lower() for g in gold}

    def hits_gold(p) -> bool:
        for g in gold_sorted:
            if g.start >= p.end:
                break
            if p.start < g.end and g.start < p.end:
                return True
        return False

    error1 = [p for p in predicted if not hits_gold(p)]

    builder = DictionaryBuilder(ANNOTATION_FEATURE_SETTING)
    for ann in gold:
        builder.add_text(ann.value, ann.tag)
    for p in error1:
        builder.add_text(p.value, NO_ENTITY)
    model.annotation_dictionary = builder.create()
    model.remove_annotations = {
        p.value.lower() for p in error1 if p.value.lower() not in gold_values}
    return model
