"""The NER tagging rule chain over a single turn's text.

Mirrors PalladianNer.getAnnotations → getAnnotationsInternal
(PalladianNer.java:459-473, 547-565) step by step — see SURVEY.md §2.5 for
the operator table (#1-#15).  This module is the pure-Python per-turn
kernel; the Spark layer runs it over Arrow record batches in `mapInPandas`
with the model broadcast (tagging is embarrassingly parallel per turn).

Each rule is its own function so the relational variants in
operators/mentions.py (window de-nesting, broadcast-join dictionary switch)
can be equivalence-tested against this chain.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Set

from palladian_spark.classification.dictionary import (
    CategoryEqualizationScorer,
    DefaultScorer,
    classify,
)
from palladian_spark.ner.contexts import WINDOW_SIZE, get_character_context
from palladian_spark.ner.model import LANGUAGE_MODE_INDEPENDENT, NerModel
from palladian_spark.textproc.taggers import (
    NO_ENTITY,
    Annotation,
    is_date_fragment,
    regex_tag,
    remove_date_fragment,
    remove_nested,
    sort_annotations,
    tag_candidates,
    tag_dates,
    tag_urls,
)
from palladian_spark.textproc.tokenize import (
    _TOKEN_PATTERN,
    get_sub_phrases,
    is_completely_uppercase,
)


class ClassifiedAnnotation(NamedTuple):
    start: int
    value: str
    tag: str
    scores: Dict[str, float]

    @property
    def end(self) -> int:
        return self.start + len(self.value)


# ---------------------------------------------------------------------------
# pre-processing rules (#2-#8) — operate on the whole candidate set of a turn
# ---------------------------------------------------------------------------

def remove_incorrectly_tagged(anns: Set[Annotation], model: NerModel) -> Set[Annotation]:
    """#2 — drop candidates whose lowercase value is a known false positive
    (PalladianNer.java:764-772)."""
    if not model.remove_annotations:
        return anns
    return {a for a in anns if a.value.lower() not in model.remove_annotations}


def unwrap_entities(anns: Set[Annotation], model: NerModel) -> Set[Annotation]:
    """#3 — split ALL-UPPERCASE candidates into known sub-phrases
    (PalladianNer.java:774-790, 922-944)."""
    to_add: Set[Annotation] = set()
    to_remove: Set[Annotation] = set()
    for ann in anns:
        if not is_completely_uppercase(ann.value):
            continue
        other_values = {a.value.lower() for a in anns if a != ann}
        unwrapped: Set[Annotation] = set()
        lower_value = ann.value.lower()
        for part in get_sub_phrases(ann.value):
            part_lower = part.lower()
            if part_lower in other_values or model.entity_dictionary_contains(part_lower):
                start = ann.start + lower_value.index(part_lower)
                unwrapped.add(Annotation(start, part, ann.tag))
        if unwrapped:
            to_add |= unwrapped
            to_remove.add(ann)
    return (anns - to_remove) | to_add


def unwrap_with_context(anns: Set[Annotation], model: NerModel) -> Set[Annotation]:
    """#4 — strip learned leftContexts prefixes off candidates not in the
    entity dictionary; re-emit the suffix and dictionary-known prefix parts
    (PalladianNer.java:695-739)."""
    if not model.left_contexts:
        return anns
    to_add: Set[Annotation] = set()
    to_remove: Set[Annotation] = set()
    for ann in anns:
        entity = ann.value
        if sum(model.entity_entries(entity).values()) > 0:
            continue
        for left_context in model.left_contexts:
            index1 = entity.find(left_context + " ")
            index2 = entity.find(" " + left_context + " ")
            length = -1
            index = -1
            if index1 == 0:
                length = len(left_context) + 1
                index = index1
            elif index2 > -1:
                length = len(left_context) + 2
                index = index2
            if index != -1:
                start = ann.start + index + length
                value = entity[index + length:]
                to_add.add(Annotation(start, value, ann.tag))
                prefix = entity[:index + length]
                for part in get_sub_phrases(prefix):
                    if model.entity_dictionary_contains(part):
                        prefix_start = ann.start + prefix.index(part)
                        to_add.add(Annotation(prefix_start, part, ""))
                to_remove.add(ann)
                break
    return (anns - to_remove) | to_add


def remove_date_fragments(anns: Set[Annotation]) -> Set[Annotation]:
    """#5 — strip leading/trailing date words, fixing offsets
    (PalladianNer.java:670-683)."""
    out: Set[Annotation] = set()
    for ann in anns:
        fixed = remove_date_fragment(ann)
        out.add(fixed if fixed is not None else ann)
    return out


def fix_start_errors_case_dictionary(anns: Set[Annotation], model: NerModel) -> Set[Annotation]:
    """#6 — peel leading usually-lowercase tokens until an entity-dict hit;
    drop the candidate if fully consumed (PalladianNer.java:628-668)."""
    if not model.lower_case_dictionary:
        return anns
    to_add: Set[Annotation] = set()
    to_remove: Set[Annotation] = set()
    for ann in anns:
        value = ann.value
        parts = value.split(" ")
        if len(parts) == 1:
            continue
        offset_cut = 0
        new_value = value
        for token in parts:
            if model.entity_dictionary_contains(new_value):
                break
            if token.lower() not in model.lower_case_dictionary:
                break
            offset_cut += len(token) + 1
            if offset_cut >= len(value):
                break
            new_value = value[offset_cut:]
        if offset_cut >= len(value):
            to_remove.add(ann)
        elif offset_cut > 0:
            to_remove.add(ann)
            to_add.add(Annotation(ann.start + offset_cut, new_value, ""))
    return (anns - to_remove) | to_add


def remove_sentence_start_errors(anns: Set[Annotation], model: NerModel) -> Set[Annotation]:
    """#7 — drop single-token candidates that are usually lowercase
    (PalladianNer.java:748-762)."""
    if not model.lower_case_dictionary:
        return anns
    return {a for a in anns
            if " " in a.value or a.value.lower() not in model.lower_case_dictionary}


def remove_dates(anns: Set[Annotation]) -> Set[Annotation]:
    """#8 — drop candidates that are entirely date fragments
    (PalladianNer.java:685-693)."""
    return {a for a in anns if not is_date_fragment(a.value)}


def pre_process(anns: Set[Annotation], model: NerModel) -> Set[Annotation]:
    """Rules #2-#8 in reference order (PalladianNer.java:603-626)."""
    anns = remove_incorrectly_tagged(anns, model)
    anns = unwrap_entities(anns, model)
    anns = unwrap_with_context(anns, model)
    anns = remove_date_fragments(anns)
    anns = fix_start_errors_case_dictionary(anns, model)
    anns = remove_sentence_start_errors(anns, model)
    anns = remove_dates(anns)
    return anns


# ---------------------------------------------------------------------------
# classification & post-processing (#9-#12)
# ---------------------------------------------------------------------------

def classify_candidates(anns: Set[Annotation], model: NerModel,
                        cache: Optional[Dict[str, Dict[str, float]]] = None,
                        ) -> List[ClassifiedAnnotation]:
    """#9 — annotation-dictionary classifier; keep iff P(NO_ENTITY) < 0.5
    (PalladianNer.java:446-456).  ``cache`` memoizes per surface form —
    classification depends only on the value, and surfaces repeat heavily
    across a corpus.

    Fast path: when the model's annotation dictionary has no NO_ENTITY
    category (it wasn't Complete-trained), the gate can never drop a
    candidate, and for values with an entity-dictionary hit the dictionary
    switch (#11) replaces the whole distribution downstream — so for those
    the n-gram classification result is unobservable and is skipped.
    Output-equivalent to the reference order.
    """
    out: List[ClassifiedAnnotation] = []
    scorer = DefaultScorer()
    gate_can_drop = NO_ENTITY in model.annotation_dictionary.document_counts \
        if model.annotation_dictionary is not None else False
    for ann in sort_annotations(list(anns)):
        if not gate_can_drop and model.entity_entries(ann.value):
            out.append(ClassifiedAnnotation(ann.start, ann.value, ann.tag, {}))
            continue
        probs = cache.get(ann.value) if cache is not None else None
        if probs is None:
            probs = classify(ann.value, model.annotation_dictionary, scorer)
            if cache is not None and len(cache) < 500_000:
                cache[ann.value] = probs
        if probs.get(NO_ENTITY, 0.0) < 0.5:
            tag = max(probs, key=lambda k: probs[k]) if probs else ann.tag
            out.append(ClassifiedAnnotation(ann.start, ann.value, tag, probs))
    return out


def apply_context_analysis(ann: ClassifiedAnnotation, text: str,
                           model: NerModel) -> ClassifiedAnnotation:
    """#10 — add the ±40-char context distribution (CategoryEqualization
    scorer) onto the candidate distribution (PalladianNer.java:792-804);
    skipped when the trimmed context is ≤ 2 chars."""
    scores = dict(ann.scores)
    context = get_character_context(
        Annotation(ann.start, ann.value, ann.tag), text, WINDOW_SIZE)
    if len(context.strip()) > 2:
        context_probs = classify(context, model.context_dictionary,
                                 CategoryEqualizationScorer())
        for cat, p in context_probs.items():
            scores[cat] = scores.get(cat, 0.0) + p
    total = sum(scores.values())
    if total > 0:
        scores = {k: v / total for k, v in scores.items()}
    tag = max(scores, key=lambda k: scores[k]) if scores else ann.tag
    return ClassifiedAnnotation(ann.start, ann.value, tag, scores)


def switch_tag_with_dictionary(ann: ClassifiedAnnotation,
                               model: NerModel) -> ClassifiedAnnotation:
    """#11 — exact entity-dictionary hit overrides the tag; the
    conceptLikelihoodOrder breaks ambiguity (PalladianNer.java:515-543)."""
    entries = model.entity_entries(ann.value)
    if not entries:
        return ann
    total = sum(entries.values())
    probs = {k: v / total for k, v in entries.items()}
    if model.concept_likelihood_order:
        for concept in model.concept_likelihood_order:
            if probs.get(concept, 0.0) > 0:
                probs = {concept: 1.0}
                break
    tag = max(probs, key=lambda k: probs[k])
    return ClassifiedAnnotation(ann.start, ann.value, tag, probs)


def post_process(anns: List[ClassifiedAnnotation], text: str,
                 model: NerModel, *, use_context: bool = True,
                 use_dictionary: bool = True) -> List[ClassifiedAnnotation]:
    """#10 + #11 (PalladianNer.java:493-545).

    Fast path: when a value is an exact entity-dictionary hit, the
    dictionary switch REPLACES the whole distribution (PalladianNer.java:
    515-543), so the context classification that would run first has no
    effect on the output — skip it for dictionary hits.  Output-equivalent
    to the reference order, and removes the per-mention context scoring
    cost for the (dominant) known-entity case.
    """
    out: List[ClassifiedAnnotation] = []
    for a in anns:
        if use_dictionary and model.entity_entries(a.value):
            out.append(switch_tag_with_dictionary(a, model))
            continue
        if use_context and model.context_dictionary is not None:
            a = apply_context_analysis(a, text, model)
        out.append(a)
    return out


def combine_annotations(anns: List[ClassifiedAnnotation]) -> List[ClassifiedAnnotation]:
    """#13 — merge adjacent same-tag annotations separated by exactly one
    char; drop tag "o" (PalladianNer.java:573-601).  LanguageIndependent
    mode only."""
    combined: List[ClassifiedAnnotation] = []
    previous: Optional[ClassifiedAnnotation] = None
    previous_combined: Optional[ClassifiedAnnotation] = None
    for current in sorted(anns, key=lambda a: (a.start, -a.end)):
        if current.tag.lower() == "o":
            continue
        if (previous is not None and current.tag.lower() == previous.tag.lower()
                and current.start == previous.end + 1):
            if previous_combined is None:
                previous_combined = previous
            if combined and combined[-1] == previous_combined:
                combined.pop()
            merged = ClassifiedAnnotation(
                previous_combined.start,
                previous_combined.value + " " + current.value,
                previous.tag, previous.scores)
            combined.append(merged)
            previous_combined = merged
        else:
            combined.append(current)
            previous_combined = None
        previous = current
    return combined


# ---------------------------------------------------------------------------
# the full per-turn chain
# ---------------------------------------------------------------------------

def get_annotations(text: str, model: NerModel, *, tag_urls_too: bool = True,
                    tag_dates_too: bool = True,
                    classify_cache: Optional[Dict[str, Dict[str, float]]] = None,
                    url_annotations: Optional[List[Annotation]] = None,
                    date_annotations: Optional[List[Annotation]] = None,
                    ) -> List[ClassifiedAnnotation]:
    """The production tagging path (PalladianNer.java:459-473).

    ``url_annotations`` / ``date_annotations`` let a fused caller (the
    triple-extraction kernel, which also needs them as sentence masks)
    pass precomputed scans instead of re-running the regexes."""
    if model.language_mode == LANGUAGE_MODE_INDEPENDENT:
        candidates = set(regex_tag(text, _TOKEN_PATTERN, "CANDIDATE"))
    else:
        candidates = set(tag_candidates(text))

    candidates = pre_process(candidates, model)
    classified = classify_candidates(candidates, model, classify_cache)
    classified = post_process(classified, text, model)
    classified = [a for a in classified if a.tag != NO_ENTITY]
    if model.language_mode == LANGUAGE_MODE_INDEPENDENT:
        classified = combine_annotations(classified)

    if tag_urls_too:
        urls = url_annotations if url_annotations is not None else tag_urls(text)
        classified += [ClassifiedAnnotation(a.start, a.value, a.tag, {a.tag: 1.0})
                       for a in urls]
    if tag_dates_too:
        dates = (date_annotations if date_annotations is not None
                 else tag_dates(text))
        classified += [ClassifiedAnnotation(a.start, a.value, a.tag, {a.tag: 1.0})
                       for a in dates]

    # #15 removeNested (Annotations.java:43-56)
    as_plain = [Annotation(a.start, a.value, a.tag) for a in classified]
    kept = {(a.start, a.value) for a in remove_nested(as_plain)}
    result = [a for a in classified if (a.start, a.value) in kept]
    return sorted(result, key=lambda a: (a.start, -a.end))
