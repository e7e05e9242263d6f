"""EntityPreprocessingTagger port (SURVEY.md §2.3 optional row).

Reference: extraction/location/EntityPreprocessingTagger.java:36-287 — a
case-dictionary-driven wrapper around the StringTagger that fixes
sentence-start capitalization artifacts:

  * candidates appearing ONLY at sentence starts are checked against the
    token's lowercase ratio — usually-lowercase single tokens are dropped,
    multi-token candidates get a sliding cut of usually-lowercase prefix
    tokens (offset-corrected);
  * candidates that also appear mid-sentence are trusted as-is;
  * optional long-annotation split: ≥N-token candidates additionally
    yield their runs of NOT-usually-lowercase tokens (plus hyphen/&
    parts) as extra CANDIDATE annotations;
  * ``correct_capitalization`` lowercases usually-lowercase tokens
    (headline normalization).

The case dictionary is a token → lowercase-ratio map; build one with
ner/train.case_dictionary_entries or ner/train_df.build_case_dictionary_df
(ratio = n_lower / n_upper per the reference CSV's total/uppercase
columns — entries below the threshold are never consulted).
"""

from __future__ import annotations

import re
from typing import Dict, List, Mapping, Optional, Sequence

from palladian_spark.textproc.taggers import (
    Annotation, CANDIDATE_TAG, tag_candidates)

_WITHIN_SENTENCE_RE = re.compile(r".*[A-Za-z0-9,]+\s", re.DOTALL)


class EntityPreprocessingTagger:
    """Case-fixing wrapper around the StringTagger
    (EntityPreprocessingTagger.java:36-287)."""

    def __init__(self, case_dictionary: Mapping[str, float],
                 lowercase_threshold: float = 2.0,
                 long_annotation_split: int = 0):
        # entries below the threshold are dropped at load time
        # (loadCaseDictionary:75-89)
        self.case_dictionary: Dict[str, float] = {
            token.lower(): ratio
            for token, ratio in case_dictionary.items()
            if ratio >= lowercase_threshold}
        self.lowercase_threshold = lowercase_threshold
        self.long_annotation_split = long_annotation_split

    def _lowercase_ratio(self, value: str) -> float:
        return self.case_dictionary.get(value.lower(), 0.0)

    @staticmethod
    def _is_within_sentence(text: str, ann: Annotation) -> bool:
        """Left context decides 'not the first word' (:246-249)."""
        return bool(_WITHIN_SENTENCE_RE.match(
            text[max(0, ann.start - 10):ann.start]))

    def get_annotations(self, text: str) -> List[Annotation]:
        annotations = tag_candidates(text)
        fixed: List[Annotation] = []

        in_sentence = {a.value for a in annotations
                       if self._is_within_sentence(text, a)}
        in_sentence = {v for v in in_sentence
                       if self._lowercase_ratio(v) <= self.lowercase_threshold}
        if not in_sentence:
            # no sentences at all → do not try to fix (#294, :103-106)
            fixed.extend(annotations)
            return fixed

        for ann in annotations:
            value = ann.value
            if self._is_within_sentence(text, ann) or value in in_sentence:
                fixed.append(ann)
                continue
            parts = re.split(r"\s", value)
            if len(parts) == 1:
                if self._lowercase_ratio(value) > self.lowercase_threshold:
                    continue  # usually-lowercase single token → drop
            else:
                # sliding cut of usually-lowercase prefix tokens (:129-157)
                offset_cut = 0
                new_value = value
                for token in parts:
                    if self._lowercase_ratio(token) <= self.lowercase_threshold:
                        break
                    offset_cut += len(token) + 1
                    if offset_cut >= len(value):
                        break
                    new_value = value[offset_cut:]
                    if new_value in in_sentence:
                        break
                if offset_cut >= len(value):
                    continue  # fully consumed → drop
                if offset_cut > 0:
                    fixed.append(Annotation(ann.start + offset_cut,
                                            new_value, ann.tag))
                    continue
            fixed.append(ann)

        if self.long_annotation_split > 0:
            fixed.extend(self.get_long_annotation_split(
                fixed, self.long_annotation_split))
        return fixed

    def get_long_annotation_split(self, annotations: Sequence[Annotation],
                                  length: int) -> List[Annotation]:
        """Extra sub-annotations from ≥length-token candidates: runs of
        NOT-usually-lowercase tokens, plus uppercase-starting hyphen/&
        parts (:181-222)."""
        out: List[Annotation] = []
        for ann in annotations:
            parts = re.split(r"\s", ann.value)
            if len(parts) >= length:
                cumulated: List[str] = []

                def emit(require_differs: bool = False) -> None:
                    value = " ".join(cumulated)
                    if len(value) > 1 and not (require_differs
                                               and value == ann.value):
                        out.append(Annotation(
                            ann.start + ann.value.index(value), value,
                            CANDIDATE_TAG))

                for token in parts:
                    if self._lowercase_ratio(token) < self.lowercase_threshold:
                        cumulated.append(token)
                    elif cumulated:
                        emit()
                        cumulated = []
                if cumulated:
                    emit(require_differs=True)
            if "-" in ann.value or "&" in ann.value:
                for part in re.split(r"[-&]", ann.value):
                    part = part.strip()
                    if part and part[0].isupper():
                        out.append(Annotation(
                            ann.start + ann.value.index(part), part,
                            CANDIDATE_TAG))
        return out

    def correct_capitalization(self, value: str) -> str:
        """Lowercase usually-lowercase tokens (headlines, :263-284)."""
        split = re.split(r"\s", value)
        result: List[str] = []
        for i, part in enumerate(split):
            temp = part
            if i == len(split) - 1 and part.endswith("."):
                temp = part[:-1]
            if self._lowercase_ratio(temp) > self.lowercase_threshold:
                part = part.lower()
            result.append(part)
        return " ".join(result)
