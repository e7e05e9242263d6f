"""The NER model: four dictionaries + two sets.

Mirrors extraction/entity/tagger/PalladianNerModel.java:20-44:
  * entity_dictionary      — surface form → type counts
  * annotation_dictionary  — char-5-gram(+padding) classifier over values
  * context_dictionary     — char-5-gram classifier over ±40-char contexts
  * lower_case_dictionary  — tokens that are usually lowercase
  * left_contexts          — boundary-fixing prefixes ("President ")
  * remove_annotations     — known false positives (Complete-mode retrain)

Persisted as JSON + Parquet tables instead of the reference's gzip Java
serialization (PalladianNer.java:155-182); broadcast to executors at
tagging time (model sizes ≤ ~60k terms at CoNLL scale,
PalladianNerIT.java:102-110, fit trivially).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

from palladian_spark.classification.dictionary import DictionaryModel

LANGUAGE_MODE_ENGLISH = "English"
LANGUAGE_MODE_INDEPENDENT = "LanguageIndependent"


@dataclass
class NerModel:
    language_mode: str = LANGUAGE_MODE_ENGLISH
    entity_dictionary: Optional[DictionaryModel] = None
    annotation_dictionary: Optional[DictionaryModel] = None
    context_dictionary: Optional[DictionaryModel] = None
    lower_case_dictionary: Set[str] = field(default_factory=set)
    left_contexts: Set[str] = field(default_factory=set)
    remove_annotations: Set[str] = field(default_factory=set)
    # concept priority for ambiguous dictionary hits (PalladianNer.java:522-530)
    concept_likelihood_order: Optional[List[str]] = None
    _lower_entity_keys: Optional[Set[str]] = None

    def entity_dictionary_contains(self, value: str) -> bool:
        """Case-insensitive membership with a lazily built lowercase cache
        (PalladianNerModel.java:63-72)."""
        if self.entity_dictionary is None:
            return False
        if self._lower_entity_keys is None:
            self._lower_entity_keys = {t.lower() for t in self.entity_dictionary.terms}
        return value.lower() in self._lower_entity_keys

    def entity_entries(self, value: str) -> Dict[str, float]:
        if self.entity_dictionary is None:
            return {}
        return self.entity_dictionary.terms.get(value, {})

    # -- persistence ---------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {
            "language_mode": self.language_mode,
            "lower_case_dictionary": sorted(self.lower_case_dictionary),
            "left_contexts": sorted(self.left_contexts),
            "remove_annotations": sorted(self.remove_annotations),
            "concept_likelihood_order": self.concept_likelihood_order,
        }
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        for name in ("entity_dictionary", "annotation_dictionary", "context_dictionary"):
            model = getattr(self, name)
            if model is not None:
                with open(os.path.join(path, f"{name}.json"), "w") as fh:
                    fh.write(model.to_json())

    @staticmethod
    def load(path: str) -> "NerModel":
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        model = NerModel(
            language_mode=meta["language_mode"],
            lower_case_dictionary=set(meta["lower_case_dictionary"]),
            left_contexts=set(meta["left_contexts"]),
            remove_annotations=set(meta["remove_annotations"]),
            concept_likelihood_order=meta.get("concept_likelihood_order"),
        )
        for name in ("entity_dictionary", "annotation_dictionary", "context_dictionary"):
            fp = os.path.join(path, f"{name}.json")
            if os.path.exists(fp):
                with open(fp) as fh:
                    setattr(model, name, DictionaryModel.from_json(fh.read()))
        return model
