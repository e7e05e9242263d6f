"""Evaluation: triple P/R gate and the MUC/exact NER comparator.

  * triple_prf — the north-rule gate: precision/recall of emitted
    (subj, pred, obj) triples vs the expected set, as one Spark join.
  * evaluate_annotations — per-turn ERROR1-5/CORRECT taxonomy following
    NamedEntityRecognizer.evaluate (NamedEntityRecognizer.java:98-184):
      congruent & same tag  → CORRECT
      congruent & diff tag  → ERROR3
      overlap   & same tag  → ERROR4
      overlap   & diff tag  → ERROR5
      no gold overlap       → ERROR1 (tagged something that isn't an entity)
      unmatched gold        → ERROR2 (missed an entity)
    EXACT precision = CORRECT/actual; MUC weights ERROR3+ERROR4+2·CORRECT
    over 2·actual / 2·possible (EvaluationResult.java:182-234).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from palladian_spark.textproc.taggers import Annotation


@dataclass
class PRF:
    precision: float
    recall: float

    @property
    def f1(self) -> float:
        if self.precision + self.recall == 0:
            return 0.0
        return 2 * self.precision * self.recall / (self.precision + self.recall)


def triple_prf(predicted: DataFrame, gold: DataFrame) -> PRF:
    """Exact triple match on (conv_id, turn_idx, subj, pred, obj)."""
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    p = predicted.select(keys).distinct().cache()
    g = gold.select(keys).distinct().cache()
    n_pred = p.count()
    n_gold = g.count()
    n_match = p.join(g, keys).count()
    precision = n_match / n_pred if n_pred else 0.0
    recall = n_match / n_gold if n_gold else 0.0
    p.unpersist()
    g.unpersist()
    return PRF(precision, recall)


# ---------------------------------------------------------------------------
# MUC / exact span-level evaluation
# ---------------------------------------------------------------------------

def evaluate_turn(gold: Sequence[Annotation],
                  predicted: Sequence[Annotation]) -> Dict[str, int]:
    """Per-turn error taxonomy (NamedEntityRecognizer.java:98-184)."""
    counters = {k: 0 for k in
                ("CORRECT", "ERROR1", "ERROR2", "ERROR3", "ERROR4", "ERROR5")}
    gold_sorted = sorted(gold, key=lambda a: (a.start, -a.end))
    matched_gold = set()
    for ann in sorted(predicted, key=lambda a: (a.start, -a.end)):
        outcome = "ERROR1"
        for gi, g in enumerate(gold_sorted):
            if g.start > ann.end:
                break
            congruent = g.start == ann.start and g.end == ann.end
            overlaps = max(g.start, ann.start) < min(g.end, ann.end)
            same_tag = g.tag.lower() == ann.tag.lower()
            if congruent:
                outcome = "CORRECT" if same_tag else "ERROR3"
                matched_gold.add(gi)
                break
            if overlaps:
                outcome = "ERROR4" if same_tag else "ERROR5"
                matched_gold.add(gi)
                break
        counters[outcome] += 1
    counters["ERROR2"] = len(gold_sorted) - len(matched_gold)
    return counters


def muc_scores(counters: Dict[str, int]) -> Dict[str, float]:
    """EXACT and MUC precision/recall/F1 from the error counters
    (EvaluationResult.java:182-234)."""
    correct = counters["CORRECT"]
    actual = correct + sum(counters[f"ERROR{i}"] for i in (1, 3, 4, 5))
    possible = correct + sum(counters[f"ERROR{i}"] for i in (2, 3, 4, 5))
    exact_p = correct / actual if actual else 0.0
    exact_r = correct / possible if possible else 0.0
    muc_hits = counters["ERROR3"] + counters["ERROR4"] + 2 * correct
    muc_p = muc_hits / (2 * actual) if actual else 0.0
    muc_r = muc_hits / (2 * possible) if possible else 0.0

    def f1(p, r):
        return 2 * p * r / (p + r) if p + r else 0.0

    return {"exact_precision": exact_p, "exact_recall": exact_r,
            "exact_f1": f1(exact_p, exact_r),
            "muc_precision": muc_p, "muc_recall": muc_r,
            "muc_f1": f1(muc_p, muc_r)}


def evaluation_counts_df(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """Corpus-level (category, n) ERROR1-5/CORRECT counters as a
    DataFrame — the oracle-checkable face of the MUC taxonomy."""
    counters = _evaluation_counters(predicted, gold)
    rows = [(k, int(counters[k])) for k in sorted(counters)]
    return predicted.sparkSession.createDataFrame(rows, "category string, n long")


def evaluate_mentions_df(predicted: DataFrame, gold: DataFrame) -> Dict[str, float]:
    """Distributed evaluation: join per (conv_id, turn_idx), apply the
    taxonomy per turn in applyInPandas, aggregate counters globally.
    Both inputs: (conv_id, turn_idx, start, end, value, tag)."""
    return muc_scores(_evaluation_counters(predicted, gold))


def _evaluation_counters(predicted: DataFrame, gold: DataFrame) -> Dict[str, int]:
    pred_g = (predicted.groupBy("conv_id", "turn_idx")
              .agg(F.collect_list(F.struct("start", "end", "tag")).alias("pred")))
    gold_g = (gold.groupBy("conv_id", "turn_idx")
              .agg(F.collect_list(F.struct("start", "end", "tag")).alias("gold")))
    joined = pred_g.join(gold_g, ["conv_id", "turn_idx"], "full")

    def to_counters(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ("CORRECT", "ERROR1", "ERROR2", "ERROR3", "ERROR4", "ERROR5")
        for pdf in iterator:
            totals = {k: 0 for k in keys}
            for pred_list, gold_list in zip(pdf["pred"], pdf["gold"]):
                pred_anns = [Annotation(int(p["start"]), "x" * (int(p["end"]) - int(p["start"])), p["tag"])
                             for p in (pred_list if pred_list is not None else [])]
                gold_anns = [Annotation(int(g["start"]), "x" * (int(g["end"]) - int(g["start"])), g["tag"])
                             for g in (gold_list if gold_list is not None else [])]
                for k, v in evaluate_turn(gold_anns, pred_anns).items():
                    totals[k] += v
            yield pd.DataFrame([totals])

    schema = ("CORRECT long, ERROR1 long, ERROR2 long, ERROR3 long, "
              "ERROR4 long, ERROR5 long")
    partials = joined.mapInPandas(to_counters, schema)
    agg = partials.agg(*[F.sum(c).alias(c) for c in
                         ("CORRECT", "ERROR1", "ERROR2", "ERROR3", "ERROR4",
                          "ERROR5")]).collect()[0]
    return {k: int(agg[k] or 0) for k in
            ("CORRECT", "ERROR1", "ERROR2", "ERROR3", "ERROR4", "ERROR5")}
