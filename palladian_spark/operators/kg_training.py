"""KG-embedding training-data preparation over the constructed triple set.

Beyond-the-reference operators (the reference stops at triple emission;
SURVEY.md §2.8): turning the materialized (subj, pred, obj) graph into
the tensors a KG-embedding trainer (TransE-family) consumes at corpus
scale.  Everything is hash-gated — a pure function of the data, never an
RNG — so a re-run, a retry, or a different partitioning produces the
SAME sample (the property the dedup/sampling family already guarantees,
operators/sampling.py).

  * negative_samples — filtered negative sampling: per (distinct) true
    triple and slot k < n_neg, corrupt the object with an entity chosen
    by an md5 hash of (salt, triple, k) over the entity vocabulary, then
    drop corruptions that (a) reproduce the original object or (b)
    collide with ANY true triple (the standard "filtered" protocol, so
    no negative is secretly positive).
  * entity_split — leakage-safe train/valid/test assignment: the gate
    hashes the ENTITY PAIR (unordered), not the triple, so every triple
    between the same two entities lands in the same fold and inverse /
    duplicate relations can't leak across folds.

Scale notes: the entity vocabulary is model-sized relative to the triple
set (millions vs trillions), so the one global-sort row_number that
builds the dense entity index is a deliberate, documented non-issue; the
index join back to |triples|·n_neg candidates is a broadcast.  The
anti-join against true triples shuffles on (subj, pred, neg_obj) — AQE
handles hub-entity skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

_DENOM = 1_000_000


def _md5_long(*cols):
    """First 8 hex digits of md5 over '|'-joined inputs → non-negative
    int64 (the engine-portable hash family of operators/sampling.py)."""
    return F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 8),
                  16, 10).cast("long")


def entity_vocabulary(triples: DataFrame) -> DataFrame:
    """Dense (entity, idx) index over subjects ∪ objects.  idx is a
    row_number over the sorted vocabulary — vocabulary-sized, one task,
    deliberate (see module docstring)."""
    ents = (triples.select(F.col("subj").alias("entity"))
            .union(triples.select(F.col("obj").alias("entity")))
            .distinct())
    return ents.withColumn(
        "idx", F.row_number().over(Window.orderBy("entity")) - 1)


def negative_samples(triples: DataFrame, n_neg: int = 2,
                     salt: str = "kgneg") -> DataFrame:
    """Filtered, hash-gated negative samples.  Output: one row per
    surviving corruption — (subj, pred, obj, k, neg_obj) where neg_obj
    replaces obj, k < ``n_neg`` is the corruption slot, and no output row
    equals a true triple or a no-op corruption."""
    t = triples.select("subj", "pred", "obj").distinct()
    vocab = entity_vocabulary(t)
    n_ent = vocab.agg(F.count("*").alias("_n_ent"))

    cand = (t.withColumn("k", F.explode(F.sequence(F.lit(0),
                                                   F.lit(n_neg - 1))))
            .crossJoin(broadcast(n_ent))
            .withColumn("idx", F.pmod(
                _md5_long(F.lit(salt), F.col("subj"), F.col("pred"),
                          F.col("obj"), F.col("k")), F.col("_n_ent")))
            .drop("_n_ent"))
    corrupted = (cand.join(broadcast(vocab), "idx")
                 .withColumnRenamed("entity", "neg_obj")
                 .drop("idx")
                 .where(F.col("neg_obj") != F.col("obj")))
    true_objs = t.select("subj", "pred", F.col("obj").alias("neg_obj"))
    return (corrupted.join(true_objs, ["subj", "pred", "neg_obj"],
                           "left_anti")
            .select("subj", "pred", "obj", "k", "neg_obj"))


def entity_split(triples: DataFrame, valid_frac: float = 0.1,
                 test_frac: float = 0.1,
                 salt: str = "kgsplit") -> DataFrame:
    """Assign each distinct triple to train/valid/test by hashing the
    UNORDERED entity pair: all edges between the same two entities share
    a fold (inverse-relation leakage control).  Output: (subj, pred,
    obj, fold)."""
    t = triples.select("subj", "pred", "obj").distinct()
    gate = F.pmod(_md5_long(F.lit(salt),
                            F.least("subj", "obj"),
                            F.greatest("subj", "obj")), F.lit(_DENOM))
    v_hi = int(valid_frac * _DENOM)
    t_hi = v_hi + int(test_frac * _DENOM)
    fold = (F.when(gate < v_hi, F.lit("valid"))
            .when(gate < t_hi, F.lit("test"))
            .otherwise(F.lit("train")))
    return t.withColumn("fold", fold)


def walk_skipgrams(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram (center, context) pairs from a random-walk corpus —
    the node2vec/DeepWalk training-pair stage.  ``walks`` is the
    (walk_id, step, node) output of graph.random_walks; every ordered
    pair of distinct positions within ``window`` steps of each other in
    the SAME walk yields one row, weighted by the number of walk
    positions that produced it.

    Shape: one self-join on walk_id (band predicate on step distance) +
    one hash agg.  Walks are short (wl+1 rows), so the per-key fan-out
    is bounded by wl·window — the join key is walk_id, uniformly
    spread by construction."""
    a = walks.select("walk_id", F.col("step").alias("step_a"),
                     F.col("node").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("step_b"),
                     F.col("node").alias("context"))
    gap = F.abs(F.col("step_a") - F.col("step_b"))
    return (a.join(b, "walk_id")
            .where((F.col("step_a") != F.col("step_b"))
                   & (gap <= F.lit(int(window))))
            .groupBy("center", "context")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))


def skipgram_negatives(pairs: DataFrame, n_neg: int = 2,
                       salt: str = "sgneg") -> DataFrame:
    """Filtered negative samples for a skip-gram (center, context) pair
    corpus (walk_skipgrams output) — the word2vec-style negatives a
    node-embedding trainer consumes next to the positive pairs.

    Per distinct (center, context) pair and slot k < ``n_neg``, the
    candidate negative context is drawn by the portable md5 gate over
    the context vocabulary (same protocol as negative_samples);
    candidates that reproduce the pair's own context or collide with
    ANY true (center, x) pair are dropped (filtered protocol).  Output:
    (center, context, k, neg_context)."""
    p = pairs.select("center", "context").distinct()
    vocab = (p.select(F.col("context").alias("entity")).distinct()
             .withColumn("idx",
                         F.row_number().over(Window.orderBy("entity")) - 1))
    n_vocab = vocab.count()
    cand = (p.withColumn("k", F.explode(F.sequence(F.lit(0),
                                                   F.lit(n_neg - 1))))
            .withColumn("idx", F.pmod(
                _md5_long(F.lit(salt), F.col("center"), F.col("context"),
                          F.col("k")), F.lit(n_vocab))))
    corrupted = (cand.join(broadcast(vocab), "idx")
                 .withColumnRenamed("entity", "neg_context")
                 .drop("idx")
                 .where(F.col("neg_context") != F.col("context")))
    true_pairs = p.select("center", F.col("context").alias("neg_context"))
    return (corrupted.join(true_pairs, ["center", "neg_context"],
                           "left_anti")
            .select("center", "context", "k", "neg_context"))
