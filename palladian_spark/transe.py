"""Spark-native TransE embedding trainer over the encoded triple set.

Beyond-the-reference construction (the reference stops at triple
emission; SURVEY.md §2.8): the last stage of the KG-embedding story —
encode_triples / negative sampling / walk corpora (operators/kg_training,
graph.random_walks) feed a trainer, and this module IS that trainer,
shaped for Spark's execution model:

  * **data-parallel full-batch gradient descent** — each epoch is ONE
    Arrow-batched pass over the (s, p, o, neg_o) tensor rows computing
    margin-loss gradients fully vectorized in numpy against the
    broadcast embedding matrices, followed by ONE hash aggregation of
    per-partition partial gradient sums (map-side combined in numpy via
    bincount before anything is emitted), then a model-sized driver
    update.  No per-row Python, no parameter server; the model is
    broadcast-sized (entities × dim), the standard regime for
    KG-embedding workloads where triples ≫ entities.
  * **bit-reproducible across partitionings** — per-triple gradient
    components are scaled to int64 (``round(g · 2^24)``) BEFORE
    summation, so the aggregation is exact integer arithmetic and the
    trained model is identical for any executor count / partition
    layout — the same order-independence discipline as graph.pagerank's
    decimal sums, applied to SGD.  Initialization is a seeded
    RandomState on the driver; nothing depends on execution order.
  * at real scale the same loop runs minibatch-style by hash-gating
    each epoch's triple subset (operators/sampling.py) — the epoch pass
    below IS the minibatch pass, just over a filtered input.

Scoring: TransE with squared-L2 energy  d(h, r, t) = ||h + r − t||²;
margin ranking loss  L = Σ max(0, γ + d_pos − d_neg)  with the
corrupted-tail negatives of kg_training.negative_samples semantics
(hash-gated, deterministic).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

_SCALE = float(1 << 24)  # int64 gradient fixed-point scale


class TransEModel(NamedTuple):
    entities: np.ndarray   # (n_entities, dim) float64
    relations: np.ndarray  # (n_relations, dim) float64
    losses: list           # per-epoch summed margin loss (diagnostic)

    def score(self, s: int, p: int, o: int) -> float:
        """Energy d(h, r, t) — LOWER is more plausible."""
        d = self.entities[s] + self.relations[p] - self.entities[o]
        return float(np.dot(d, d))


def _init_model(n_entities: int, n_relations: int, dim: int,
                seed: int) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    bound = 6.0 / np.sqrt(dim)
    ent = rng.uniform(-bound, bound, size=(n_entities, dim))
    rel = rng.uniform(-bound, bound, size=(n_relations, dim))
    rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True), 1e-12)
    return ent, rel


def _corrupt_tails(idx: DataFrame, n_entities: int,
                   salt: str = "transe") -> DataFrame:
    """Deterministic corrupted-tail column via the portable md5 gate
    (same family as kg_training.negative_samples); no-op corruptions
    are shifted by one (mod n) instead of dropped so every positive
    keeps exactly one negative."""
    from palladian_spark.operators.kg_training import _md5_long
    neg = F.pmod(_md5_long(F.lit(salt), F.col("s_idx"), F.col("p_idx"),
                           F.col("o_idx")), F.lit(n_entities))
    neg = F.when(neg == F.col("o_idx"),
                 F.pmod(neg + 1, F.lit(n_entities))).otherwise(neg)
    return idx.withColumn("n_idx", neg.cast("long"))


def transe_train(encoded: DataFrame, n_entities: int, n_relations: int,
                 dim: int = 16, epochs: int = 5, lr: float = 0.05,
                 margin: float = 1.0, seed: int = 7,
                 normalize_entities: bool = True) -> TransEModel:
    """Train TransE embeddings over ``encoded`` (s_idx, p_idx, o_idx)
    rows (kg_fusion.encode_triples output).  Returns the trained model
    plus the per-epoch loss curve.  Deterministic: same input set (any
    partitioning) + same hyperparameters → bit-identical model."""
    spark = encoded.sparkSession
    ent, rel = _init_model(n_entities, n_relations, dim, seed)
    with_neg = _corrupt_tails(
        encoded.select(F.col("s_idx").cast("long"),
                       F.col("p_idx").cast("long"),
                       F.col("o_idx").cast("long")).distinct(),
        n_entities)
    with_neg = with_neg.persist()
    with_neg.count()
    losses: list = []

    grad_schema = ("kind int, id long, dim int, g long, loss long")

    for _ in range(epochs):
        ent_bc = spark.sparkContext.broadcast(ent)
        rel_bc = spark.sparkContext.broadcast(rel)

        def epoch_pass(it: Iterator[pd.DataFrame],
                       _e=ent_bc, _r=rel_bc) -> Iterator[pd.DataFrame]:
            E, R = _e.value, _r.value
            d = E.shape[1]
            # map-side combine: accumulate scaled int64 grads locally
            ent_acc: dict = {}
            rel_acc: dict = {}
            loss_acc = 0
            for pdf in it:
                s = pdf["s_idx"].to_numpy()
                p = pdf["p_idx"].to_numpy()
                o = pdf["o_idx"].to_numpy()
                n = pdf["n_idx"].to_numpy()
                dp = E[s] + R[p] - E[o]          # (b, d)
                dn = E[s] + R[p] - E[n]
                d_pos = (dp * dp).sum(axis=1)
                d_neg = (dn * dn).sum(axis=1)
                viol = margin + d_pos - d_neg
                active = viol > 0
                if not active.any():
                    continue
                # per-TRIPLE fixed-point rounding BEFORE any summation —
                # every downstream add is exact int64, so the epoch is
                # order- and partitioning-independent (loss included)
                loss_acc += int(np.round(viol[active] * _SCALE)
                                .astype(np.int64).sum())
                sa, pa, oa, na = s[active], p[active], o[active], n[active]
                gp = np.round(2.0 * dp[active] * _SCALE).astype(np.int64)
                gn = np.round(2.0 * dn[active] * _SCALE).astype(np.int64)
                # ∂L/∂h = 2dp − 2dn; ∂L/∂t = −2dp; ∂L/∂t' = +2dn;
                # ∂L/∂r = 2dp − 2dn
                for ids, grads, acc in (
                        (sa, gp - gn, ent_acc), (oa, -gp, ent_acc),
                        (na, gn, ent_acc), (pa, gp - gn, rel_acc)):
                    uniq, inv = np.unique(ids, return_inverse=True)
                    sums = np.zeros((len(uniq), d), dtype=np.int64)
                    np.add.at(sums, inv, grads)
                    for row_i, uid in enumerate(uniq):
                        prev = acc.get(uid)
                        acc[uid] = (sums[row_i] if prev is None
                                    else prev + sums[row_i])
            rows = {"kind": [], "id": [], "dim": [], "g": [], "loss": []}
            for kind, acc in ((0, ent_acc), (1, rel_acc)):
                for uid, gsum in acc.items():
                    for j in range(d):
                        if gsum[j] == 0:
                            continue
                        rows["kind"].append(kind)
                        rows["id"].append(int(uid))
                        rows["dim"].append(j)
                        rows["g"].append(int(gsum[j]))
                        rows["loss"].append(0)
            # one loss row per partition
            rows["kind"].append(2)
            rows["id"].append(0)
            rows["dim"].append(0)
            rows["g"].append(0)
            rows["loss"].append(loss_acc)
            yield pd.DataFrame(rows)

        agg = (with_neg.mapInPandas(epoch_pass, grad_schema)
               .groupBy("kind", "id", "dim")
               .agg(F.sum("g").alias("g"), F.sum("loss").alias("loss"))
               .collect())
        ent_bc.unpersist()
        rel_bc.unpersist()

        epoch_loss = 0.0
        for row in agg:
            if row["kind"] == 2:
                epoch_loss += row["loss"] / _SCALE
                continue
            g = (row["g"] / _SCALE) * lr
            if row["kind"] == 0:
                ent[row["id"], row["dim"]] -= g
            else:
                rel[row["id"], row["dim"]] -= g
        if normalize_entities:
            norms = np.maximum(np.linalg.norm(ent, axis=1, keepdims=True),
                               1.0)
            ent = ent / norms  # project back into the unit ball
        losses.append(epoch_loss)

    with_neg.unpersist()
    return TransEModel(ent, rel, losses)


def link_prediction_ranks(model: TransEModel,
                          test_triples) -> np.ndarray:
    """Filtered-free tail ranks: for each (s, p, o) the rank of the true
    tail among ALL entities by energy (1 = best).  Driver-side numpy —
    evaluation sets are small; the scan is vectorized over entities."""
    ranks = []
    E, R = model.entities, model.relations
    for s, p, o in test_triples:
        d = E[s] + R[p] - E  # (n, dim) against every candidate tail
        energies = (d * d).sum(axis=1)
        ranks.append(int((energies < energies[o]).sum()) + 1)
    return np.array(ranks)


def link_prediction_ranks_df(model: TransEModel, test: DataFrame,
                             known: Optional[DataFrame] = None,
                             batch_size: int = 256) -> DataFrame:
    """Distributed FILTERED tail ranking — the standard KG-embedding
    evaluation protocol (Bordes et al., NIPS'13): for each test
    (s_idx, p_idx, o_idx), rank the true tail among all entities by
    energy, after masking every OTHER tail known true for (s, p) in
    ``known`` (pass None for raw/unfiltered ranks).

    Shape: the model is broadcast (entities × dim — model-sized by the
    trainer's regime); known tails arrive pre-grouped as one array per
    (s, p) via a hash agg + join, so each Arrow batch scores b×n
    energies with one matmul (‖h+r‖² + ‖t‖² − 2(h+r)·t) and never
    materializes b×n×d.  Rank = 1 + #strictly-lower energies
    (optimistic tie handling, deterministic).  Output:
    (s_idx, p_idx, o_idx, rank).
    """
    spark = test.sparkSession
    t = test.select(F.col("s_idx").cast("long"),
                    F.col("p_idx").cast("long"),
                    F.col("o_idx").cast("long"))
    if known is not None:
        kl = (known.select(F.col("s_idx").cast("long"),
                           F.col("p_idx").cast("long"),
                           F.col("o_idx").cast("long"))
              .groupBy("s_idx", "p_idx")
              .agg(F.collect_set("o_idx").alias("known_tails")))
        t = t.join(kl, ["s_idx", "p_idx"], "left")
    else:
        t = t.withColumn("known_tails",
                         F.lit(None).cast("array<long>"))

    ent_bc = spark.sparkContext.broadcast(model.entities)
    rel_bc = spark.sparkContext.broadcast(model.relations)

    def rank_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        E, R = ent_bc.value, rel_bc.value
        e2 = (E * E).sum(axis=1)
        for pdf in it:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo:lo + batch_size]
                s = chunk["s_idx"].to_numpy()
                p = chunk["p_idx"].to_numpy()
                o = chunk["o_idx"].to_numpy()
                d = E[s] + R[p]                       # (b, dim)
                en = ((d * d).sum(axis=1)[:, None] + e2[None, :]
                      - 2.0 * d @ E.T)                # (b, n)
                true_en = en[np.arange(len(chunk)), o]
                for i, tails in enumerate(chunk["known_tails"]):
                    if tails is None:
                        continue
                    mask = np.asarray(list(tails), dtype=np.int64)
                    mask = mask[mask != o[i]]
                    en[i, mask] = np.inf
                rank = (en < true_en[:, None]).sum(axis=1) + 1
                yield pd.DataFrame({"s_idx": s, "p_idx": p, "o_idx": o,
                                    "rank": rank.astype(np.int64)})

    return t.mapInPandas(rank_batch,
                         "s_idx long, p_idx long, o_idx long, rank long")


def evaluate_link_prediction(model: TransEModel, test: DataFrame,
                             known: Optional[DataFrame] = None,
                             ks: Tuple[int, ...] = (1, 3, 10)) -> dict:
    """Aggregate filtered-ranking metrics: mean rank, MRR, hits@k.
    One agg over the distributed rank table; returns a plain dict
    (model-evaluation scalars, not a contract query — float model)."""
    ranks = link_prediction_ranks_df(model, test, known)
    aggs = [F.count(F.lit(1)).alias("n"),
            F.avg("rank").alias("mean_rank"),
            F.avg(1.0 / F.col("rank")).alias("mrr")]
    for k in ks:
        aggs.append(F.avg((F.col("rank") <= k).cast("double"))
                    .alias(f"hits_at_{k}"))
    row = ranks.agg(*aggs).first()
    return {c: row[c] for c in row.asDict()}
