"""KG fusion & inference over the constructed triple set.

Beyond-the-reference operators (the reference stops at triple emission;
SURVEY.md §2.8): the knowledge-fusion layer a KG-construction pipeline
runs AFTER extraction — forward-chained rule inference, per-relation
cardinality profiling, evidence-based fact resolution, and the dense
integer encoding + cardinality-aware (Bernoulli) negative sampling a
KG-embedding trainer consumes.

  * infer_triples — one forward-chaining step over composition rules
    a(x,y) ∧ b(y,z) ⇒ c(x,z) (RDFS-style property chains).  Emits only
    NEW facts (anti-joined against the asserted set) with the deriving
    rule as provenance.
  * relation_cardinality — per predicate: distinct-edge/head/tail
    counts, tails-per-head and heads-per-tail averages, and the
    1-1 / 1-N / N-1 / N-N class (threshold 1.5, the FB15k convention).
  * resolve_facts — knowledge-fusion truth finding: per (subj, pred)
    keep the object with the most supporting evidence (ties broken by
    object string — deterministic), reporting the alternative count so
    downstream consumers can gate on ambiguity.
  * encode_triples — dense (s_idx, p_idx, o_idx) int64 encoding via the
    sorted entity/predicate vocabularies (trainer tensor format).
  * bernoulli_negative_samples — TransH-style side selection: corrupt
    the HEAD with probability tph/(tph+hpt), which reduces to the exact
    integer gate  hash % (n_subj + n_obj) < n_obj  per predicate, so
    the choice replays exactly in SQL.  Replacement entities are picked
    by the same md5-over-vocabulary gate as
    operators/kg_training.negative_samples, and corruptions colliding
    with ANY true triple (on the corrupted side) are filtered.

Scale notes: every operator is joins + hash aggs on the (model-sized
relative to 100 TB of text) triple table; vocabularies and the
per-predicate cardinality profile are broadcast-sized.  The only global
sorts are the vocabulary row_numbers (documented non-issue, see
operators/kg_training.py).  Inference joins shuffle on the shared
entity — AQE handles hub skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from palladian_spark.operators.kg_training import _md5_long, entity_vocabulary

#: (pred_a, pred_b, inferred_pred): a(x,y) ∧ b(y,z) ⇒ inferred(x,z)
DEFAULT_RULES = [("works_for", "located_in", "based_in")]


def infer_triples(triples: DataFrame,
                  rules: list[tuple[str, str, str]] | None = None
                  ) -> DataFrame:
    """One forward-chaining step: for each composition rule emit the
    derived (subj, pred, obj, rule) facts NOT already asserted.  Output
    is distinct; ``rule`` is ``'pred_a.pred_b'`` provenance."""
    rules = DEFAULT_RULES if rules is None else rules
    t = triples.select("subj", "pred", "obj").distinct()
    derived = None
    for pred_a, pred_b, pred_c in rules:
        a = (t.where(F.col("pred") == pred_a)
             .select(F.col("subj").alias("x"), F.col("obj").alias("y")))
        b = (t.where(F.col("pred") == pred_b)
             .select(F.col("subj").alias("y"), F.col("obj").alias("z")))
        d = (a.join(b, "y")
             .select(F.col("x").alias("subj"),
                     F.lit(pred_c).alias("pred"),
                     F.col("z").alias("obj"),
                     F.lit(f"{pred_a}.{pred_b}").alias("rule"))
             .distinct())
        derived = d if derived is None else derived.unionByName(d)
    return derived.join(t, ["subj", "pred", "obj"], "left_anti")


def relation_cardinality(triples: DataFrame,
                         threshold: float = 1.5) -> DataFrame:
    """Per-predicate cardinality profile over DISTINCT edges:
    (pred, n_edges, n_subj, n_obj, tph, hpt, category).  tph/hpt are
    single IEEE divisions of exact longs — engine-portable."""
    t = triples.select("subj", "pred", "obj").distinct()
    prof = t.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj").alias("n_obj"))
    tph = (F.col("n_edges") / F.col("n_subj")).alias("tph")
    hpt = (F.col("n_edges") / F.col("n_obj")).alias("hpt")
    cat = (F.when((F.col("tph") <= threshold) & (F.col("hpt") <= threshold),
                  F.lit("1-1"))
           .when((F.col("tph") > threshold) & (F.col("hpt") <= threshold),
                 F.lit("1-N"))
           .when((F.col("tph") <= threshold) & (F.col("hpt") > threshold),
                 F.lit("N-1"))
           .otherwise(F.lit("N-N")))
    return (prof.select("pred", "n_edges", "n_subj", "n_obj", tph, hpt)
            .withColumn("category", cat))


def resolve_facts(triples: DataFrame) -> DataFrame:
    """Truth finding: per (subj, pred) keep the single object with the
    most supporting (conv, turn) observations (evidence count), ties by
    object ascending.  Output: (subj, pred, obj, evidence,
    n_alternatives, total_evidence).

    Two hash aggs + one per-(subj, pred) window over the EDGE table
    (already aggregated — window input is edge-sized, not
    observation-sized)."""
    ev = (triples.groupBy("subj", "pred", "obj")
          .agg(F.count(F.lit(1)).alias("evidence")))
    w = Window.partitionBy("subj", "pred")
    ranked = (ev
              .withColumn("n_alternatives", F.count(F.lit(1)).over(w))
              .withColumn("total_evidence", F.sum("evidence").over(w))
              .withColumn("_rn", F.row_number().over(
                  w.orderBy(F.col("evidence").desc(), F.col("obj").asc()))))
    return (ranked.where(F.col("_rn") == 1)
            .select("subj", "pred", "obj", "evidence",
                    "n_alternatives", "total_evidence"))


def predicate_vocabulary(triples: DataFrame) -> DataFrame:
    """Dense (pred, p_idx) index — predicate set is tiny."""
    return (triples.select("pred").distinct()
            .withColumn("p_idx",
                        F.row_number().over(Window.orderBy("pred")) - 1))


def encode_triples(triples: DataFrame) -> DataFrame:
    """Dense int64 (s_idx, p_idx, o_idx) encoding of the distinct triple
    set — the tensor format KG-embedding trainers ingest.  Vocabulary
    joins are broadcast (model-sized)."""
    t = triples.select("subj", "pred", "obj").distinct()
    vocab = entity_vocabulary(t)
    pvocab = predicate_vocabulary(t)
    return (t
            .join(broadcast(vocab.withColumnRenamed("entity", "subj")
                            .withColumnRenamed("idx", "s_idx")), "subj")
            .join(broadcast(pvocab), "pred")
            .join(broadcast(vocab.withColumnRenamed("entity", "obj")
                            .withColumnRenamed("idx", "o_idx")), "obj")
            .select(F.col("s_idx").cast("long").alias("s_idx"),
                    F.col("p_idx").cast("long").alias("p_idx"),
                    F.col("o_idx").cast("long").alias("o_idx")))


def schema_induction(triples: DataFrame,
                     type_expr=None) -> DataFrame:
    """Induce the KG schema from the instance data: per (pred,
    subj_type, obj_type) the distinct-edge support and its fraction of
    the predicate's edges.  ``type_expr`` maps an entity column to its
    type (default: the first whitespace token — the convention of the
    canonical-entity surfaces).  One hash agg + a per-predicate window
    over the (tiny) profile."""
    if type_expr is None:
        type_expr = lambda c: F.substring_index(c, " ", 1)  # noqa: E731
    t = triples.select("subj", "pred", "obj").distinct()
    prof = (t.select("pred",
                     type_expr(F.col("subj")).alias("subj_type"),
                     type_expr(F.col("obj")).alias("obj_type"))
            .groupBy("pred", "subj_type", "obj_type")
            .agg(F.count(F.lit(1)).alias("n_edges")))
    w = Window.partitionBy("pred")
    return prof.withColumn(
        "frac", F.col("n_edges") / F.sum("n_edges").over(w))


def validate_triples(triples: DataFrame,
                     functional_threshold: float = 1.5) -> DataFrame:
    """SHACL-lite KG validation: per distinct triple, three flags —

      * ``domain_ok`` / ``range_ok`` — the triple's (subj_type,
        obj_type) matches its predicate's MAJORITY signature (from
        :func:`schema_induction`; majority = max n_edges, ties by
        greatest (subj_type, obj_type) — deterministic);
      * ``functional_ok`` — true unless the predicate is functional
        (tails-per-head ≤ ``functional_threshold``, see
        :func:`relation_cardinality`) AND this subject asserts more
        than one distinct object for it.

    Output: (subj, pred, obj, domain_ok, range_ok, functional_ok).
    All reference tables (majority signatures, cardinality profile) are
    predicate-sized broadcasts; the one per-(subj, pred) distinct-obj
    count is a hash agg on the edge table."""
    t = triples.select("subj", "pred", "obj").distinct()
    prof = schema_induction(t)
    maj = (prof.groupBy("pred")
           .agg(F.expr("max_by(struct(subj_type, obj_type), "
                       "struct(n_edges, subj_type, obj_type))")
                .alias("_m"))
           .select("pred", F.col("_m.subj_type").alias("maj_subj_type"),
                   F.col("_m.obj_type").alias("maj_obj_type")))
    card = relation_cardinality(t).select(
        "pred", (F.col("tph") <= functional_threshold).alias("_functional"))
    n_obj = (t.groupBy("subj", "pred")
             .agg(F.countDistinct("obj").alias("_n_obj")))
    typed = t.select(
        "subj", "pred", "obj",
        F.substring_index(F.col("subj"), " ", 1).alias("_st"),
        F.substring_index(F.col("obj"), " ", 1).alias("_ot"))
    return (typed
            .join(broadcast(maj), "pred")
            .join(broadcast(card), "pred")
            .join(n_obj, ["subj", "pred"])
            .select("subj", "pred", "obj",
                    (F.col("_st") == F.col("maj_subj_type"))
                    .alias("domain_ok"),
                    (F.col("_ot") == F.col("maj_obj_type"))
                    .alias("range_ok"),
                    (~F.col("_functional") | (F.col("_n_obj") == 1))
                    .alias("functional_ok")))


def export_ntriples(triples: DataFrame,
                    ent_ns: str = "urn:ent:",
                    rel_ns: str = "urn:rel:") -> DataFrame:
    """Serialize the distinct triple set as N-Triples lines (the
    graph-materialize export format): IRIs are minted by prefixing the
    namespace and replacing spaces with underscores (surfaces are
    word-shaped by construction; a full IRI-escaper would go here for
    arbitrary input).  Pure codegen projection — no shuffle beyond the
    distinct."""
    iri = lambda ns, c: F.concat(  # noqa: E731
        F.lit("<" + ns), F.regexp_replace(c, " ", "_"), F.lit(">"))
    t = triples.select("subj", "pred", "obj").distinct()
    return t.select(
        F.concat_ws(" ", iri(ent_ns, F.col("subj")),
                    iri(rel_ns, F.col("pred")),
                    iri(ent_ns, F.col("obj")), F.lit(".")).alias("ntriple"))


def bernoulli_negative_samples(triples: DataFrame, n_neg: int = 2,
                               salt: str = "kgbern") -> DataFrame:
    """Cardinality-aware filtered negative sampling (TransH Bernoulli):
    per distinct triple and slot k < ``n_neg``, corrupt the HEAD with
    probability tph/(tph+hpt) = n_obj/(n_subj+n_obj) for the triple's
    predicate (an exact integer hash gate — no floats), else the TAIL;
    the replacement entity is md5-picked from the vocabulary.  No-op
    corruptions and corruptions that reproduce ANY true triple are
    dropped.  Output: (subj, pred, obj, k, side, neg_subj, neg_obj)
    where exactly one of neg_subj/neg_obj differs from the original."""
    t = triples.select("subj", "pred", "obj").distinct()
    vocab = entity_vocabulary(t)
    n_ent = vocab.agg(F.count("*").alias("_n_ent"))
    card = relation_cardinality(t).select("pred", "n_subj", "n_obj")

    cand = (t.withColumn("k", F.explode(F.sequence(F.lit(0),
                                                   F.lit(n_neg - 1))))
            .join(broadcast(card), "pred")
            .crossJoin(broadcast(n_ent))
            .withColumn("side", F.when(
                F.pmod(_md5_long(F.lit(salt), F.lit("side"), F.col("subj"),
                                 F.col("pred"), F.col("obj"), F.col("k")),
                       F.col("n_subj") + F.col("n_obj")) < F.col("n_obj"),
                F.lit("head")).otherwise(F.lit("tail")))
            .withColumn("idx", F.pmod(
                _md5_long(F.lit(salt), F.col("subj"), F.col("pred"),
                          F.col("obj"), F.col("k")), F.col("_n_ent")))
            .drop("_n_ent", "n_subj", "n_obj"))
    corrupted = (cand.join(broadcast(vocab), "idx")
                 .withColumn("neg_subj", F.when(F.col("side") == "head",
                                                F.col("entity"))
                             .otherwise(F.col("subj")))
                 .withColumn("neg_obj", F.when(F.col("side") == "tail",
                                               F.col("entity"))
                             .otherwise(F.col("obj")))
                 .drop("idx", "entity")
                 .where((F.col("neg_subj") != F.col("subj"))
                        | (F.col("neg_obj") != F.col("obj"))))
    true_neg = t.select(F.col("subj").alias("neg_subj"), "pred",
                        F.col("obj").alias("neg_obj"))
    return (corrupted.join(true_neg, ["neg_subj", "pred", "neg_obj"],
                           "left_anti")
            .select("subj", "pred", "obj", "k", "side",
                    "neg_subj", "neg_obj"))


def inverse_relation_candidates(triples: DataFrame,
                                min_overlap: int = 2) -> DataFrame:
    """Schema-alignment signal: predicate pairs that look like INVERSES
    of each other — (a p b) tends to co-occur with (b q a) — plus the
    p == q diagonal, which measures how SYMMETRIC a predicate is.  The
    AMIE-style confidence here is overlap / support(p): the fraction of
    p's edges whose reversal is asserted under q.

    Output per (pred, inv_pred): (overlap, n_pred, n_inv, conf_fwd,
    conf_bwd) with confs rounded to 6 decimals.  Pairs below
    ``min_overlap`` are dropped (noise floor).

    Shape: one self-join of the distinct edge set against its reversal
    on the (subj, obj) key — the same key both sides, so it shuffles
    once each; predicate supports are a broadcast-sized profile joined
    back in.  Never materializes pred × pred.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    sup = t.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))
    rev = t.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"),
                   F.col("pred").alias("inv_pred"))
    ov = (t.join(rev, ["subj", "obj"])
          .groupBy("pred", "inv_pred")
          .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
          .where(F.col("overlap") >= int(min_overlap)))
    return (ov.join(sup.withColumnRenamed("n", "n_pred"), "pred")
            .join(sup.select(F.col("pred").alias("inv_pred"),
                             F.col("n").alias("n_inv")), "inv_pred")
            .select("pred", "inv_pred", "overlap",
                    F.col("n_pred").cast("long").alias("n_pred"),
                    F.col("n_inv").cast("long").alias("n_inv"),
                    (F.round(F.col("overlap") / F.col("n_pred"), 6)
                     + F.lit(0.0)).alias("conf_fwd"),
                    (F.round(F.col("overlap") / F.col("n_inv"), 6)
                     + F.lit(0.0)).alias("conf_bwd")))


def mine_chain_rules(triples: DataFrame, min_support: int = 2,
                     max_body_pairs: int | None = None) -> DataFrame:
    """AMIE-lite rule mining: score every length-2 chain rule
    p(x,y) ∧ q(y,z) ⇒ r(x,z) the KG itself supports — the learned
    counterpart to :func:`infer_triples`'s fixed rule list (mine here,
    freeze the confident rules there).

    Per (body_p, body_q, head_r): n_body = |distinct (x,z) chain pairs|,
    n_match = how many of those are asserted under r, and confidence =
    n_match / n_body (PCA-free standard confidence, rounded to 6
    decimals).  Rules below ``min_support`` matches are dropped.

    Shape: one self-join on the shared entity y (the 2-hop walk the
    closure/triangle ops already do), a distinct on (p, q, x, z), one
    join against the edge set on the (x, z) key, two hash aggs.  The
    body join fans out on hub entities exactly like transitive_closure's
    first round — AQE skew-split applies; ``max_body_pairs`` (when set)
    fails loudly if a (p, q) body explodes past the cap instead of
    melting an executor.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    a = t.select(F.col("subj").alias("x"), F.col("pred").alias("body_p"),
                 F.col("obj").alias("y"))
    b = t.select(F.col("subj").alias("y"), F.col("pred").alias("body_q"),
                 F.col("obj").alias("z"))
    chain = (a.join(b, "y")
             .select("body_p", "body_q", "x", "z").distinct())
    if max_body_pairs is not None:
        sizes = (chain.groupBy("body_p", "body_q")
                 .agg(F.count(F.lit(1)).alias("n"))
                 .where(F.col("n") > int(max_body_pairs)))
        if sizes.take(1):
            raise ValueError(
                f"chain body exceeds max_body_pairs={max_body_pairs}; "
                "raise the cap or pre-filter predicates")
    body = (chain.groupBy("body_p", "body_q")
            .agg(F.count(F.lit(1)).cast("long").alias("n_body")))
    heads = (chain.join(t.select(F.col("subj").alias("x"),
                                 F.col("pred").alias("head_r"),
                                 F.col("obj").alias("z")), ["x", "z"])
             .groupBy("body_p", "body_q", "head_r")
             .agg(F.count(F.lit(1)).cast("long").alias("n_match"))
             .where(F.col("n_match") >= int(min_support)))
    return (heads.join(body, ["body_p", "body_q"])
            .select("body_p", "body_q", "head_r", "n_body", "n_match",
                    (F.round(F.col("n_match") / F.col("n_body"), 6)
                     + F.lit(0.0)).alias("confidence")))


def resolve_facts_weighted(weighted_edges: DataFrame) -> DataFrame:
    """Truth finding with weighted votes: like :func:`resolve_facts`,
    but each candidate object's support is a caller-supplied weight
    (``(src, pred, dst, weight)`` — e.g. kg_temporal.
    recency_weighted_edges, so a freshly-asserted object outranks a
    larger pile of stale evidence).  Ties break by object ascending.

    Output: (subj, pred, obj, weight, n_alternatives, total_weight).
    Shape: one per-(subj, pred) window over the already-aggregated edge
    table — edge-sized input, exact integer weights.
    """
    ev = weighted_edges.select(F.col("src").alias("subj"), "pred",
                               F.col("dst").alias("obj"),
                               F.col("weight").cast("long").alias("weight"))
    w = Window.partitionBy("subj", "pred")
    ranked = (ev
              .withColumn("n_alternatives", F.count(F.lit(1)).over(w))
              .withColumn("total_weight",
                          F.sum("weight").over(w).cast("long"))
              .withColumn("_rn", F.row_number().over(
                  w.orderBy(F.col("weight").desc(), F.col("obj").asc()))))
    return (ranked.where(F.col("_rn") == 1)
            .select("subj", "pred", "obj", "weight",
                    "n_alternatives", "total_weight"))
