"""Distributed dictionary-classifier training & scoring (SURVEY.md §2.4).

The reference trains its text classifier by incrementing (term, category)
counts per document in a Java trie (DictionaryTrieModel.java:83-100) and
scores documents by summing per-term scores (PalladianTextClassifier.java:
210-269).  At transcript scale both are plain relational shapes:

  train    = explode(document terms) → groupBy(term, category).sum(weight)
             (+ two more aggs for the document/term priors) — a map-side-
             combinable hash aggregation, the cheapest distributed shape.
  classify = doc-terms ⋈ broadcast dictionary → per-(doc, category) sum →
             normalize → argmax — one broadcast hash join and one agg,
             whole-stage codegen throughout, no Python anywhere.

Word-unigram terms are produced JVM-side with the VERBATIM reference
tokenizer regex (Tokenizer.java:27 is a *Java* regex, so Spark's
``regexp_extract_all`` runs the exact same pattern the reference compiles),
lowercased unless case-sensitive, with the reference's [min,max] term-length
filter for word unigrams (Preprocessor.java:27-77).

The per-document maxTerms=800 first-seen cap (PalladianTextClassifier.java:
202-204) is applied with ``slice(array_distinct(...))`` — array_distinct
preserves first-occurrence order, matching the reference's LinkedHashSet
iteration order.

The Python-side twin of this module (dictionary.py) carries the golden-test
parity; equivalence between the two is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from palladian_spark.classification.dictionary import FeatureSetting
from palladian_spark.textproc.tokenize import TOKEN_SPLIT_REGEX


def word_terms_col(text_col, setting: FeatureSetting):
    """array<string> of the document's distinct word-unigram terms, in
    first-seen order, maxTerms-capped — all JVM expressions."""
    source = text_col if setting.case_sensitive else F.lower(text_col)
    toks = F.regexp_extract_all(source, F.lit(f"(?is)({TOKEN_SPLIT_REGEX})"), 1)
    kept = F.filter(toks, lambda t: (F.length(t) >= setting.min_term_length)
                    & (F.length(t) <= setting.max_term_length))
    return _cap_terms(F.array_distinct(kept), setting)


def _cap_terms(distinct_terms, setting: FeatureSetting):
    """First-seen maxTerms cap; identity when uncapped (None)."""
    if setting.max_terms is None:
        return distinct_terms
    return F.slice(distinct_terms, 1, setting.max_terms)


def char_terms_col(text_col, setting: FeatureSetting):
    """array<string> of the document's distinct char-n-gram terms in
    first-seen (offset-major, length-minor) order, maxTerms-capped — the
    JVM twin of dictionary.extract_terms' char branch
    (Preprocessor.java:27-77 + CharacterNGramTokenizer.java:34-78)."""
    source = text_col if setting.case_sensitive else F.lower(text_col)
    if setting.character_padding:
        pad = "#" * (setting.max_n - 1)
        source = F.concat(F.lit(pad), source, F.lit(pad))
    length = F.length(source)
    min_n, max_n = setting.min_n, setting.max_n
    if min_n == max_n:
        # flat form for the single-n case (the hot one — language ID,
        # annotation dictionaries): guard short strings by FILTERING short
        # grams instead of a when/otherwise empty-array branch — sequence
        # with stop < start counts DOWN, and the flat shape generates a
        # fraction of the nested form's codegen (the nested expression's
        # one-time Janino compile was the dominant cost of a whole
        # sf0.1 lang_id run)
        n = min_n
        idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
        grams = F.filter(
            F.transform(idx, lambda i: source.substr(i, F.lit(n))),
            lambda g: F.length(g) == n)
    else:
        empty = F.expr("CAST(array() AS array<int>)")
        offsets = F.when(length >= min_n,
                         F.sequence(F.lit(1), length - (min_n - 1))) \
            .otherwise(empty)
        nested = F.transform(
            offsets,
            lambda o: F.transform(
                F.sequence(F.lit(min_n),
                           F.least(F.lit(max_n), length - o + 1)),
                lambda m: source.substr(o, m)))
        grams = F.flatten(nested)
    if setting.character_padding:
        grams = F.filter(
            grams, lambda g: g.rlike("[^#]"))  # drop all-padding grams
    return _cap_terms(F.array_distinct(grams), setting)


def terms_col(text_col, setting: FeatureSetting):
    """Dispatch on the feature type (word n-grams vs char n-grams)."""
    from palladian_spark.classification.dictionary import CHAR_NGRAMS
    if setting.feature_type == CHAR_NGRAMS:
        return char_terms_col(text_col, setting)
    return word_terms_col(text_col, setting)


def _char_terms_rows(docs: DataFrame, text_col: str,
                     setting: FeatureSetting) -> DataFrame:
    """Single-n char terms as exploded rows, never as an array column.

    Higher-order functions (transform/filter lambdas) are NOT whole-stage
    codegen'd — Spark evaluates the lambda interpreter per element, which
    measured ~100 µs/gram and made gram extraction the cost center of a
    lang_id run.  Exploding the integer OFFSETS instead and computing
    ``substr`` as a top-level projected expression keeps every operator
    inside codegen; the per-document distinct + first-seen maxTerms cap
    become one aggregation + one window, both keyed on the document — the
    shape that scales (no giant arrays in memory either).
    """
    n = setting.min_n
    keys = [c for c in docs.columns if c != text_col]
    source = (F.col(text_col) if setting.case_sensitive
              else F.lower(F.col(text_col)))
    if setting.character_padding:
        pad = "#" * (setting.max_n - 1)
        source = F.concat(F.lit(pad), source, F.lit(pad))
    src_df = docs.select(*keys, source.alias("_src"))
    idx = F.sequence(F.lit(1), F.greatest(F.length("_src") - (n - 1),
                                          F.lit(1)))

    def gram_rows(df):
        rows = (df
                .select(*keys, "_src", F.explode(idx).alias("_i"))
                .select(*keys, F.col("_src").substr(F.col("_i"), F.lit(n))
                        .alias("term"), "_i")
                .where(F.length("term") == n))
        if setting.character_padding:
            rows = rows.where(F.col("term") != "#" * n)
        return rows

    # Uncapped (max_terms=None — the language-profile mode): only the
    # term SET matters, so a plain distinct suffices.  That drops the
    # min-offset agg AND the per-document sort window (a whole extra
    # shuffle+sort over every gram row), and — just as important at
    # small scale — roughly halves the plan that Janino has to compile:
    # the one-time codegen of the capped plan was a measurable slice of a
    # whole sf0.1 lang_id run.
    if setting.max_terms is None:
        return gram_rows(src_df).select(*keys, "term").distinct()
    # capped: per-document distinct in first-seen order = min offset
    # (single n ⇒ no two distinct terms share an offset ⇒ total order)
    firsts = (gram_rows(src_df).groupBy(*keys, "term")
              .agg(F.min("_i").alias("_first")))
    w = Window.partitionBy(*keys).orderBy("_first")
    return (firsts
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= setting.max_terms)
            .select(*keys, "term"))


def doc_terms_df(docs: DataFrame, text_col: str = "text",
                 setting: FeatureSetting | None = None) -> DataFrame:
    """Explode each document into (…keys, term) rows."""
    from palladian_spark.classification.dictionary import CHAR_NGRAMS
    setting = setting or FeatureSetting.words(1)
    if setting.feature_type == CHAR_NGRAMS and setting.min_n == setting.max_n:
        return _char_terms_rows(docs, text_col, setting)
    keys = [c for c in docs.columns if c != text_col]
    return (docs
            .withColumn("_terms", terms_col(F.col(text_col), setting))
            .select(*keys, F.explode("_terms").alias("term")))


def build_dictionary_df(docs: DataFrame, category_col: str,
                        text_col: str = "text",
                        setting: FeatureSetting | None = None,
                        min_count: int = 1,
                        weight_col: str | None = None) -> DataFrame:
    """DictionaryModel as a DataFrame: (term, category, count).

    ``min_count`` is the pruning strategy (PruningStrategies.java:36-55) —
    a HAVING filter on the term's total count, which is also the broadcast-
    size lever at web scale (SURVEY.md §4).
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    # route through doc_terms_df so the char single-n fast path applies;
    # the synthetic _doc id only scopes the per-document distinct — counts
    # never depend on its values
    src = (docs
           .select(F.col(category_col).alias("category"), w.alias("_w"),
                   F.col(text_col).alias(text_col))
           .withColumn("_doc", F.monotonically_increasing_id()))
    terms = doc_terms_df(src, text_col, setting or FeatureSetting.words(1))
    counted = (terms.groupBy("term", "category")
               .agg(F.sum("_w").alias("count")))
    if min_count > 1:
        total = Window.partitionBy("term")
        counted = (counted
                   .withColumn("_total", F.sum("count").over(total))
                   .where(F.col("_total") >= min_count)
                   .drop("_total"))
    return counted


def category_priors_df(docs: DataFrame, category_col: str,
                       weight_col: str | None = None) -> DataFrame:
    """(category, num_documents) — the prior counters
    (DictionaryModel.java:14-113)."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return (docs.groupBy(F.col(category_col).alias("category"))
            .agg(F.sum(w).alias("num_documents")))


def doc_term_counts_df(docs: DataFrame, text_col: str = "text",
                       setting: FeatureSetting | None = None) -> DataFrame:
    """(…keys, term, doc_count) — per-document term FREQUENCIES (the Bayes
    scorer weights by in-document count, PalladianTextClassifier.java:
    216-219).  The reference stops counting once maxTerms distinct terms
    are seen; this relational form assumes the cap never binds (valid
    whenever documents carry fewer distinct terms than maxTerms — the
    default 800 vs typical double-digit vocabularies)."""
    setting = setting or FeatureSetting.words(1)
    keys = [c for c in docs.columns if c != text_col]
    source = (F.col(text_col) if setting.case_sensitive
              else F.lower(F.col(text_col)))
    toks = F.regexp_extract_all(source, F.lit(f"(?is)({TOKEN_SPLIT_REGEX})"), 1)
    kept = F.filter(toks, lambda t: (F.length(t) >= setting.min_term_length)
                    & (F.length(t) <= setting.max_term_length))
    return (docs
            .select(*keys, F.explode(kept).alias("term"))
            .groupBy(*keys, "term")
            .agg(F.count("*").alias("doc_count")))


def classify_bayes_df(docs: DataFrame, dictionary: DataFrame,
                      priors: DataFrame, id_cols: list[str],
                      text_col: str = "text",
                      setting: FeatureSetting | None = None,
                      round_decimals: int | None = 6) -> DataFrame:
    """BayesScorer(LAPLACE + PRIORS) classification, fully relational
    (BayesScorer.java:41-108 + PalladianTextClassifier.java:210-269):

      per (doc term, category) — matched or not (laplace scores
      non-matches): score = doc_count · ln((n(term,cat)+1) /
                                           (Σ_cat counts + |vocab|))
      per (doc, category): Σ + ln(prior); normalize with the
      CategoryEntriesBuilder log-inversion (total < 0 ⇒ p = 1 − s/total);
      argmax with category-ascending tie-break.

    Docs with no terms fall back to the prior distribution's argmax.
    """
    setting = setting or FeatureSetting.words(1)
    spark = docs.sparkSession

    cat_sums = (dictionary.groupBy("category")
                .agg(F.sum("count").alias("_cat_sum")))
    num_uniq = dictionary.select("term").distinct().count()
    prior_total = priors.agg(F.sum("num_documents")).collect()[0][0] or 1.0
    cats = (priors
            .join(cat_sums, "category", "left")
            .select("category",
                    F.coalesce("_cat_sum", F.lit(0.0)).alias("_cat_sum"),
                    (F.col("num_documents") / F.lit(float(prior_total)))
                    .alias("_prior")))
    cats = F.broadcast(spark.createDataFrame(cats.collect(), cats.schema))

    terms = doc_term_counts_df(docs.select(*id_cols, text_col), text_col,
                               setting)
    scored = (terms
              .crossJoin(cats)
              .join(F.broadcast(dictionary), ["term", "category"], "left")
              .withColumn("_n", F.coalesce("count", F.lit(0.0)))
              .withColumn("_s", F.col("doc_count")
                          * F.log((F.col("_n") + 1)
                                  / (F.col("_cat_sum") + num_uniq))))
    sums = (scored.groupBy(*id_cols, "category", "_prior")
            .agg(F.sum("_s").alias("_sum")))
    final = sums.withColumn("_score", F.col("_sum") + F.log("_prior"))

    wdoc = Window.partitionBy(*id_cols)
    probs = (final
             .withColumn("_total", F.sum("_score").over(wdoc))
             # log-space scores: total < 0 → CategoryEntriesBuilder inverts
             .withColumn("prob", F.lit(1.0) - F.col("_score") / F.col("_total")))
    best = (probs
            .withColumn("_rn", F.row_number().over(
                wdoc.orderBy(F.desc("prob"), F.asc("category"))))
            .where(F.col("_rn") == 1)
            .select(*id_cols, F.col("category").alias("predicted"), "prob"))

    prior_best = (cats.orderBy(F.desc("_prior"), F.asc("category"))
                  .limit(1).collect())
    fallback_cat = prior_best[0]["category"] if prior_best else ""
    fallback_prob = float(prior_best[0]["_prior"]) if prior_best else 0.0
    out = (docs.select(*id_cols)
           .join(best, id_cols, "left")
           .withColumn("predicted",
                       F.coalesce("predicted", F.lit(fallback_cat)))
           .withColumn("prob", F.coalesce("prob", F.lit(fallback_prob))))
    if round_decimals is not None:
        out = out.withColumn("prob", F.round("prob", round_decimals))
    return out


def classify_df(docs: DataFrame, dictionary: DataFrame, priors: DataFrame,
                id_cols: list[str], text_col: str = "text",
                setting: FeatureSetting | None = None,
                round_decimals: int | None = 6) -> DataFrame:
    """DefaultScorer classification, fully relational
    (PalladianTextClassifier.java:101-133 + 210-269):

      per matched (term, category): score = (termCatCount / dictCount)²
      per (doc, category): sum → normalize to probabilities → argmax
      docs with NO matched term fall back to the prior distribution.

    Returns one row per doc: (*id_cols, predicted, prob).

    Shape note (round 3): the model is PIVOTED to one broadcast row per
    term with a score column per category, so the doc-terms join stays
    1:1 instead of fanning out ×|categories| — at K categories that is a
    K× cut in joined rows, shuffle bytes, and aggregation input.  The
    category list is model-derived (model-sized collect) and the per-doc
    argmax is a codegen when-chain in ascending-category order, which
    reproduces the (prob desc, category asc) tie-break exactly.  Pivot
    width = |categories| — fine for classifier uses (languages, document
    classes); a caller with thousands of categories would want the tall
    shape back.
    """
    setting = setting or FeatureSetting.words(1)
    # category list from the PRIORS only: priors are one row per category
    # (tiny collect), while the dictionary may be an unmaterialized
    # training plan whose .distinct() would re-run the whole corpus
    # aggregation just to learn the names.  Both are built from the same
    # labeled documents, so priors cover every dictionary category.
    prior_rows = priors.collect()
    cats = sorted({r["category"] for r in prior_rows})
    if not cats:
        # empty model (empty corpus / everything pruned): every doc gets
        # the empty-prior fallback, same as the pre-pivot implementation
        return docs.select(*id_cols,
                           F.lit("").alias("predicted"),
                           F.lit(0.0).alias("prob"))
    dict_scored = (dictionary
                   .withColumn("_dict_count",
                               F.sum("count").over(Window.partitionBy("term")))
                   .select("term", "category",
                           (F.col("count") / F.col("_dict_count"))
                           .alias("_p")))
    dict_scored = dict_scored.withColumn("_score",
                                         F.col("_p") * F.col("_p"))
    score_cols = [f"_s{i}" for i in range(len(cats))]
    pivoted = (dict_scored.groupBy("term")
               .pivot("category", cats).agg(F.first("_score"))
               .toDF("term", *score_cols)
               .na.fill(0.0, score_cols))

    terms = doc_terms_df(docs.select(*id_cols, text_col), text_col, setting)
    sums = (terms
            .join(F.broadcast(pivoted), "term")
            .groupBy(*id_cols)
            .agg(*[F.sum(c).alias(c) for c in score_cols]))

    # normalize over the doc's total; scores are squares ≥ 0 so total > 0
    total = sum((F.col(c) for c in score_cols[1:]),
                F.col(score_cols[0]))
    # ascending-category scan with strict '>' keeps the LOWEST category
    # on ties — identical to row_number over (prob desc, category asc)
    best_p = F.col(score_cols[0])
    best_c = F.lit(cats[0])
    for c, cat in list(zip(score_cols, cats))[1:]:
        is_better = F.col(c) > best_p
        best_c = F.when(is_better, F.lit(cat)).otherwise(best_c)
        best_p = F.when(is_better, F.col(c)).otherwise(best_p)
    best = sums.select(*id_cols, best_c.alias("predicted"),
                       (best_p / total).alias("prob"))

    # unmatched docs → prior argmax (scorer.scoreCategory unmatched branch).
    # A left join + coalesce, NOT an anti-join + union: the anti-join form
    # embedded the whole scoring subtree twice in one plan, doubling the
    # term-extraction work per action.  Fallback values come from the
    # already-collected prior rows — no extra Spark jobs.
    prior_total = sum(r["num_documents"] for r in prior_rows) or 1.0
    prior_best = (min(prior_rows,
                      key=lambda r: (-r["num_documents"], r["category"]))
                  if prior_rows else None)
    fallback_cat = prior_best["category"] if prior_best else ""
    fallback_prob = (prior_best["num_documents"] / prior_total
                     if prior_best else 0.0)

    out = (docs.select(*id_cols)
           .join(best, id_cols, "left")
           .withColumn("predicted",
                       F.coalesce("predicted", F.lit(fallback_cat)))
           .withColumn("prob",
                       F.coalesce("prob", F.lit(float(fallback_prob)))))
    if round_decimals is not None:
        out = out.withColumn("prob", F.round("prob", round_decimals))
    return out
