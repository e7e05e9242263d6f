"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All pure-Catalyst expressions (no UDFs): these run per-document at corpus
scale, so every one must stay inside whole-stage codegen.  Each operator's
formula is deliberately closed-form so a SQL oracle can replicate it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker-word lists for the n-gram/stopword language heuristic.  Order is
# the deterministic tie-break (first listed wins on equal scores).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "für", "ein"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "avec", "une"],
    "es": ["el", "la", "los", "las", "es", "no", "por", "con", "una"],
    "zh": ["的", "是", "不", "了", "在", "有", "我", "他"],
}

# BPE-ish token pattern: letter runs, digit runs, single other-symbols —
# the pre-tokenization regex shape used by byte-pair encoders, kept
# RE2-compatible so DuckDB's regexp_extract_all matches Java's exactly.
BPE_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _tokens(text_col):
    return F.split(text_col, " ")


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Marker-stopword language scoring: per language, the count of marker
    tokens in the document; argmax with first-listed tie-break.  The
    distributed form of the reference's dictionary-classifier language mode
    (Palladian ships language profiles through the same text classifier —
    this is the cheap closed-form variant for corpus triage)."""
    toks = _tokens(F.lower(F.col(text_col)))
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        score = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        score_cols.append(score.alias(f"score_{lang}"))
    scored = docs.select(id_col, *score_cols)

    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.select(
        id_col, best.alias("lang_pred"),
        best_score.cast("int").alias("marker_hits"))


def _derive_min_count(n_train_docs: int) -> int:
    """Size-derived pruning default: grams seen in < ~0.001% of documents
    never reach the broadcast model.  1 (exact, unpruned) below 200k
    docs, then linear — at 10⁹ docs only grams with ≥ 5000 occurrences
    survive, keeping the model driver-sized on open-vocabulary corpora."""
    return max(1, n_train_docs // 200_000)


def language_id_clf(docs: DataFrame, train_docs: DataFrame | None = None,
                    id_col: str = "doc_id", text_col: str = "text",
                    lang_col: str = "lang", ngram_n: int = 4,
                    round_decimals: int = 4,
                    min_count: int | None = None,
                    max_model_terms: int = 2_000_000) -> DataFrame:
    """Dictionary-classifier language ID — the faithful reference upgrade
    over the marker heuristic (Palladian routes language detection through
    its text classifier with char-profile features; same DefaultScorer
    stack as classification §2.4, here with char-``ngram_n``-gram terms).

    ``train_docs`` (labeled with ``lang_col``) defaults to ``docs`` itself
    (self-profile mode, as used by the contract query).  Fully relational:
    char n-grams JVM-side → broadcast dictionary join → per-doc agg →
    normalized argmax; no Python anywhere.

    The model is driver-collected, so its size is bounded by DEFAULT:
    ``min_count=None`` derives the pruning threshold from the training
    corpus size (_derive_min_count — 1 on small corpora, so small-scale
    results are exact and oracle-stable), and ``max_model_terms`` is a
    hard cap that fails loudly (naming the lever) instead of silently
    collecting an unbounded vocabulary onto the driver.
    """
    from palladian_spark.classification.dictionary import (
        CHAR_NGRAMS, FeatureSetting)
    from palladian_spark.classification.train_df import (
        build_dictionary_df, category_priors_df, classify_df)
    # The n-gram projection is the cost center; a small single-file scan
    # must not pin it (and everything downstream) to one task.  ROUND-ROBIN
    # repartition, deliberately: with hash repartitioning Catalyst places
    # the partitioning projection on the pre-shuffle (1-task) side and the
    # gram arrays get built there — measured 7× slower than round-robin on
    # the sf0.1 documents table.  Gram extraction is row-local, so no
    # co-location is needed.
    def _spread(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism * 2
        try:
            if len(df.inputFiles()) >= target:
                return df
        except Exception:
            pass
        return df.repartition(target)

    docs = _spread(docs)
    train = _spread(train_docs) if train_docs is not None else docs
    # maxTerms=None (uncapped): a language profile wants the whole
    # document's gram set; the relational plan is then a plain distinct —
    # matching the SQL oracle's DISTINCT exactly — with no first-seen
    # ordering machinery to execute or compile
    setting = FeatureSetting(CHAR_NGRAMS, ngram_n, ngram_n,
                             max_terms=None)
    spark = docs.sparkSession
    # priors first: their collect is the training-doc count for free
    # (num_documents sums to N), so deriving min_count costs no extra scan
    priors_plan = category_priors_df(train, lang_col)
    prior_rows = priors_plan.collect()
    if min_count is None:
        n_train = int(sum(r["num_documents"] for r in prior_rows))
        min_count = _derive_min_count(n_train)
    d = build_dictionary_df(train.select(F.col(lang_col), F.col(text_col)),
                            lang_col, text_col, setting,
                            min_count=min_count)
    # materialize the MODEL once: classify_df's plan references it from
    # several actions — without this every action re-runs the training
    # aggregation over the corpus.  limit(cap+1) bounds what can ever
    # reach the driver in ONE action: on success the fetched rows ARE the
    # model; on violation we fail naming the lever instead of OOMing.
    model_rows = d.limit(max_model_terms + 1).collect()
    if len(model_rows) > max_model_terms:
        raise ValueError(
            f"language_id_clf: dictionary exceeds max_model_terms="
            f"{max_model_terms} at min_count={min_count} — raise "
            "min_count (prune rare grams) or max_model_terms (accept a "
            "bigger broadcast model).")
    d = spark.createDataFrame(model_rows, d.schema)
    p = spark.createDataFrame(prior_rows, priors_plan.schema)
    return (classify_df(docs.select(id_col, text_col), d, p, [id_col],
                        text_col, setting, round_decimals)
            .select(id_col, F.col("predicted").alias("lang_pred"),
                    F.col("prob").alias("lang_prob")))


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + a composite score:
    token count, distinct ratio, mean token length, stopword ratio,
    non-alpha char ratio.  quality = distinct_ratio × (1 − nonalpha_ratio)
    clamped stopword window [0.05, 0.6] bonus — closed-form, oracle-checkable."""
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length(text_col)
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "and", "of")))
    nonalpha = (n_chars
                - F.length(F.regexp_replace(text_col, r"[^a-zA-Z ]", "")))
    distinct_ratio = n_distinct.cast("double") / n_tokens
    stop_ratio = stop.cast("double") / n_tokens
    nonalpha_ratio = nonalpha.cast("double") / n_chars
    mean_tok_len = ((n_chars - (n_tokens - 1)).cast("double") / n_tokens)
    in_window = (stop_ratio >= 0.05) & (stop_ratio <= 0.6)
    quality = (distinct_ratio * (1.0 - nonalpha_ratio)
               * F.when(in_window, F.lit(1.0)).otherwise(F.lit(0.5)))
    return docs.select(
        id_col,
        n_tokens.cast("int").alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(nonalpha_ratio, 6).alias("nonalpha_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"))


def bpe_token_counts(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Token counting with the BPE-ish pre-tokenization regex plus a plain
    whitespace count — the 'how many tokens will training see' estimator."""
    bpe = F.regexp_extract_all(F.lower(F.col(text_col)),
                               F.lit(f"({BPE_TOKEN_PATTERN})"), 1)
    ws = _tokens(F.col(text_col))
    return docs.select(
        id_col,
        F.size(bpe).cast("int").alias("n_bpe_tokens"),
        F.size(ws).cast("int").alias("n_ws_tokens"),
        F.size(F.array_distinct(bpe)).cast("int").alias("n_distinct_bpe"))


def rolling_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", window: int = 8,
                         keep_mod: int = 16) -> DataFrame:
    """Winnowing-style document fingerprints: hash every ``window``-token
    shingle, keep those ≡ 0 (mod keep_mod) — a deterministic sparse
    fingerprint set for containment/overlap detection (the scalable cousin
    of md5-whole-doc fingerprinting)."""
    toks = _tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, window)))
    hashes = F.transform(shingles, lambda s: F.conv(
        F.substring(F.md5(s), 1, 8), 16, 10).cast("long"))
    kept = F.array_distinct(
        F.filter(hashes, lambda h: h % keep_mod == 0))
    return (docs
            .select(id_col, F.explode(kept).alias("fingerprint")))


def corpus_stats(docs: DataFrame, group_col: str = "lang",
                 text_col: str = "text") -> DataFrame:
    """Per-``group_col`` corpus profile: document count, EXACT
    interpolated token-count percentiles (p25/p50/p75/p95), exact mean
    and max — the distribution table a curation run materializes to
    pick its length gates.

    ``percentile`` (not approx_percentile) keeps the result
    deterministic and engine-replayable (DuckDB's quantile_cont uses
    the same linear interpolation); exact percentiles sort within each
    group, which is fine because groups are languages (few, large —
    Spark's SQL percentile buffers per group) — for millions of groups
    switch to approx_percentile and drop the oracle to rows-only.
    """
    nt = F.size(F.split(F.col(text_col), " "))
    pct = F.percentile(nt, F.lit([0.25, 0.5, 0.75, 0.95]))
    return (docs
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 pct.alias("_p"),
                 F.round(F.sum(nt.cast("decimal(38,9)")).cast("double")
                         / F.count(F.lit(1)), 6).alias("mean_tokens"),
                 F.max(nt).alias("max_tokens"))
            .select(group_col, "n_docs",
                    F.round(F.col("_p")[0], 6).alias("p25_tokens"),
                    F.round(F.col("_p")[1], 6).alias("p50_tokens"),
                    F.round(F.col("_p")[2], 6).alias("p75_tokens"),
                    F.round(F.col("_p")[3], 6).alias("p95_tokens"),
                    "mean_tokens", "max_tokens"))


def quality_outliers(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", group_col: str = "lang",
                     z_threshold: float = 2.0) -> DataFrame:
    """Per-doc quality z-score WITHIN its language group + outlier flag
    (|z| > ``z_threshold``) — the distribution-aware anomaly signal a
    curation run uses on top of absolute gates (a 0.4-quality doc is
    normal in one language and an outlier in another).

    Deterministic: group mean and population variance come from
    decimal-cast sums of the (already 6-rounded) quality and its square
    — order-independent — and z is rounded to 4.  Zero-variance groups
    get z = 0, not NaN.  One quality pass + one tiny group agg
    (broadcast back) — no window over the corpus.
    """
    q = quality_scores(docs, id_col=id_col, text_col=text_col) \
        .join(docs.select(id_col, group_col), id_col) \
        .select(id_col, group_col, "quality")
    # decimal(18,9): the (38,9)×(38,9) product would overflow precision
    # 38 and Spark silently REDUCES the product scale to 6 — (18,9)²
    # → (37,18) stays exact
    dec = F.col("quality").cast("decimal(18,9)")
    g = (q.groupBy(group_col)
         .agg(F.count(F.lit(1)).alias("_n"),
              F.sum(dec).cast("double").alias("_s"),
              F.sum((dec * dec).cast("decimal(38,18)")).cast("double")
              .alias("_ss")))
    mean = F.col("_s") / F.col("_n")
    var = F.col("_ss") / F.col("_n") - mean * mean
    stats = g.select(group_col, mean.alias("_mean"),
                     F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std"))
    z = F.when(F.col("_std") > 0,
               (F.col("quality") - F.col("_mean")) / F.col("_std")) \
        .otherwise(F.lit(0.0))
    return (q.join(F.broadcast(stats), group_col)
            .select(id_col, group_col, "quality",
                    F.round(z, 4).alias("z_score"),
                    (F.abs(F.round(z, 4)) > z_threshold)
                    .alias("is_outlier")))


def repetition_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    appendix A1 repetition filters, adapted to single-line documents):
    documents dominated by a few repeated tokens/phrases are boilerplate
    or spam and get filtered before training.

    Returns (id, n_tokens, dup_token_frac, top_token_frac,
    top_bigram_frac) where

      * dup_token_frac  = 1 − distinct_tokens / n_tokens
      * top_token_frac  = count of the most frequent token / n_tokens
      * top_bigram_frac = count of the most frequent word bigram /
                          n_bigrams (0.0 for single-token docs)

    Shape: bigrams are built INSIDE the token array (transform + null
    filter — same shape as lm_perplexity, no sort window), then token
    and bigram frequencies are two explode → two-level hash-agg chains
    (both map-side combinable) merged with one per-doc join — the
    cheapest distributed form; nothing driver-side.
    """
    ts = _tokens(F.col(text_col))
    tok = (docs.select(id_col, F.explode(ts).alias("_t"))
           .groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
           .groupBy(id_col).agg(F.sum("_c").alias("_n"),
                                F.max("_c").alias("_maxt"),
                                F.count(F.lit(1)).alias("_nd")))
    bg_arr = F.filter(
        F.transform(ts, lambda w2, i: F.when(
            i > 0, F.concat(F.element_at(ts, i), F.lit(" "), w2))),
        lambda x: x.isNotNull())
    big = (docs.select(id_col, F.explode(bg_arr).alias("_b"))
           .groupBy(id_col, "_b").agg(F.count(F.lit(1)).alias("_c"))
           .groupBy(id_col).agg(F.sum("_c").alias("_nb"),
                                F.max("_c").alias("_maxb")))
    return (tok.join(big, id_col, "left")
            .select(id_col,
                    F.col("_n").cast("int").alias("n_tokens"),
                    F.round(F.lit(1.0) - F.col("_nd") / F.col("_n"), 6)
                    .alias("dup_token_frac"),
                    F.round(F.col("_maxt") / F.col("_n"), 6)
                    .alias("top_token_frac"),
                    F.round(F.coalesce(F.col("_maxb") / F.col("_nb"),
                                       F.lit(0.0)), 6)
                    .alias("top_bigram_frac")))
