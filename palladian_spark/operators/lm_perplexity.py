"""Bigram language-model perplexity — the classic LM-based quality
signal for training-data curation (CCNet-style: score every document
against a corpus LM, filter or bucket by perplexity).

Whole thing is relational:

  train  = one window pass builds (w1, w2) bigram rows (BOS-padded),
           two hash aggs count bigrams and contexts — map-side
           combinable, the cheapest distributed shapes.
  score  = bigram rows ⋈ count tables (Catalyst picks broadcast vs
           shuffle by size), add-k smoothed
           ln((c(w1,w2)+k) / (c(w1)+k·V)) per bigram, then a per-doc
           DECIMAL-exact sum of log-probs (order-independent — same
           trick as PageRank/k-means) → ppl = exp(−Σ/n).

Unseen contexts degrade to ln(1/V) via the smoothing, so scoring a new
document against a frozen model never NULLs out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

BOS = "<s>"


def _bigram_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one bigram per token, BOS context for the first."""
    toks = (docs
            .select(id_col, F.posexplode(F.split(F.col(text_col), " "))
                    .alias("pos", "w2")))
    w = Window.partitionBy(id_col).orderBy("pos")
    return toks.withColumn(
        "w1", F.coalesce(F.lag("w2").over(w), F.lit(BOS))) \
        .select(id_col, "w1", "w2")


def train_bigram_lm(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text"):
    """(bigram_counts, context_counts, vocab_size) — the model tables."""
    big = _bigram_rows(docs, id_col, text_col)
    bigrams = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    contexts = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = big.select("w2").distinct().count()
    return bigrams, contexts, vocab


def perplexity(docs: DataFrame, bigrams: DataFrame, contexts: DataFrame,
               vocab: int, k: float = 1.0, id_col: str = "doc_id",
               text_col: str = "text",
               round_decimals: int | None = 6) -> DataFrame:
    """(id, n_tokens, ppl) of every document under the bigram model."""
    big = _bigram_rows(docs, id_col, text_col)
    logp = F.log((F.coalesce(F.col("c12"), F.lit(0)).cast("double") + k)
                 / (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                    + k * float(vocab)))
    scored = (big
              .join(bigrams, ["w1", "w2"], "left")
              .join(contexts, ["w1"], "left")
              .select(id_col, logp.alias("_lp")))
    out = (scored.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                (F.exp(-(F.sum(F.col("_lp").cast("decimal(38,18)"))
                         .cast("double")) / F.count(F.lit(1))))
                .alias("ppl")))
    if round_decimals is not None:
        out = out.withColumn("ppl", F.round("ppl", round_decimals))
    return out.select(id_col, F.col("n_tokens").cast("int").alias("n_tokens"),
                      "ppl")


def self_perplexity(docs: DataFrame, k: float = 1.0,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Train on the corpus, score the corpus — the curation default."""
    bigrams, contexts, vocab = train_bigram_lm(docs, id_col, text_col)
    return perplexity(docs, bigrams, contexts, vocab, k, id_col, text_col)
