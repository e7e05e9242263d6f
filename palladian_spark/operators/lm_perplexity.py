"""Bigram language-model perplexity — the classic LM-based quality
signal for training-data curation (CCNet-style: score every document
against a corpus LM, filter or bucket by perplexity).

Whole thing is relational:

  train  = bigram (w1, w2) rows are built INSIDE the token array
           (BOS-padded pairs via transform, one explode) — no window, so
           no sort exchange of |tokens| rows before the two hash aggs
           that count bigrams and contexts; both are map-side combinable,
           the cheapest distributed shapes.  Same array-side trick as
           shingles (dedup.py) and skip-grams.
  score  = bigram rows ⋈ count tables (Catalyst picks broadcast vs
           shuffle by size), add-k smoothed
           ln((c(w1,w2)+k) / (c(w1)+k·V)) per bigram, then a per-doc
           DECIMAL-exact sum of log-probs (order-independent — same
           trick as PageRank/k-means) → ppl = exp(−Σ/n).

Unseen contexts degrade to ln(1/V) via the smoothing, so scoring a new
document against a frozen model never NULLs out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BOS = "<s>"


def _bigram_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one bigram per token, BOS context for the first.

    The pairs are constructed inside the token array (transform over the
    split with the 0-based element index; element_at is 1-based, so
    ``element_at(ts, i)`` IS the previous token) and exploded once.  No
    Window.partitionBy(id).orderBy(pos) — the old shape's full sort
    exchange of |tokens| rows is gone; the only shuffles left downstream
    are the count aggregations themselves.  The transform lambda is not
    whole-stage-codegen'd, but it stays JVM-side and is per-document
    array work — strictly cheaper than a |tokens|-row shuffle at scale.
    """
    ts = F.split(F.col(text_col), " ")
    pairs = F.transform(
        ts,
        lambda w2, i: F.struct(
            F.when(i == F.lit(0), F.lit(BOS))
             .otherwise(F.element_at(ts, i)).alias("w1"),
            w2.alias("w2")))
    return (docs
            .select(id_col, F.explode(pairs).alias("_p"))
            .select(id_col, "_p.w1", "_p.w2"))


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
