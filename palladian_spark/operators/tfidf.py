"""TF-IDF / BM25 relevance scoring — training-data-pipeline staples
(keyword extraction for document fingerprints, quality filtering,
lexical retrieval over the corpus the KG is built from).

Everything is relational and shuffle-minimal:

  * term_frequencies — one explode + one map-side-combinable hash agg.
  * tf_idf — tf table ⋈ broadcast-sized df table (one row per distinct
    term; at open-vocabulary scale the term table partitions fine as a
    shuffle join — Spark picks by size).  idf is the smoothed
    ln((N+1)/(df+1)) + 1 (the scikit-learn convention) so unseen terms
    stay finite and every factor is a per-ROW double op — no cross-row
    float accumulation anywhere, which keeps results order-independent
    and SQL-oracle-replayable.
  * top_keywords — rank-k per document under (score desc, term asc);
    scores are rounded BEFORE ranking so the tie-break is identical
    across engines.
  * bm25_scores — classic Okapi BM25 (k1=1.2, b=0.75) of each document
    against a fixed query-term list; avgdl comes from an exact integer
    sum / count, so the one global statistic is deterministic too.

Tokenization is lowercase whitespace splitting — the corpus-operator
convention shared with the MinHash/SimHash dedup family (and their
oracles), NOT the linguistic tokenizer (textproc.tokenize), which serves
the NER/classification stack.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(text_col):
    return F.split(F.lower(text_col), " ")


def term_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, term, tf) — raw in-document term counts."""
    return (docs
            .select(id_col, F.explode(_tokens(F.col(text_col)))
                    .alias("term"))
            .where(F.col("term") != "")
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def document_frequencies(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(term, df) — number of documents containing the term."""
    return (docs
            .select(id_col, F.explode(F.array_distinct(
                _tokens(F.col(text_col)))).alias("term"))
            .where(F.col("term") != "")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df")))


def tf_idf(docs: DataFrame, id_col: str = "doc_id",
           text_col: str = "text",
           round_decimals: int | None = 6) -> DataFrame:
    """(id, term, tf, tfidf) with smoothed idf = ln((N+1)/(df+1)) + 1."""
    n_docs = docs.count()
    tf = term_frequencies(docs, id_col, text_col)
    df = document_frequencies(docs, id_col, text_col)
    idf = (F.log((F.lit(float(n_docs + 1)))
                 / (F.col("df").cast("double") + 1.0)) + 1.0)
    out = (tf.join(df, "term")
           .select(id_col, "term", "tf",
                   (F.col("tf").cast("double") * idf).alias("tfidf")))
    if round_decimals is not None:
        out = out.withColumn("tfidf", F.round("tfidf", round_decimals))
    return out


def top_keywords(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Top-k document keywords by tf-idf — (id, term, tfidf, kw_rank).
    Ranked on the ROUNDED score (ties → term asc) so ranking is
    engine-portable."""
    scored = tf_idf(docs, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored
            .withColumn("kw_rank", F.row_number().over(w).cast("int"))
            .where(F.col("kw_rank") <= k)
            .select(id_col, "term", "tfidf", "kw_rank"))


def bm25_scores(docs: DataFrame, query_terms: Sequence[str],
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id", text_col: str = "text",
                round_decimals: int | None = 6) -> DataFrame:
    """Okapi BM25 score of every document against ``query_terms``.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).  |d| is the
    document's token count; avgdl = exact Σ|d| / N.  The per-document
    sum runs over ≤ |query_terms| addends in a deterministic (term-
    sorted) order via a sorted array aggregation — order-independent.
    """
    terms = sorted(set(query_terms))
    n_docs = docs.count()
    toks = _tokens(F.col(text_col))
    lens = docs.select(F.size(toks).alias("_len"))
    total_len = lens.agg(F.sum("_len").alias("s")).collect()[0]["s"] or 0
    avgdl = float(total_len) / n_docs if n_docs else 1.0

    tf = term_frequencies(docs, id_col, text_col) \
        .where(F.col("term").isin(terms))
    df = document_frequencies(docs, id_col, text_col) \
        .where(F.col("term").isin(terms))
    idf = F.log(1.0 + (F.lit(float(n_docs)) - F.col("df").cast("double")
                       + 0.5) / (F.col("df").cast("double") + 0.5))
    doc_len = docs.select(id_col, F.size(toks).alias("dl"))
    part = (tf.join(df, "term").join(doc_len, id_col)
            .select(id_col, "term",
                    (idf * (F.col("tf").cast("double") * (k1 + 1.0))
                     / (F.col("tf").cast("double")
                        + k1 * (1.0 - b + b * F.col("dl").cast("double")
                                / avgdl))).alias("_s")))
    # deterministic summation: collect the ≤|terms| addends sorted by
    # term and fold left-to-right — same order in any partitioning (and
    # in the SQL oracle)
    summed = (part.groupBy(id_col)
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(F.struct("term", "_s"))),
                  F.lit(0.0), lambda acc, x: acc + x["_s"])
                  .alias("bm25")))
    out = (docs.select(id_col).join(summed, id_col, "left")
           .select(id_col, F.coalesce("bm25", F.lit(0.0)).alias("bm25")))
    if round_decimals is not None:
        out = out.withColumn("bm25", F.round("bm25", round_decimals))
    return out
