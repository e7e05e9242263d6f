"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation set.

Every serious training-data pipeline runs this stage: any document
containing a long-enough n-gram from a benchmark is suspect (the
benchmark leaked into the corpus).  Relational shape:

  eval n-grams  — distinct n-grams of the (small) eval set; Catalyst
                  broadcasts the table when it fits, falls back to a
                  shuffle join on the n-gram key when it does not —
                  both sides are just (ngram) rows, so the op scales to
                  an eval SUITE, not only one benchmark.
  doc n-grams   — explode per training document (offset explode, all
                  codegen), inner-join against the eval n-grams, count
                  DISTINCT matches per document.
  output        — every training doc with n_hits (0 via left join), so
                  the caller chooses the threshold (≥1 = drop, or keep
                  with a contamination score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _word_ngrams(text_col, n: int):
    toks = F.split(F.lower(text_col), " ")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    # short documents yield truncated trailing windows — drop them so
    # only FULL n-grams count as contamination evidence
    full = F.filter(
        grams, lambda g: F.size(F.split(g, " ")) == n)
    return F.array_distinct(full)


def ngram_overlap_flags(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, n_hits): distinct eval n-grams found in each training doc."""
    eval_grams = (eval_docs
                  .select(F.explode(_word_ngrams(F.col(text_col), n))
                          .alias("ngram"))
                  .distinct())
    doc_grams = docs.select(
        id_col, F.explode(_word_ngrams(F.col(text_col), n)).alias("ngram"))
    hits = (doc_grams.join(eval_grams, "ngram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                  max_hits: int = 0, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Training docs with ≤ ``max_hits`` overlapping eval n-grams."""
    flags = ngram_overlap_flags(docs, eval_docs, n, id_col, text_col)
    keep = flags.where(F.col("n_hits") <= max_hits).select(id_col)
    return docs.join(keep, id_col, "left_semi")
