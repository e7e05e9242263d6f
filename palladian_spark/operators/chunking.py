"""Document chunking for training-data / retrieval prep.

The windowing op every LLM-data pipeline runs between curation and
tokenization: split each document into overlapping token windows of
``size`` tokens advancing by ``stride`` (< size ⇒ overlap).  Pure
top-level array expressions — tokens via one split, window starts via
``sequence``, window content via ``slice`` + explode — so the whole op
is one projection + one explode, no shuffle at all until the caller
aggregates (`count-over-explode` folds to sum(size(...)), see
NOTES.md).  Engine-portable: the same arithmetic replays in SQL.

Windowing rule: starts at 0, stride, 2·stride, … while start <
n_tokens (every token is covered; the last window may be short; an
empty/whitespace-only doc yields one empty chunk at idx 0 — kept, so
doc counts are preserved through the stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(docs: DataFrame, size: int = 64, stride: int = 48,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): whitespace-token windows
    of ``size`` advancing by ``stride``."""
    if not 0 < stride <= size:
        raise ValueError("need 0 < stride <= size")
    toks = F.expr(
        f"filter(split({text_col}, '\\\\s+'), x -> x != '')")
    n = F.size(F.col("_toks"))
    # one start per window: 0, stride, ... < max(n, 1)
    n_windows = F.greatest(F.ceil(n / F.lit(stride)), F.lit(1)).cast("int")
    return (docs
            .select(id_col, toks.alias("_toks"))
            .select(id_col, "_toks",
                    F.posexplode(F.sequence(
                        F.lit(0), n_windows - 1)).alias("chunk_idx", "_w"))
            .select(id_col,
                    F.col("chunk_idx"),
                    F.array_join(
                        F.slice(F.col("_toks"),
                                F.col("_w") * stride + 1, size),
                        " ").alias("chunk_text"),
                    F.least(F.greatest(n - F.col("_w") * stride, F.lit(0)),
                            F.lit(size)).cast("int").alias("n_tokens")))
