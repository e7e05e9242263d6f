"""Token-window document chunking."""

import pytest

from palladian_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_with_overlap(spark):
    text = " ".join("t%d" % i for i in range(10))
    out = sorted((r["chunk_idx"], r["chunk_text"], r["n_tokens"])
                 for r in chunk_documents(
                     _docs(spark, [(1, text)]), size=4, stride=3).collect())
    # starts 0,3,6,9 — last window short
    assert out == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
        (3, "t9", 1)]


def test_exact_multiple_no_empty_tail(spark):
    text = "a b c d e f"
    out = chunk_documents(_docs(spark, [(1, text)]),
                          size=3, stride=3).collect()
    assert sorted(r["chunk_text"] for r in out) == ["a b c", "d e f"]


def test_short_and_empty_docs_kept(spark):
    out = {r["doc_id"]: (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
           for r in chunk_documents(
               _docs(spark, [(1, "only two"), (2, "   ")]),
               size=5, stride=5).collect()}
    assert out[1] == (0, "only two", 2)
    assert out[2] == (0, "", 0)


def test_bad_stride_raises(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), size=4, stride=5)
