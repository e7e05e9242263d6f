"""incremental_dedup: snapshot-over-snapshot semantics — exact flag via
base fingerprints, near-dup only new×base (never base×base or new×new),
deterministic best-match tie-break."""

from pyspark.sql import functions as F

from palladian_spark.operators.dedup import incremental_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, base_rows, new_rows, **kw):
    out = incremental_dedup(_docs(spark, base_rows), _docs(spark, new_rows),
                            **kw)
    return {r["doc_id"]: (r["dup_exact"], r["near_dup_of"], r["jaccard"])
            for r in out.collect()}


def test_exact_dup_flagged(spark):
    got = _run(spark, [(1, "alpha beta gamma delta")],
               [(10, "alpha beta gamma delta"), (11, "totally other words")])
    assert got[10][0] is True
    assert got[11][0] is False
    # the exact dup is also a near dup of base doc 1 (identical shingles)
    assert got[10][1] == 1 and got[10][2] == 1.0


def test_new_doc_without_match_has_nulls(spark):
    got = _run(spark, [(1, "a b c d e f")], [(10, "x y z w v u")])
    assert got[10] == (False, None, None)


def test_near_dup_of_is_best_base_match(spark):
    # 10 shares 4/5 shingle overlap with base 2, less with base 1
    base = [(1, "a b c d e"), (2, "a b c d f g")]
    new = [(10, "a b c d f g h")]
    got = _run(spark, base, new, threshold=0.2)
    assert got[10][1] == 2
    assert got[10][2] > 0.5


def test_base_never_paired_against_itself(spark):
    # two identical base docs: output has only NEW rows, one per new doc
    base = [(1, "same text here okay"), (2, "same text here okay")]
    new = [(10, "unrelated words entirely different")]
    got = _run(spark, base, new)
    assert set(got) == {10}


def test_tie_break_lowest_base_id(spark):
    # both base docs identical → equal jaccard; the lower id wins
    base = [(5, "p q r s t"), (3, "p q r s t")]
    new = [(10, "p q r s t")]
    got = _run(spark, base, new)
    assert got[10][1] == 3


def test_one_row_per_new_doc(spark):
    base = [(i, f"tok{i} a b c d") for i in range(5)]
    new = [(10 + i, f"tok{i} a b c d") for i in range(5)]
    out = incremental_dedup(_docs(spark, base), _docs(spark, new),
                            threshold=0.2)
    assert out.count() == 5
    assert out.select("doc_id").distinct().count() == 5
