"""simhash_neardup_pairs: banded Hamming join vs brute force (the
pigeonhole full-recall property), planted near-dups, symmetry/dedup."""

import itertools

from pyspark.sql import functions as F

from palladian_spark.operators.dedup import simhash, simhash_neardup_pairs


def _pairs(spark, rows, **kw):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {(r["a_id"], r["b_id"]): r["hamming"]
            for r in simhash_neardup_pairs(d, **kw).collect()}


def test_identical_docs_distance_zero(spark):
    got = _pairs(spark, [(1, "alpha beta gamma delta"),
                         (2, "alpha beta gamma delta"),
                         (3, "completely different words here")])
    assert got[(1, 2)] == 0
    assert all(a < b for a, b in got)


def test_banding_equals_brute_force(spark):
    # 30 docs drawn from overlapping vocab → rich fingerprint spread;
    # the banded join must find EXACTLY the brute-force Hamming ≤ 3 set
    vocab = ["red", "green", "blue", "cyan", "teal", "pink", "gold",
             "gray", "jade", "plum"]
    rows = [(i, " ".join(vocab[j % len(vocab)]
                         for j in range(i, i + 5))) for i in range(30)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["simhash"]
           for r in simhash(d, bits=32).collect()}
    brute = {(a, b): bin(fps[a] ^ fps[b]).count("1")
             for a, b in itertools.combinations(sorted(fps), 2)
             if bin(fps[a] ^ fps[b]).count("1") <= 3}
    got = _pairs(spark, rows)
    assert got == brute
    assert len(got) > 0


def test_max_hamming_filter(spark):
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
            (3, "a b c d e f g z")]
    strict = _pairs(spark, rows, max_hamming=0)
    assert (1, 2) in strict
    assert all(h == 0 for h in strict.values())
