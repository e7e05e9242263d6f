"""Cross-document surface canonicalization semantics."""

import pytest
from pyspark.sql import Row

from palladian_spark.canonicalize import (
    canonicalize_surfaces, surface_dice_pairs)
from palladian_spark.textproc.similarity import char_ngram_similarity


def _mentions(spark, rows):
    return spark.createDataFrame(
        [Row(block="t", surface=s) for s in rows])


def test_dice_pairs_match_python_metric(spark):
    surfaces = ["acme corporation", "acme corporatio", "acme corp",
                "zebra holdings"]
    df = spark.createDataFrame([Row(block="t", surface=s) for s in surfaces])
    got = {(r["a_surface"], r["b_surface"]): r["dice_sim"]
           for r in surface_dice_pairs(df, block_cols=["block"],
                                       threshold=0.5).collect()}
    for a in surfaces:
        for b in surfaces:
            if a >= b:
                continue
            expected = round(char_ngram_similarity(a, b, n=3), 6)
            if expected >= 0.5:
                assert got[(a, b)] == pytest.approx(expected, abs=1e-6)
            else:
                assert (a, b) not in got


def test_transitive_chain_one_cluster(spark):
    # a~b and b~c similar, a~c less so: still ONE cluster via components
    m = _mentions(spark, ["acme corporation", "acme corporation ltd",
                          "acme corporation ltd gmbh", "zebra"])
    out = canonicalize_surfaces(m, block_cols=["block"], threshold=0.7)
    rows = {r["surface"]: r for r in out.collect()}
    cluster = {s for s, r in rows.items() if r["cluster_size"] == 3}
    assert cluster == {"acme corporation", "acme corporation ltd",
                       "acme corporation ltd gmbh"}
    # equal freq -> lexicographically smallest surface wins
    assert all(rows[s]["canonical"] == "acme corporation" for s in cluster)
    assert rows["zebra"]["canonical"] == "zebra"
    assert rows["zebra"]["cluster_size"] == 1


def test_representative_prefers_frequency(spark):
    m = _mentions(spark, ["acme corporation"] * 1
                  + ["acme corporatio"] * 5 + ["zzz"])
    out = canonicalize_surfaces(m, block_cols=["block"], threshold=0.7)
    rows = {r["surface"]: r for r in out.collect()}
    assert rows["acme corporation"]["canonical"] == "acme corporatio"
    assert rows["acme corporatio"]["freq"] == 5


def test_blocks_never_merge(spark):
    m = spark.createDataFrame(
        [Row(block="PER", surface="acme corporation"),
         Row(block="ORG", surface="acme corporation ltd")])
    out = canonicalize_surfaces(m, block_cols=["block"], threshold=0.5)
    for r in out.collect():
        assert r["cluster_size"] == 1
        assert r["canonical"] == r["surface"]


def test_every_surface_appears_once(spark):
    surfaces = [f"name variant {i // 3} x{i}" for i in range(30)]
    m = _mentions(spark, surfaces)
    out = canonicalize_surfaces(m, block_cols=["block"], threshold=0.5)
    got = [r["surface"] for r in out.collect()]
    assert sorted(got) == sorted(set(surfaces))
