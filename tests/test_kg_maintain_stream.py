"""Streaming KG maintenance: incremental edge/evidence/degree stores must
equal the batch recompute over everything ingested, across drains and
replays."""

import pytest
from pyspark.sql import functions as F

from palladian_spark.streaming.kg_maintain import (
    _maintain_batch, current_degrees, fold_evidence,
    run_streaming_kg_maintenance)


@pytest.fixture()
def workdir(tmp_path):
    (tmp_path / "in").mkdir()
    (tmp_path / "out").mkdir()
    return tmp_path


def _write_batch(spark, in_dir, conv_prefix, n):
    from palladian_spark.data.transcripts import synthetic_transcripts_pdf
    tp, _ = synthetic_transcripts_pdf(n_convs=n, turns_per_conv=4)
    tp["conv_id"] = conv_prefix + "-" + tp["conv_id"]
    spark.createDataFrame(tp).coalesce(1).write.mode("append") \
        .parquet(str(in_dir))


def _setup(spark):
    from palladian_spark.data.transcripts import entity_dictionary_pdf
    from palladian_spark.pipeline import default_model
    entity_dict = spark.createDataFrame(
        entity_dictionary_pdf().assign(
            entity_id=lambda d: d["concept"].str.lower() + ":" + d["surface"]))
    return default_model(), entity_dict


def _degree_map(df):
    return {r["node"]: (r["out_degree"], r["in_degree"])
            for r in df.collect()}


def test_maintain_batch_kernel(spark, tmp_path):
    out = str(tmp_path / "out")
    t1 = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "b"), ("b", "p", "c")],
        ["subj", "pred", "obj"])
    row = _maintain_batch(spark, t1, 0, out)
    assert (row["n_triples"], row["n_new_edges"], row["n_nodes"]) == (3, 2, 3)
    # second batch: one repeated edge (evidence only), one novel edge
    t2 = spark.createDataFrame(
        [("a", "p", "b"), ("c", "p", "d")], ["subj", "pred", "obj"])
    row2 = _maintain_batch(spark, t2, 1, out)
    assert row2["n_new_edges"] == 1
    deg = _degree_map(current_degrees(spark, out))
    assert deg == {"a": (1, 0), "b": (1, 1), "c": (1, 1), "d": (0, 1)}
    ev = {(r["subj"], r["obj"]): r["n_obs"]
          for r in fold_evidence(spark, out).collect()}
    assert ev == {("a", "b"): 3, ("b", "c"): 1, ("c", "d"): 1}


def test_maintain_batch_replay_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    t1 = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    t2 = spark.createDataFrame([("b", "p", "c")], ["subj", "pred", "obj"])
    _maintain_batch(spark, t1, 0, out)
    _maintain_batch(spark, t2, 1, out)
    before = _degree_map(current_degrees(spark, out))
    # replay batch 1 (crash-before-checkpoint-commit scenario): stores
    # must end up identical, not doubled
    _maintain_batch(spark, t2, 1, out)
    assert _degree_map(current_degrees(spark, out)) == before
    ev = {(r["subj"], r["obj"]): r["n_obs"]
          for r in fold_evidence(spark, out).collect()}
    assert ev == {("a", "b"): 1, ("b", "c"): 1}


def test_streaming_matches_batch_recompute(spark, workdir):
    from palladian_spark.graph import kg_degrees
    from palladian_spark.relations import extract_canonical_triples

    in_dir, out_dir = str(workdir / "in"), str(workdir / "out")
    model, entity_dict = _setup(spark)

    _write_batch(spark, in_dir, "b1", 4)
    run_streaming_kg_maintenance(spark, in_dir, out_dir, model, entity_dict)

    # second drain with no new input: nothing changes
    last0 = _degree_map(current_degrees(spark, out_dir))
    run_streaming_kg_maintenance(spark, in_dir, out_dir, model, entity_dict)
    assert _degree_map(current_degrees(spark, out_dir)) == last0

    # a second wave arrives → only the delta is folded in
    _write_batch(spark, in_dir, "b2", 3)
    run_streaming_kg_maintenance(spark, in_dir, out_dir, model, entity_dict)

    full = extract_canonical_triples(
        spark.read.parquet(in_dir), model, entity_dict)
    assert _degree_map(current_degrees(spark, out_dir)) == \
        _degree_map(kg_degrees(full))
    # cumulative folded evidence == full recompute's observation counts
    expect = {(r["subj"], r["pred"], r["obj"]): r["n"]
              for r in full.groupBy("subj", "pred", "obj")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {(r["subj"], r["pred"], r["obj"]): r["n_obs"]
           for r in fold_evidence(spark, out_dir).collect()}
    assert got == expect
    # edge store is append-only novel edges: total == distinct edge count
    edges = spark.read.option("basePath", f"{out_dir}/edges") \
        .parquet(f"{out_dir}/edges/batch=*")
    assert edges.count() == \
        full.select("subj", "pred", "obj").distinct().count()


def test_compact_stores_preserves_folds(spark, tmp_path):
    from palladian_spark.streaming.kg_maintain import compact_stores
    out = str(tmp_path / "out")
    for i, rows in enumerate([[("a", "p", "b"), ("a", "p", "b")],
                              [("b", "p", "c")],
                              [("a", "p", "b"), ("c", "p", "d")]]):
        _maintain_batch(spark, spark.createDataFrame(
            rows, ["subj", "pred", "obj"]), i, out)
    ev_before = {(r["subj"], r["obj"]): r["n_obs"]
                 for r in fold_evidence(spark, out).collect()}
    deg_before = _degree_map(current_degrees(spark, out))
    n = compact_stores(spark, out)
    assert n == {"evidence_delta": 3, "edges": 3}
    assert {(r["subj"], r["obj"]): r["n_obs"]
            for r in fold_evidence(spark, out).collect()} == ev_before
    # a further batch after compaction still anti-joins correctly
    _maintain_batch(spark, spark.createDataFrame(
        [("a", "p", "b"), ("d", "p", "e")], ["subj", "pred", "obj"]), 3, out)
    deg = _degree_map(current_degrees(spark, out))
    # d already carried in-degree 1 from batch 2's (c, p, d)
    assert deg["d"] == (1, 1) and deg["e"] == (0, 1)
    assert deg["a"] == deg_before["a"]  # repeated edge adds no degree
    ev = {(r["subj"], r["obj"]): r["n_obs"]
          for r in fold_evidence(spark, out).collect()}
    assert ev[("a", "b")] == 4  # 2 + 1 + 1 across compaction boundary


def test_run_kg_maintain_job(spark, workdir, capsys):
    import json as _json
    from jobs.run_kg_maintain import main
    in_dir, out_dir = str(workdir / "in"), str(workdir / "out")
    _write_batch(spark, in_dir, "b1", 3)
    assert main(["--input", in_dir, "--output", out_dir, "--compact"],
                stop=False) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["nodes"] > 0
