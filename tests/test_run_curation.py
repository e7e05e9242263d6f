"""jobs/run_curation.py: the spark-submit curation entry point, driven
in-process against the driver testdata."""

import json

from jobs.run_curation import main


def test_run_curation_one_shot_and_vs_base(spark, tmp_path, capsys):
    docs = "/root/testdata/sf0.001/documents.parquet"
    out1 = str(tmp_path / "snap1")
    assert main(["--input", docs, "--output", out1], stop=False) == 0
    stats1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < stats1["survivors"] <= stats1["docs_in"]

    surv1 = spark.read.parquet(f"{out1}/survivors")
    assert {"doc_id", "text"} <= set(surv1.columns)
    report = spark.read.parquet(f"{out1}/report")
    assert report.count() > 0 and "n_kept" in report.columns

    # second snapshot of the SAME corpus vs the first: everything that
    # survives curation again is an exact dup of the base → 0 new docs
    out2 = str(tmp_path / "snap2")
    assert main(["--input", docs, "--output", out2,
                 "--base", f"{out1}/survivors"], stop=False) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["survivors"] == 0
    assert stats2["dropped_vs_base"] == stats1["survivors"]
    dec = spark.read.parquet(f"{out2}/decisions")
    assert dec.where("dup_exact").count() == stats1["survivors"]
