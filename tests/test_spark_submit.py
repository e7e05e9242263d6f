"""The north-rule deployment contract, end-to-end: package the zip, run
jobs/run_kg.py through REAL spark-submit --py-files in a fresh JVM, and
resume from the bucket lineage on a second run."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(os.path.dirname(pyspark.__file__)) / "bin" / "spark-submit"


def test_spark_submit_run_kg_and_resume(spark, tmp_path):
    from palladian_spark.data.transcripts import synthetic_transcripts_pdf

    zip_out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "package.py")],
        capture_output=True, text=True, check=True)
    zip_path = zip_out.stdout.strip()

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    tp, _ = synthetic_transcripts_pdf(n_convs=6, turns_per_conv=4)
    spark.createDataFrame(tp).coalesce(1).write.parquet(in_dir)

    def submit():
        env = dict(os.environ)
        env.pop("SPARK_MASTER", None)
        return subprocess.run(
            [str(SPARK_SUBMIT), "--master", "local[4]",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_path,
             str(REPO / "jobs" / "run_kg.py"),
             "--input", in_dir, "--output", out_dir, "--buckets", "4"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=str(tmp_path))

    r1 = submit()
    assert r1.returncode == 0, r1.stderr[-2000:]
    stats1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert stats1["triples"] > 0
    assert stats1["buckets_computed"] == 4

    triples = spark.read.parquet(f"{out_dir}/triples")
    assert triples.count() == stats1["triples"]
    assert {"subj", "pred", "obj"} <= set(triples.columns)

    # second run, same output dir: lineage says every bucket is done
    r2 = submit()
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert stats2["buckets_computed"] == 0
    assert stats2["triples"] == stats1["triples"]
