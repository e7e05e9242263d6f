"""Micro-bench: blocked vs full-loop fuzzy linking (VERDICT.md round-2 #6).

Pure-Python (no Spark session — the kernel is what changed): a synthetic
60k-surface dictionary and a 100k-miss query load.  The full loop is timed
on a sample and extrapolated per-query; the blocked path is timed on the
real load.  Prints one JSON line; paste the numbers into BENCH.md.
"""

import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")

from palladian_spark.linking import _BlockedDict, _bound_frac
from palladian_spark.textproc.similarity import METRICS

DICT_N = 60_000
QUERY_N = 100_000       # the synthetic miss load (generated in full)
FULL_SAMPLE = 50        # full loop is ~0.85 s/query — sampled + extrapolated
BLOCKED_SAMPLE = 2_000  # blocked path sampled too; per-query × 100k reported
METRIC, THRESHOLD = "jaro_winkler", 0.9


def synthesize(seed=7):
    rng = random.Random(seed)
    entries = []
    for i in range(DICT_N):
        base = "".join(rng.choice("abcdefghijklmnopqrstu")
                       for _ in range(rng.randint(4, 16)))
        entries.append((f"e{i}", base.capitalize() + f" {i % 97}", "ORG"))
    queries = []
    for i in range(QUERY_N):
        _, surface, _ = entries[rng.randrange(DICT_N)]
        chars = list(surface)
        chars[rng.randrange(len(chars))] = rng.choice("wxyz")
        queries.append("".join(chars))
    return entries, queries


def link_one(value, candidates, sim_fn, threshold):
    best, best_sim = None, threshold
    for entity_id, surface, concept in candidates:
        s = sim_fn(value, surface)
        if s >= best_sim:
            best, best_sim = entity_id, s
    return best, best_sim


def main():
    entries, queries = synthesize()
    sim_fn = METRICS[METRIC]
    frac = _bound_frac(METRIC, THRESHOLD)

    t0 = time.perf_counter()
    index = _BlockedDict(entries, METRIC)
    build_s = time.perf_counter() - t0

    # full loop, sampled
    sample = queries[:FULL_SAMPLE]
    t0 = time.perf_counter()
    full_results = [link_one(q, entries, sim_fn, THRESHOLD) for q in sample]
    full_per_query = (time.perf_counter() - t0) / FULL_SAMPLE

    # blocked, sampled from the same load
    bsample = queries[:BLOCKED_SAMPLE]
    t0 = time.perf_counter()
    blocked_results = []
    n_scored = 0
    for q in bsample:
        idxs = index.candidates(q, frac)
        n_scored += len(idxs)
        blocked_results.append(
            link_one(q, (entries[i] for i in idxs), sim_fn, THRESHOLD))
    blocked_per_query = (time.perf_counter() - t0) / BLOCKED_SAMPLE

    # equivalence on the shared sample
    mismatches = sum(1 for a, b in zip(full_results, blocked_results[:FULL_SAMPLE])
                     if a != b)

    print(json.dumps({
        "metric": "fuzzy_link_speedup",
        "dict_n": DICT_N, "query_n": QUERY_N,
        "index_build_s": round(build_s, 3),
        "full_per_query_ms": round(full_per_query * 1e3, 3),
        "blocked_per_query_ms": round(blocked_per_query * 1e3, 3),
        "est_100k_blocked_s": round(blocked_per_query * QUERY_N, 1),
        "est_100k_full_s": round(full_per_query * QUERY_N, 1),
        "speedup": round(full_per_query / blocked_per_query, 1),
        "avg_candidates_scored": round(n_scored / BLOCKED_SAMPLE, 1),
        "sample_mismatches": mismatches,
    }))


if __name__ == "__main__":
    main()
