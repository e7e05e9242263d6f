"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"kg_triples": sec, ...}, "sf": ..., "extra": {...}}

The flagship number is the end-to-end KG pipeline (NER chain → linking →
relation patterns → canonical triples) over transcripts derived from the
sf's lineitem table (1 turn per lineitem row).  triples/sec is reported in
"extra" alongside.  Run tools/scaling_bench.py for the N-vs-4N-cores
scaling-efficiency evidence (BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    from palladian_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("palladian-bench", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    # warm the JVM and the Python worker pool with the FULL kg path on the
    # tiny sf so the first timed query doesn't pay the per-session
    # 32-worker import + broadcast-fetch cold start
    queries_warm = entrymod.queries()
    queries_warm["kg_triples"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    headline_r01 = [
        "kg_triples",
        "candidates_stringtagger",
        "word_tokenize",
        "dedup_exact",
        "lsh_dedup_pairs",
        "classify_default",
        "minhash_signatures",
        "similarity_ngram_dice",
        "ann_cosine_top1",
        "multimodal_meta",
        "sessionize_events",
        "pos_tag",
    ]
    # round-2 operators (kept separate so the r01 subset stays comparable
    # across rounds — see extra["headline_r01_total"])
    headline_r02 = headline_r01 + [
        "dates_tagged",
        "pos_tag_clf",
        "lang_id",
    ]
    # round-3 graph analytics (kg_pagerank re-runs the full kg pipeline
    # as its input, so it is the second-most-expensive row by design)
    headline_r03 = headline_r02 + [
        "kg_degrees",
        "kg_pagerank",
        "dedup_components",
    ]
    # round-4 curation signals (shuffle-free bigram LM, hashed n-gram
    # decontamination + the span-level variant)
    headline = headline_r03 + [
        "lm_perplexity",
        "decontamination",
        "decontamination_spans",
        "repetition_scores",
        "scrub_pii",
        "dedup_incremental",
        "curate_corpus_full",
        "simhash_neardup",
        # round-4 second window: distinct-name-collapsed blocked ER
        "er_match_pairs",
        "er_clusters",
    ]
    queries = entrymod.queries()
    for name in headline:
        fn = queries[name]
        # best-of-2 for EVERY query (round 3; was kg_triples/lang_id
        # only): the sandbox's virtio disk shows ~50 s IO-stall events
        # (PSI io full avg10 ≈ 0.5) that land on whichever query is
        # running — single-shot timings randomly attribute a stall to an
        # innocent query.  Best-of-2 also absorbs one-time driver
        # plan/codegen constants a warm executor never pays at scale.
        repeats = 2
        best_dt, n_rows = None, 0
        for _ in range(repeats):
            t0 = time.time()
            n_rows = fn(spark, sf_dir).count()
            dt = time.time() - t0
            if best_dt is None or dt < best_dt:
                best_dt = dt
        timings[name] = round(best_dt, 3)
        extra[f"{name}_rows"] = n_rows

    # materialize-triples-once graph bench: the real pipeline shape —
    # triples are built ONCE and every graph analytic runs on the
    # materialized table, so these numbers are the MARGINAL cost of each
    # graph op (the headline kg_degrees/kg_pagerank rows above re-run the
    # NER kernel as their input because contract queries are
    # self-contained by design; see NOTES.md)
    from pyspark.sql import functions as F
    from palladian_spark.graph import (apply_triangle_delta, hits, kcore,
                                       kg_degrees, kg_snapshot_diff,
                                       kg_triangles, label_propagation,
                                       modularity, pagerank, random_walks,
                                       transitive_closure)
    from palladian_spark.operators.kg_training import walk_skipgrams
    t0 = time.time()
    triples = queries["kg_triples"](spark, sf_dir).cache()
    triples.count()
    extra["graph_materialize_triples_sec"] = round(time.time() - t0, 3)
    def _comention_edges():
        wf = (triples.where(F.col("pred") == "works_for")
              .select("conv_id", "turn_idx", F.col("subj").alias("cust"),
                      F.col("obj").alias("mid")))
        li = (triples.where(F.col("pred") == "located_in")
              .select("conv_id", "turn_idx", F.col("subj").alias("mid"),
                      F.col("obj").alias("nat")))
        closure = (wf.join(li, ["conv_id", "turn_idx", "mid"])
                   .select(F.col("cust").alias("u"), F.col("nat").alias("v")))
        return triples.select(F.col("subj").alias("u"),
                              F.col("obj").alias("v")).union(closure)

    from palladian_spark.data.transcripts import tpch_transcripts_df
    from palladian_spark.graph import neighborhood_features
    from palladian_spark.operators.kg_fusion import (
        inverse_relation_candidates, mine_chain_rules)
    from palladian_spark.operators.kg_temporal import (
        fact_transitions, recency_weighted_edges, top_facts)
    tst = (tpch_transcripts_df(spark, sf_dir)
           .select("conv_id", "turn_idx", "ts").distinct())
    obs = (triples.join(tst, ["conv_id", "turn_idx"])
           .select("subj", "pred", "obj", "ts", "conv_id", "turn_idx")
           .distinct().cache())
    obs.count()
    pr_edges = triples.select(F.col("subj").alias("src"),
                              F.col("obj").alias("dst"))
    warm_init = pagerank(pr_edges, n_iter=3, round_decimals=None).cache()
    warm_init.count()
    # snapshot-cadence triangle state (built once, outside the timed
    # lambda — the store a maintenance job would already hold): old =
    # 4/5 of the canonical co-mention edges, delta = the other fifth
    tri_canon = (_comention_edges()
                 .select(F.least("u", "v").alias("u"),
                         F.greatest("u", "v").alias("v"))
                 .where(F.col("u") != F.col("v")).distinct().cache())
    tri_is_new = F.pmod(F.xxhash64("u", "v"), F.lit(5)) == 0
    tri_old_edges = tri_canon.where(~tri_is_new)
    tri_delta = tri_canon.where(tri_is_new)
    tri_old_profile = kg_triangles(tri_old_edges, cache=False).cache()
    tri_old_profile.count()

    for gname, gfn in [
        ("kg_degrees", lambda: kg_degrees(triples)),
        # round-4 fourth window: temporal / incremental / rule layers
        # (marginal cost on the materialized triple/observation tables)
        ("fact_transitions", lambda: fact_transitions(obs)),
        ("kg_top_facts", lambda: top_facts(obs, k=3)),
        ("kg_edges_decayed", lambda: recency_weighted_edges(obs)),
        ("kg_neighborhood_features", lambda: neighborhood_features(triples)),
        ("kg_inverse_relations", lambda: inverse_relation_candidates(
            triples, min_overlap=2)),
        ("kg_rule_mining", lambda: mine_chain_rules(triples, min_support=2)),
        ("kg_pagerank", lambda: pagerank(
            triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst")), n_iter=3)),
        # warm-start refresh: 2 iterations from a cached previous vector
        # (built once below, outside the timed lambda) — the incremental
        # snapshot-cadence cost, ≈ 2/3 of a cold 3-iteration run
        ("kg_pagerank_warm_refresh", lambda: pagerank(
            pr_edges, n_iter=2, init_ranks=warm_init)),
        ("kg_triangles", lambda: kg_triangles(_comention_edges())),
        # incremental twin: fold the held-out fifth into the cached old
        # profile — the per-batch cost a maintenance job pays instead
        # of the full recompute above
        ("kg_triangles_delta", lambda: apply_triangle_delta(
            tri_old_profile, tri_old_edges, tri_delta, cache=False)),
        ("kg_hits", lambda: hits(
            triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst")), n_iter=2)),
        ("kg_snapshot_diff", lambda: kg_snapshot_diff(
            triples.where(F.col("turn_idx") <= 3), triples)),
        ("kg_kcore", lambda: kcore(
            triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst")), k=3, rounds=3)),
        # id_strategy="hash": the distributed vocabulary path (no global
        # row_number sort) — the configuration a real cluster runs; the
        # contract query keeps sorted ids for SQL-oracle replay
        ("kg_walks_skipgrams", lambda: walk_skipgrams(random_walks(
            triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst")),
            walk_len=2, seed=7, id_strategy="hash"), window=2)),
        ("kg_closure", lambda: transitive_closure(
            triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst")), max_rounds=4)),
        ("kg_modularity", lambda: modularity(
            triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst")),
            label_propagation(
                triples.select(F.col("subj").alias("src"),
                               F.col("obj").alias("dst")), n_iter=2))),
    ]:
        best = None
        for _ in range(2):
            t0 = time.time()
            gfn().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        extra[f"graph_marginal_{gname}_sec"] = round(best, 3)
    warm_init.unpersist()
    tri_old_profile.unpersist()
    tri_canon.unpersist()
    obs.unpersist()
    triples.unpersist()

    # throughput: triples/sec and turns/sec for the flagship
    import duckdb
    n_turns = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet'").fetchone()[0]
    extra["turns"] = n_turns
    extra["triples_per_sec"] = round(extra["kg_triples_rows"] / timings["kg_triples"], 1)
    extra["turns_per_sec"] = round(n_turns / timings["kg_triples"], 1)
    extra["headline_r01_total"] = round(
        sum(timings[q] for q in headline_r01), 3)
    extra["headline_r02_total"] = round(
        sum(timings[q] for q in headline_r02), 3)
    extra["headline_r03_total"] = round(
        sum(timings[q] for q in headline_r03), 3)

    spark.stop()
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass
    return {
        "metric": "kg_construction_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": extra,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    result = run_bench(sf_dir, cpus)
    # The driver keeps only the last 2000 bytes of stdout, which truncates
    # the per-query dict — persist the full artifact next to the repo so
    # round-over-round comparisons survive (BENCH_r04 lost its front).
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_local.json"))
    try:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
