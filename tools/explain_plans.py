"""Dump physical plans for the headline queries → PLANS.md.

For each inspected query we record the formatted plan plus three scale
properties extracted from it:

  * python_nodes  — Arrow/Pandas eval operators (should appear ONLY in the
                    stages that are Python by design: NER kernel, fuzzy
                    linker, ANN matmul, multimodal decode)
  * codegen       — number of WholeStageCodegen spans (JVM stages fused)
  * pushed/read   — parquet PushedFilters + ReadSchema (column pruning)

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INSPECT = [
    # name, expect_python
    ("kg_triples", True),
    ("remove_nested", False),
    ("combine_adjacent", False),
    ("dict_model_train", False),
    ("classify_default", False),
    ("lsh_dedup_pairs", False),
    ("simhash", False),
    ("sessionize_events", False),
    ("event_windows", False),
    ("np_chunks", True),       # tokenizer offsets are an Arrow stage
    ("doc_token_stats", False),
    # round-2 operators
    ("ann_cosine_top1", True),        # block-matmul kernel is Arrow by design
    ("embedding_neardup", True),      # same (exact branch at this size)
    ("ann_lsh_top1", True),           # signature + per-bucket scoring
    ("dates_tagged", True),           # DateParser kernel is Arrow by design
    ("pos_tag_clf", True),            # classifier kernel is Arrow by design
    ("lang_id", False),               # pure Catalyst classifier
    ("complete_retrain_removed", True),  # second tagging pass is Arrow
    # round-3 graph analytics
    ("kg_degrees", True),       # input = full pipeline (Arrow NER kernel)
    ("kg_pagerank", True),      # same input; iterations are pure Catalyst
    ("dedup_components", False),  # MinHash pairs + label propagation
    # round-4 operators
    ("lm_perplexity", False),       # array-side bigrams: no sort window
    ("decontamination", False),     # hashed n-gram join
    ("repetition_scores", False),   # two explode→agg chains, pure codegen
    ("scrub_pii", False),           # regexp chain, single projection
    ("kg_triangles", True),         # input = full pipeline (Arrow kernel)
    ("dedup_incremental", False),   # bands new×base + verify join
    ("curate_corpus_full", False),  # composed gates, pure Catalyst
    # round-4 late batch: fusion / temporal / coref / graph layers
    ("kg_infer_triples", True),     # input = full pipeline (Arrow kernel)
    ("kg_resolve_facts", True),     # same input; windows are Catalyst
    ("kg_bernoulli_negatives", True),
    ("fact_transitions", True),     # SCD2 windows are pure Catalyst
    ("resolve_pronouns", True),     # union-sweep window, no pair join
    ("kg_hits", True),              # integer iterations, pure Catalyst
    ("kg_snapshot_diff", True),     # persisted triple input, outer join
    ("asof_join_state", False),     # union + one per-key sweep
    ("canonicalize_surfaces", False),  # blocked Dice + star components
    ("kg_bfs", False),   # localCheckpoint truncates the Arrow lineage
    ("kg_ppr", True),               # seed-restart iterations, Catalyst
    ("kg_communities", True),       # LPA rounds, pure Catalyst
    ("kg_validate", True),          # broadcast signature joins
    ("chunk_documents", False),     # projection + explode, shuffle-free
    ("turn_topic_shifts", False),   # per-conv window + set exprs
    ("tool_usage_stats", False),    # one hash agg
    # round-4 second window: fused linking + walk corpus + graph adds
    ("kg_kcore", True),   # node-state rewrite: cached edges keep the Arrow
                          # NER lineage in-plan (the old edge-level
                          # checkpoint truncated it)
    ("kg_walks", True),         # rank-indexed adjacency joins, Catalyst
    ("kg_walks_biased", True),  # fan-out + cum-weight window, Catalyst
    ("walk_skipgrams", True),   # banded self-join on walk_id
    ("fact_conflicts", True),   # distinct obs + windowed self-join
    ("conv_graph_stats", True),  # two aggs + join on conv_id
    ("kg_role_provenance", True),  # join back to (conv, turn, role)
    # round-4 third window: ER + closure + community quality
    ("er_match_pairs", False),   # distinct-name inventory self-join
    ("er_clusters", False),      # name-level components + group agg
    ("kg_closure", False),       # localCheckpoint truncates Arrow input
    ("kg_modularity", True),     # LPA labels + edge aggs, Catalyst
    ("kg_quotient", True),       # label joins + one hash agg
    # round-4 fourth window: temporal / incremental / rule layers
    ("kg_as_of", True),          # SCD2 windows + as-of filter, Catalyst
    ("kg_top_facts", True),      # evidence agg + per-subject window
    ("kg_edges_decayed", True),  # broadcast max-ts + bucket expr + agg
    ("kg_degrees_incremental", True),  # diff + delta merge, Catalyst
    ("cooccurrence_pmi", True),  # pair aggs + marginal joins
    ("kg_inverse_relations", True),  # edge-vs-reversal self-join
    ("kg_neighborhood_features", True),  # degree joins + nbr agg
    ("kg_rule_mining", True),    # 2-hop body join + head join
    ("kg_truth_decayed", True),  # weighted edges + per-fact window
    ("kg_type_inference", True),  # seed joins + vote aggs per round
    ("kg_ego", True),            # BFS frontier joins + edge filter
    ("er_stable_ids", False),    # window assigns + overlap agg
    # round-5: incremental triangle maintenance
    ("kg_triangles_incremental", True),  # delta wedges probe old graph
                                         # by hash joins; Arrow NER input
]

PY_NODE_RE = re.compile(
    r"(ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas|"
    r"PythonMapInArrow)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from palladian_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("explain-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()

    out = ["# PLANS — physical-plan evidence for the headline operators",
           "",
           f"Generated by `python tools/explain_plans.py {sf_dir}`.",
           "Python nodes must appear only in by-design Arrow stages;",
           "everything else runs in whole-stage codegen with columns",
           "pruned at the parquet scan.", ""]
    for name, expect_python in INSPECT:
        df = queries[name](spark, sf_dir)
        # drive THIS DataFrame's own QueryExecution (collect — count()
        # builds a separate execution and leaves df's plan initial):
        # AQE only materializes WholeStageCodegen spans and its final
        # join/partition choices in the executed plan
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        py = sorted(set(PY_NODE_RE.findall(plan)))
        # DISTINCT span ids: reused-exchange subtrees are re-printed per
        # consumer, so raw marker occurrences overcount massively
        codegen = max(len(set(re.findall(r"\*\((\d+)\)", plan))),
                      len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))))
        scans = [ln.strip() for ln in plan.splitlines()
                 if "ReadSchema" in ln or "PushedFilters" in ln]
        status = "OK"
        if py and not expect_python:
            status = "UNEXPECTED-PYTHON"
        if not py and expect_python:
            status = "EXPECTED-PYTHON-MISSING"
        out.append(f"## {name} — {status}")
        out.append("")
        out.append(f"- python nodes: {py if py else 'none'}")
        out.append(f"- whole-stage-codegen spans: {codegen}")
        for s in scans[:3]:
            out.append(f"- scan: `{s[:160]}`")
        out.append("")
        print(f"{name:24s} {status:26s} py={py} codegen={codegen}")

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
