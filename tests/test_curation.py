"""Composed corpus curation (operators/curation.py, round 3)."""


def test_curate_corpus_three_gates(spark):
    from palladian_spark.operators.curation import curate_corpus
    base = ("the quick brown fox jumps over a lazy dog and runs far "
            "of the hill into town with great speed and joy today")
    docs = [
        (1, base),                       # survives
        (2, base),                       # exact dup of 1 → dropped
        (3, base + " extra"),            # near-dup of 1 → clustered out
        (4, "!!!! ???? %%%% &&&& ####"), # all non-alpha → quality 0
        (5, "completely different words about ships and harbors in the "
            "old port city where the sailors of the fleet gather often"),
    ]
    got = {r["doc_id"] for r in curate_corpus(
        spark.createDataFrame(docs, "doc_id long, text string"),
        min_quality=0.2, near_dup_threshold=0.2).collect()}
    assert 1 in got          # representative of its cluster (min id)
    assert 2 not in got      # exact duplicate
    assert 4 not in got      # failed quality gate
    assert 5 in got          # unique and clean
    # doc 3: near-dup of doc 1 → same component, non-representative
    assert 3 not in got


def test_curate_corpus_full_every_gate_fires(spark):
    from palladian_spark.operators.curation import curate_corpus_full
    base = ("the quick brown fox jumps over a lazy dog and runs far "
            "of the hill into town with great speed and joy today")
    docs = [
        (1, base),                        # survives
        (2, base),                        # exact dup of 1 → dropped
        (3, base + " extra"),             # near-dup of 1 → clustered out
        (4, "!!!! ???? %%%% &&&& ####"),  # quality gate
        (5, "completely different words about ships and harbors in the "
            "old port city where the sailors of the fleet gather often"),
        (6, "spam spam spam spam spam spam spam spam of the and a"),
        # PII-only difference from doc 1: scrub runs BEFORE dedup, so
        # after redaction doc 7 == doc 1 → exact dup, dropped
        (7, base.replace("today", "a.b@ex.com")),
        (8, base.replace("today", "x.y@other.net")),
    ]
    got = {r["doc_id"]: r.asDict() for r in curate_corpus_full(
        spark.createDataFrame(docs, "doc_id long, text string"),
        min_quality=0.2, near_dup_threshold=0.2,
        max_top_token_frac=0.3).collect()}
    assert 1 in got and 5 in got
    assert 2 not in got and 3 not in got and 4 not in got
    # doc 6: top token 'spam' 8/12 > 0.3 → repetition gate
    assert 6 not in got
    # docs 7 and 8 redact to the SAME text ("... <EMAIL>"): near-dup of
    # the base sentence family and exact dups of each other — both must
    # resolve into doc 1's cluster and be dropped
    assert 7 not in got and 8 not in got
    assert got[1]["top_token_frac"] <= 0.3


def test_curation_report_funnel_accounts_for_every_doc(spark):
    from palladian_spark.operators.curation import (curate_corpus_full,
                                                    curation_report)
    base = ("the quick brown fox jumps over a lazy dog and runs far "
            "of the hill into town with great speed and joy today")
    rows = [
        (1, base, "en"),
        (2, base, "en"),                         # exact dup
        (3, base + " extra", "en"),              # near dup
        (4, "!!!! ???? %%%% &&&& ####", "de"),   # quality fail
        (5, "completely different words about ships and harbors in the "
            "old port city where the sailors of the fleet gather often",
         "de"),
        (6, "spam spam spam spam spam spam spam spam of the and a",
         "de"),                                  # repetition fail
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")
    rep = {r["lang"]: r.asDict() for r in curation_report(
        docs, min_quality=0.2, near_dup_threshold=0.2,
        max_top_token_frac=0.3).collect()}
    assert rep["en"]["n_docs"] == 3
    assert rep["en"]["n_exact_dup"] == 1
    assert rep["en"]["n_near_dup"] == 1
    assert rep["en"]["n_kept"] == 1
    assert rep["de"]["n_quality_fail"] == 1
    assert rep["de"]["n_repetition_fail"] == 1
    assert rep["de"]["n_kept"] == 1
    for r in rep.values():
        assert (r["n_quality_fail"] + r["n_repetition_fail"]
                + r["n_exact_dup"] + r["n_near_dup"]
                + r["n_kept"]) == r["n_docs"]
    # the report's kept count equals the pipeline's survivor count
    kept = curate_corpus_full(
        docs.select("doc_id", "text"), min_quality=0.2,
        near_dup_threshold=0.2, max_top_token_frac=0.3).count()
    assert kept == sum(r["n_kept"] for r in rep.values())
