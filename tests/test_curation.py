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
