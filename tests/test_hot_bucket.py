"""Hot-bucket hardening for the approximate ANN paths (round-3 contract,
VERDICT.md "What's wrong #2"): a duplicate mega-cluster lands in ONE
bucket of every LSH table / one IVF posting list, and without salted
splitting a single applyInPandas task would materialize the whole group.
These tests pin (a) the salt-split paths return EXACTLY what the
unsplit paths return, (b) the in-task guard actually bounds group
payloads, and (c) a hot-cluster job completes with a cap far below the
cluster size.
"""

import numpy as np
import pandas as pd
import pytest


def _hot_cluster_emb(spark, n=4000, dup_frac=0.5, dim=16, seed=3):
    """dup_frac of the table is ONE duplicate vector (the worst case for
    bucketed search: correlated rows that all hash together)."""
    rng = np.random.RandomState(seed)
    n_dup = int(n * dup_frac)
    dup = rng.randn(dim)
    rows = [(i, [float(x) for x in dup]) for i in range(n_dup)]
    rows += [(n_dup + i, [float(x) for x in rng.randn(dim)])
             for i in range(n - n_dup)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def _sorted(df):
    return sorted((r["a_id"], r["b_id"], r["cos_sim"]) for r in df.collect())


def test_lsh_salt_split_matches_unsplit(spark):
    from palladian_spark.operators.similarity_search import lsh_bucketed_top_k
    _, emb = _hot_cluster_emb(spark, n=1200, dup_frac=0.5)
    base = _sorted(lsh_bucketed_top_k(emb, k=1, n_planes=4, n_tables=2,
                                      max_bucket_rows=None))
    # cap of 64 forces the 600-row duplicate bucket into ≥10 sub-splits
    split = _sorted(lsh_bucketed_top_k(emb, k=1, n_planes=4, n_tables=2,
                                       max_bucket_rows=64))
    assert split == base
    # every duplicate-cluster member's top-1 is another duplicate (cos 1.0)
    top = {a: s for a, _, s in split}
    assert all(top[i] == 1.0 for i in range(600))


def test_lsh_pairs_salt_split_matches_unsplit(spark):
    from palladian_spark.operators.similarity_search import lsh_bucketed_pairs
    _, emb = _hot_cluster_emb(spark, n=400, dup_frac=0.3)
    base = _sorted(lsh_bucketed_pairs(emb, threshold=0.999, n_planes=3,
                                      n_tables=2, max_bucket_rows=None))
    split = _sorted(lsh_bucketed_pairs(emb, threshold=0.999, n_planes=3,
                                       n_tables=2, max_bucket_rows=32))
    assert split == base
    # all 120·119/2 duplicate pairs present exactly once
    n_dup = 120
    assert len([1 for a, b, s in split
                if a < n_dup and b < n_dup]) == n_dup * (n_dup - 1) // 2


def test_ivf_salt_split_matches_unsplit(spark):
    from palladian_spark.operators.similarity_search import ivf_top_k
    _, emb = _hot_cluster_emb(spark, n=900, dup_frac=0.4, seed=9)
    base = _sorted(ivf_top_k(emb, k=1, n_probe=2, quantizer="sample",
                             max_bucket_rows=None))
    split = _sorted(ivf_top_k(emb, k=1, n_probe=2, quantizer="sample",
                              max_bucket_rows=48))
    assert split == base


def test_group_guard_raises_on_oversized_group():
    """The guard is the enforcement mechanism the Spark tests rely on:
    if salting ever failed to bound a group, the task dies loudly naming
    the knob instead of OOMing the executor."""
    from palladian_spark.operators.similarity_search import (
        _ROLE_BOTH, _group_sides)
    cap = 8
    n_big = 4 * cap + 65  # just over the guard's 4·cap + 64 slack
    big = pd.DataFrame({
        "role": np.full(n_big, _ROLE_BOTH, dtype=np.int32),
        "id": np.arange(n_big, dtype=np.int64)})
    with pytest.raises(RuntimeError, match="max_bucket_rows"):
        _group_sides(big, cap)
    ok = big.head(4 * cap)
    members, queries = _group_sides(ok, cap)
    assert len(members) == len(queries) == 4 * cap


def test_emit_salted_covers_every_pair_once():
    """Property: after splitting, every (query, member) ordered pair of a
    bucket meets in EXACTLY one (m_sub, q_sub) sub-group — the invariant
    the union-of-partials correctness argument rests on."""
    from palladian_spark.operators.similarity_search import (
        _ROLE_BOTH, _ROLE_MEMBER, _ROLE_QUERY, _emit_salted)
    n = 97
    ids = np.arange(n, dtype=np.int64)
    base = pd.DataFrame({"bucket": np.zeros(n, dtype=np.int64),
                         "id": ids, "vec": [[0.0]] * n})
    splits = np.full(n, 7, dtype=np.int64)
    frames = pd.concat(_emit_salted(base, splits, ids, None),
                       ignore_index=True)
    seen = {}
    for (m_sub, q_sub), g in frames.groupby(["m_sub", "q_sub"]):
        members = g[g["role"].isin([_ROLE_MEMBER, _ROLE_BOTH])]["id"]
        queries = g[g["role"].isin([_ROLE_QUERY, _ROLE_BOTH])]["id"]
        assert len(members) <= 2 * (n // 7 + 1)
        for q in queries:
            for m in members:
                key = (int(q), int(m))
                assert key not in seen, f"pair {key} met twice"
                seen[key] = (m_sub, q_sub)
    assert len(seen) == n * n
