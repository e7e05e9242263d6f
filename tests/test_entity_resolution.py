"""Blocked ER matcher + clustering (operators/entity_resolution).

Checks the composite scores against the pure-Python similarity toolkit
(the golden-tested LevenshteinSimilarity / CharacterNGramSimilarity
twins), the soundness of the length-band prune (blocked-pair results ==
brute force within blocks), and the cluster/canonical-id semantics
including singletons.
"""

import pytest

from palladian_spark.operators.entity_resolution import (
    blocked_match_pairs, resolve_entities,
)
from palladian_spark.textproc.similarity import (
    char_ngram_similarity, levenshtein_similarity,
)

RECORDS = [
    (1, "Acme Corporation"),
    (2, "acme  corporation"),      # whitespace + case → exact after norm
    (3, "Acme Corp"),              # near-dup, same block
    (4, "Acme Holdings"),          # same block, weaker match
    (5, "Globex Inc"),             # singleton block
    (6, "Zeta Systems"),
    (7, "Zeta Systms"),            # typo near-dup
]


def _norm(s: str) -> str:
    return " ".join(s.split()).lower()


def _expected_pairs(threshold: float):
    """Brute-force within first-token blocks with the Python toolkit."""
    out = {}
    for i, (a_id, a_name) in enumerate(RECORDS):
        for b_id, b_name in RECORDS[i + 1:]:
            a, b = _norm(a_name), _norm(b_name)
            if a.split(" ")[0] != b.split(" ")[0]:
                continue
            lev = levenshtein_similarity(a, b)
            dice = 1.0 if a == b else char_ngram_similarity(a, b, 3, "dice")
            score = round(0.5 * lev + 0.5 * dice, 6)
            if score >= threshold:
                lo, hi = min(a_id, b_id), max(a_id, b_id)
                out[(lo, hi)] = score
    return out


@pytest.fixture(scope="module")
def records_df(spark):
    return spark.createDataFrame(RECORDS, "rec_id int, name string")


def test_match_pairs_against_python_toolkit(spark, records_df):
    got = {(r["a_id"], r["b_id"]): r["score"]
           for r in blocked_match_pairs(records_df, threshold=0.5).collect()}
    want = _expected_pairs(0.5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    # exact-after-normalization pair scores 1.0
    assert got[(1, 2)] == pytest.approx(1.0)


def test_band_prune_is_sound(spark, records_df):
    """The length band never removes a pair the exact filter keeps: the
    thresholded result equals brute force at every tested threshold."""
    for thr in (0.3, 0.5, 0.7, 0.9):
        got = {(r["a_id"], r["b_id"])
               for r in blocked_match_pairs(records_df,
                                            threshold=thr).collect()}
        assert got == set(_expected_pairs(thr))


def test_resolve_entities_clusters_and_singletons(spark, records_df):
    rows = {r["rec_id"]: (r["canonical_id"], r["cluster_size"])
            for r in resolve_entities(records_df, threshold=0.5).collect()}
    assert len(rows) == len(RECORDS)          # one row per record
    # {1,2,3} cluster via Acme block matches ≥ 0.5; "Acme Holdings"
    # shares the block but scores below threshold → its own cluster
    assert rows[1] == (1, 3)
    assert rows[2] == (1, 3)
    assert rows[3] == (1, 3)
    assert rows[4] == (4, 1)
    # Globex is a singleton: canonicalizes to itself, size 1
    assert rows[5] == (5, 1)
    # Zeta typo pair clusters together
    assert rows[6] == (6, 2)
    assert rows[7] == (6, 2)


def test_block_col_refines_blocking(spark):
    df = spark.createDataFrame(
        [(1, "Acme Corp", "US"), (2, "Acme Corp", "DE")],
        "rec_id int, name string, country string")
    # same name but different refined block → no candidate pair
    assert blocked_match_pairs(df, block_col="country",
                               threshold=0.5).count() == 0
    assert blocked_match_pairs(df, threshold=0.5).count() == 1


def test_distinct_name_collapse_equals_record_level_bruteforce(spark):
    """The name-inventory collapse (exact tier + fuzzy-tier expansion)
    must equal naive record-level pairing: random duplicate-heavy
    records, every threshold."""
    import random
    rng = random.Random(11)
    base = ["Acme Corp", "Acme Corporation", "Acme  corp", "Globex Inc",
            "Globex Incorporated", "Zeta Systems", "Zeta Systms",
            "Initech LLC"]
    recs = [(i, rng.choice(base)) for i in range(1, 41)]
    df = spark.createDataFrame(recs, "rec_id int, name string")

    def brute(threshold):
        out = set()
        for i, (a_id, a_name) in enumerate(recs):
            for b_id, b_name in recs[i + 1:]:
                a, b = _norm(a_name), _norm(b_name)
                if a.split(" ")[0] != b.split(" ")[0]:
                    continue
                lev = levenshtein_similarity(a, b)
                dice = (1.0 if a == b
                        else char_ngram_similarity(a, b, 3, "dice"))
                if round(0.5 * lev + 0.5 * dice, 6) >= threshold:
                    out.add((min(a_id, b_id), max(a_id, b_id)))
        return out

    for thr in (0.5, 0.8, 1.0):
        got = {(r["a_id"], r["b_id"])
               for r in blocked_match_pairs(df, threshold=thr).collect()}
        assert got == brute(thr), f"threshold {thr}"

    # clusters: canonical = min rec_id reachable, sizes partition the set
    rows = resolve_entities(df, threshold=0.5).collect()
    assert len(rows) == len(recs)
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canonical_id"], []).append(r)
    for canon, members in by_canon.items():
        assert min(m["rec_id"] for m in members) == canon
        assert all(m["cluster_size"] == len(members) for m in members)


def test_stable_canonical_ids_inherit_birth_split(spark):
    from palladian_spark.operators.entity_resolution import (
        stable_canonical_ids)
    # old run: cluster o1 = {r1, r2, r3}; cluster o9 = {r9}
    old = spark.createDataFrame(
        [("r1", "o1"), ("r2", "o1"), ("r3", "o1"), ("r9", "o9")],
        ["rec_id", "canonical_id"])
    # new run: o1 SPLIT into n1 = {r1, r2, r4} and n2 = {r3, r5};
    # n9 continues o9; n7 = {r7} is a birth
    new = spark.createDataFrame(
        [("r1", "n1"), ("r2", "n1"), ("r4", "n1"),
         ("r3", "n2"), ("r5", "n2"),
         ("r9", "n9"), ("r7", "n7")],
        ["rec_id", "canonical_id"])
    out = {r["canonical_id"]: (r["stable_id"], r["n_members"],
                               r["n_inherited"])
           for r in stable_canonical_ids(old, new).collect()}
    assert out["n1"] == ("o1", 3, 2)   # larger-overlap side keeps o1
    assert out["n2"] == ("n2", 2, 0)   # split loser mints its own id
    assert out["n9"] == ("o9", 1, 1)   # 1:1 continuation
    assert out["n7"] == ("n7", 1, 0)   # birth


def test_stable_canonical_ids_tiebreaks(spark):
    from palladian_spark.operators.entity_resolution import (
        stable_canonical_ids)
    old = spark.createDataFrame(
        [("r1", "oA"), ("r2", "oB")], ["rec_id", "canonical_id"])
    # one new cluster overlaps oA and oB equally → smallest old id wins
    new = spark.createDataFrame(
        [("r1", "n1"), ("r2", "n1")], ["rec_id", "canonical_id"])
    [row] = stable_canonical_ids(old, new).collect()
    assert row["stable_id"] == "oA" and row["n_inherited"] == 1


# --- hot-block salting ------------------------------------------------

def _hot_block_records():
    """One pathologically hot first-token block ('hot ...' × 120 distinct
    names, many near-dup neighbours) plus exact-dup records and two cold
    blocks — the 'The …'/'New …' surface-inventory shape at web scale."""
    rows = []
    rid = 0
    for i in range(120):
        rid += 1
        rows.append((rid, f"hot widget {i:03d}"))
    # exact duplicates (whitespace/case variants) inside the hot block
    rows += [(901, "Hot  Widget 000"), (902, "HOT WIDGET 001")]
    rows += [(950, "Globex Inc"), (951, "Globex Incorporated"),
             (960, "Zeta Systems")]
    return rows


def test_hot_block_salting_matches_unsalted(spark):
    df = spark.createDataFrame(_hot_block_records(),
                               "rec_id int, name string")
    plain = blocked_match_pairs(df, threshold=0.6,
                                max_block_names=10**9).collect()
    salted = blocked_match_pairs(df, threshold=0.6,
                                 max_block_names=16).collect()
    key = lambda r: (r["a_id"], r["b_id"])
    # exactly-once pair emission (no dupes from sub-group overlap) ...
    assert len(salted) == len({key(r) for r in salted})
    assert len(plain) == len({key(r) for r in plain})
    # ... and identical pair/score sets vs the single-group join
    as_set = lambda rows: {(r["a_id"], r["b_id"], r["lev_sim"],
                            r["dice_sim"], r["score"]) for r in rows}
    assert as_set(salted) == as_set(plain)
    # the hot block really engaged salting: 122 distinct names / cap 16
    # → 8 sub-buckets → pairs must exist across sub-bucket boundaries
    assert len(salted) > 100


def test_hot_block_salting_cap_one_extreme(spark):
    df = spark.createDataFrame(_hot_block_records()[:40],
                               "rec_id int, name string")
    plain = blocked_match_pairs(df, threshold=0.6,
                                max_block_names=10**9).collect()
    salted = blocked_match_pairs(df, threshold=0.6,
                                 max_block_names=1).collect()
    as_set = lambda rows: {(r["a_id"], r["b_id"], r["score"])
                           for r in rows}
    assert as_set(salted) == as_set(plain)


def test_resolve_entities_salted_equals_unsalted(spark):
    df = spark.createDataFrame(_hot_block_records(),
                               "rec_id int, name string")
    plain = {(r["rec_id"], r["canonical_id"], r["cluster_size"])
             for r in resolve_entities(df, threshold=0.7,
                                       max_block_names=10**9).collect()}
    salted = {(r["rec_id"], r["canonical_id"], r["cluster_size"])
              for r in resolve_entities(df, threshold=0.7,
                                        max_block_names=8).collect()}
    assert salted == plain
