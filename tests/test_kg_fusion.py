"""KG fusion: inference, cardinality, truth finding, encoding,
Bernoulli negatives."""

from palladian_spark.operators.kg_fusion import (
    bernoulli_negative_samples, encode_triples, infer_triples,
    relation_cardinality, resolve_facts)


def test_infer_composition_and_anti_join(spark):
    t = spark.createDataFrame(
        [("c1", "works_for", "s1"), ("c2", "works_for", "s1"),
         ("s1", "located_in", "n1"), ("s2", "located_in", "n2"),
         # already-asserted derived fact — must NOT be re-emitted
         ("c1", "based_in", "n1")],
        ["subj", "pred", "obj"])
    out = {(r["subj"], r["pred"], r["obj"], r["rule"])
           for r in infer_triples(t).collect()}
    assert out == {("c2", "based_in", "n1", "works_for.located_in")}


def test_relation_cardinality_classes(spark):
    t = spark.createDataFrame(
        # one_one: 2 edges, 2 subj, 2 obj → tph=hpt=1
        [("a", "one_one", "x"), ("b", "one_one", "y"),
         # one_n: 1 subj fans to 4 objs → tph=4, hpt=1
         ("h", "one_n", "t1"), ("h", "one_n", "t2"),
         ("h", "one_n", "t3"), ("h", "one_n", "t4"),
         # n_one: 4 subjs into 1 obj → tph=1, hpt=4
         ("p", "n_one", "z"), ("q", "n_one", "z"),
         ("r", "n_one", "z"), ("s", "n_one", "z")],
        ["subj", "pred", "obj"])
    rows = {r["pred"]: r for r in relation_cardinality(t).collect()}
    assert rows["one_one"]["category"] == "1-1"
    assert rows["one_n"]["category"] == "1-N"
    assert rows["one_n"]["tph"] == 4.0 and rows["one_n"]["hpt"] == 1.0
    assert rows["n_one"]["category"] == "N-1"
    assert rows["n_one"]["n_edges"] == 4 and rows["n_one"]["n_subj"] == 4


def test_resolve_facts_majority_and_ties(spark):
    # a-p: obj1 seen 3×, obj2 seen 1× → obj1 wins with 2 alternatives.
    # b-p: tie 1× each → lexicographic winner "m".
    obs = [("a", "p", "o1")] * 3 + [("a", "p", "o2"),
                                    ("b", "p", "m"), ("b", "p", "n")]
    t = spark.createDataFrame(obs, ["subj", "pred", "obj"])
    rows = {(r["subj"], r["pred"]): r for r in resolve_facts(t).collect()}
    a = rows[("a", "p")]
    assert (a["obj"], a["evidence"], a["n_alternatives"],
            a["total_evidence"]) == ("o1", 3, 2, 4)
    assert rows[("b", "p")]["obj"] == "m"


def test_encode_triples_dense_and_joinable(spark):
    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("a", "p", "b")],
        ["subj", "pred", "obj"])
    enc = {(r["s_idx"], r["p_idx"], r["o_idx"])
           for r in encode_triples(t).collect()}
    # vocab sorted: a=0 b=1 c=2; preds sorted: p=0 q=1
    assert enc == {(0, 0, 1), (1, 1, 2)}


def test_bernoulli_negatives_filtered_one_side(spark):
    rows = ([(f"h", "fan", f"t{i}") for i in range(40)]
            + [(f"s{i}", "covered", "z") for i in range(40)])
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out1 = bernoulli_negative_samples(t, n_neg=2).collect()
    out2 = bernoulli_negative_samples(t.repartition(5), n_neg=2).collect()
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["k"],
                     r["side"], r["neg_subj"], r["neg_obj"])
    assert sorted(map(key, out1)) == sorted(map(key, out2))
    true = {(s, p, o) for s, p, o in rows}
    head = tail = 0
    for r in out1:
        # exactly one side corrupted, consistent with the side label
        if r["side"] == "head":
            assert r["neg_subj"] != r["subj"] and r["neg_obj"] == r["obj"]
            head += 1
        else:
            assert r["neg_obj"] != r["obj"] and r["neg_subj"] == r["subj"]
            tail += 1
        assert (r["neg_subj"], r["pred"], r["neg_obj"]) not in true
    # 'fan' has n_subj=1, n_obj=40 → head-corruption prob 40/41;
    # 'covered' is the mirror → tail-heavy. Both sides must appear.
    assert head > 0 and tail > 0
    fan_heads = [r for r in out1 if r["pred"] == "fan"]
    assert sum(r["side"] == "head" for r in fan_heads) > 0.7 * len(fan_heads)


def test_inverse_relation_candidates(spark):
    from palladian_spark.operators.kg_fusion import (
        inverse_relation_candidates)
    t = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "knows", "a"), ("c", "knows", "d"),
         ("x", "parent_of", "y"), ("y", "child_of", "x"),
         ("p", "parent_of", "q"), ("q", "child_of", "p"),
         ("r", "parent_of", "s")],   # un-reversed parent edge
        ["subj", "pred", "obj"])
    out = {(r["pred"], r["inv_pred"]): r
           for r in inverse_relation_candidates(t, min_overlap=2).collect()}
    # symmetric diagonal: 2 of 3 'knows' edges have their reversal
    d = out[("knows", "knows")]
    assert (d["overlap"], d["n_pred"]) == (2, 3)
    assert abs(d["conf_fwd"] - round(2 / 3, 6)) < 1e-9
    # inverse pair in both directions, with asymmetric confidences
    fwd = out[("parent_of", "child_of")]
    assert (fwd["overlap"], fwd["n_pred"], fwd["n_inv"]) == (2, 3, 2)
    assert abs(fwd["conf_fwd"] - round(2 / 3, 6)) < 1e-9
    assert fwd["conf_bwd"] == 1.0
    bwd = out[("child_of", "parent_of")]
    assert bwd["conf_fwd"] == 1.0
    assert set(out) == {("knows", "knows"), ("parent_of", "child_of"),
                        ("child_of", "parent_of")}


def test_mine_chain_rules_confidence(spark):
    from palladian_spark.operators.kg_fusion import mine_chain_rules
    # parent_of(x,y) ∧ parent_of(y,z) ⇒ grandparent_of(x,z) holds for 2
    # of 3 chain pairs; sibling rule falls below min_support.
    t = spark.createDataFrame(
        [("a", "parent_of", "b"), ("b", "parent_of", "c"),
         ("d", "parent_of", "e"), ("e", "parent_of", "f"),
         ("g", "parent_of", "h"), ("h", "parent_of", "i"),
         ("a", "grandparent_of", "c"), ("d", "grandparent_of", "f"),
         ("x", "sibling_of", "y"), ("y", "sibling_of", "z"),
         ("x", "knows", "z")],
        ["subj", "pred", "obj"])
    out = {(r["body_p"], r["body_q"], r["head_r"]): r
           for r in mine_chain_rules(t, min_support=2).collect()}
    r = out[("parent_of", "parent_of", "grandparent_of")]
    # bodies: (a,c), (d,f), (g,i) + the cross-chain (a..?) none; = 3
    assert (r["n_body"], r["n_match"]) == (3, 2)
    assert abs(r["confidence"] - round(2 / 3, 6)) < 1e-9
    # the 1-match sibling⇒knows rule is below min_support
    assert ("sibling_of", "sibling_of", "knows") not in out


def test_mine_chain_rules_body_cap(spark):
    import pytest
    from palladian_spark.operators.kg_fusion import mine_chain_rules
    t = spark.createDataFrame(
        [(f"s{i}", "p", "hub") for i in range(5)]
        + [("hub", "p", f"o{i}") for i in range(5)],
        ["subj", "pred", "obj"])
    with pytest.raises(ValueError, match="max_body_pairs"):
        mine_chain_rules(t, min_support=1, max_body_pairs=10)


def test_resolve_facts_weighted_fresh_beats_stale(spark):
    from palladian_spark.operators.kg_fusion import resolve_facts_weighted
    # y has more raw evidence but x carries more weight (fresher)
    we = spark.createDataFrame(
        [("a", "p", "x", 10), ("a", "p", "y", 6),
         ("b", "q", "z", 1)],
        ["src", "pred", "dst", "weight"])
    out = {(r["subj"], r["pred"]): r
           for r in resolve_facts_weighted(we).collect()}
    r = out[("a", "p")]
    assert (r["obj"], r["weight"], r["n_alternatives"],
            r["total_weight"]) == ("x", 10, 2, 16)
    assert out[("b", "q")]["obj"] == "z"


def test_resolve_facts_weighted_tiebreak(spark):
    from palladian_spark.operators.kg_fusion import resolve_facts_weighted
    we = spark.createDataFrame(
        [("a", "p", "zz", 5), ("a", "p", "aa", 5)],
        ["src", "pred", "dst", "weight"])
    [r] = resolve_facts_weighted(we).collect()
    assert r["obj"] == "aa"
