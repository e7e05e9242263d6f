"""SHACL-lite triple validation: majority domain/range + functional."""

from palladian_spark.operators.kg_fusion import validate_triples


def test_domain_range_and_functional_flags(spark):
    t = spark.createDataFrame(
        # works_for: majority (Customer → Supplier); one range violation
        [("Customer C1", "works_for", "Supplier S1"),
         ("Customer C2", "works_for", "Supplier S2"),
         ("Customer C3", "works_for", "Nation N1"),
         # located_in is functional here (one nation per supplier)
         # except S9, which asserts two → both rows flagged
         ("Supplier S1", "located_in", "Nation N1"),
         ("Supplier S9", "located_in", "Nation N1"),
         ("Supplier S9", "located_in", "Nation N2")],
        ["subj", "pred", "obj"])
    rows = {(r["subj"], r["pred"], r["obj"]):
            (r["domain_ok"], r["range_ok"], r["functional_ok"])
            for r in validate_triples(t).collect()}
    assert rows[("Customer C1", "works_for", "Supplier S1")] \
        == (True, True, True)
    assert rows[("Customer C3", "works_for", "Nation N1")] \
        == (True, False, True)   # range violation only
    assert rows[("Supplier S1", "located_in", "Nation N1")] \
        == (True, True, True)
    assert rows[("Supplier S9", "located_in", "Nation N1")][2] is False
    assert rows[("Supplier S9", "located_in", "Nation N2")][2] is False
    assert len(rows) == 6


def test_non_functional_predicate_never_flagged(spark):
    # fan-out predicate: tph = 3 > 1.5 → functional check off
    t = spark.createDataFrame(
        [("Customer C1", "likes", "Supplier S%d" % i) for i in range(3)],
        ["subj", "pred", "obj"])
    rows = validate_triples(t).collect()
    assert all(r["functional_ok"] for r in rows)
