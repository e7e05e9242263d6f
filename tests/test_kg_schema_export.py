"""Schema induction and N-Triples export over the constructed KG."""

from palladian_spark.operators.kg_fusion import (
    export_ntriples, schema_induction)


def test_schema_induction_types_and_fracs(spark):
    t = spark.createDataFrame(
        [("Customer C1", "works_for", "Supplier S1"),
         ("Customer C2", "works_for", "Supplier S2"),
         ("Customer C3", "works_for", "Nation N1"),  # noisy range
         ("Supplier S1", "located_in", "Nation N1")],
        ["subj", "pred", "obj"])
    rows = {(r["pred"], r["subj_type"], r["obj_type"]): r
            for r in schema_induction(t).collect()}
    wf = rows[("works_for", "Customer", "Supplier")]
    assert wf["n_edges"] == 2 and abs(wf["frac"] - 2 / 3) < 1e-12
    noisy = rows[("works_for", "Customer", "Nation")]
    assert noisy["n_edges"] == 1 and abs(noisy["frac"] - 1 / 3) < 1e-12
    assert rows[("located_in", "Supplier", "Nation")]["frac"] == 1.0


def test_export_ntriples_minting_and_distinct(spark):
    t = spark.createDataFrame(
        [("Customer C1", "works_for", "Supplier S1"),
         ("Customer C1", "works_for", "Supplier S1")],
        ["subj", "pred", "obj"])
    lines = [r["ntriple"] for r in export_ntriples(t).collect()]
    assert lines == ["<urn:ent:Customer_C1> <urn:rel:works_for> "
                     "<urn:ent:Supplier_S1> ."]
