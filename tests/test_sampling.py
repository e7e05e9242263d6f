"""Deterministic hash-gated sampling (operators/sampling.py, round 3)."""


def _docs(spark, n=2000):
    rows = [(i, "en" if i % 3 else "de") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_sample_rate_and_determinism(spark):
    from palladian_spark.operators.sampling import deterministic_sample
    d = _docs(spark)
    s10 = {r["doc_id"] for r in deterministic_sample(d, 0.10).collect()}
    again = {r["doc_id"] for r in
             deterministic_sample(d.repartition(17), 0.10).collect()}
    assert s10 == again                      # partitioning-invariant
    assert 0.06 < len(s10) / 2000 < 0.14     # ~rate


def test_sample_nesting_property(spark):
    # the 10% sample must CONTAIN the 5% sample — the prefix property
    # scaling-law ladders depend on
    from palladian_spark.operators.sampling import deterministic_sample
    d = _docs(spark)
    s05 = {r["doc_id"] for r in deterministic_sample(d, 0.05).collect()}
    s10 = {r["doc_id"] for r in deterministic_sample(d, 0.10).collect()}
    assert s05 <= s10 and len(s05) < len(s10)


def test_stratified_rates(spark):
    from palladian_spark.operators.sampling import stratified_sample
    d = _docs(spark)
    got = stratified_sample(d, {"de": 0.5}, default_rate=0.05).collect()
    by = {"de": 0, "en": 0}
    for r in got:
        by[r["lang"]] += 1
    n_de = 2000 // 3 + (1 if 2000 % 3 else 0)
    assert 0.35 < by["de"] / n_de < 0.65
    assert 0.02 < by["en"] / (2000 - n_de) < 0.09
