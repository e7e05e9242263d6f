"""int8 embedding quantization (operators/embeddings.py, round 3)."""

import numpy as np


def _emb(spark, n=60, dim=8, seed=4):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(dim) * (i + 1)])
            for i in range(n)]
    rows.append((n, [0.0] * dim))  # all-zero vector edge case
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_quantize_roundtrip_error_bound(spark):
    from palladian_spark.operators.embeddings import (
        dequantize_embeddings, quantization_error, quantize_embeddings)
    rows, emb = _emb(spark)
    q = quantize_embeddings(emb)
    got = {r["vec_id"]: (r["scale"], r["qvec"]) for r in q.collect()}
    assert len(got) == len(rows)
    for vid, vec in rows:
        scale, qvec = got[vid]
        assert all(-127 <= x <= 127 for x in qvec)
        if any(vec):
            assert max(abs(v) for v in vec) / 127.0 == scale
            # reconstruction error ≤ scale/2 per component
            assert all(abs(qi * scale - vi) <= scale / 2 + 1e-12
                       for qi, vi in zip(qvec, vec))
        else:
            assert scale == 1.0 and all(x == 0 for x in qvec)
    # dequantize agrees with q*scale
    deq = {r["vec_id"]: r["embedding"]
           for r in dequantize_embeddings(q).collect()}
    for vid, (scale, qvec) in got.items():
        assert deq[vid] == [qi * scale for qi in qvec]
    # corpus-wide bound via the error operator
    errs = quantization_error(emb).collect()
    assert all(r["max_abs_err"] <= r["scale"] / 2 + 1e-12 for r in errs)


def test_quantize_half_up_rounding(spark):
    # x/scale landing exactly on .5 must round toward +inf in BOTH
    # engines — the contract that makes the oracle exact
    from palladian_spark.operators.embeddings import quantize_embeddings
    # scale = 127/127 = 1.0; components ±2.5 quantize to 3 / -2
    emb = spark.createDataFrame(
        [(0, [127.0, 2.5, -2.5, 0.5, -0.5])],
        "vec_id long, embedding array<double>")
    r = quantize_embeddings(emb).collect()[0]
    assert r["scale"] == 1.0
    assert r["qvec"] == [127, 3, -2, 1, 0]
