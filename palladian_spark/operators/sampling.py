"""Deterministic corpus sampling — hash-gated, not RNG-gated.

`df.sample()` draws from a per-partition RNG: results change with
partitioning, retries, and cluster size — useless for reproducible
training-data builds.  These operators gate each row on an md5-derived
hash of its OWN id (the same engine-portable hash family as the dedup
operators), so a sample is a pure function of the data:

  * deterministic_sample — keep id iff h(id) mod 10^6 < rate·10^6.
    Stable under re-runs, engine-replayable, and composable: a 10%
    sample is a SUPERSET of the 5% sample (the gate is a prefix
    property), which is exactly what you want for scaling-law ladders.
  * stratified_sample — per-stratum rates (e.g. per language) via a
    broadcast rate map; strata absent from the map fall back to a
    default rate.

No shuffle in either: one filter over the scan.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F

_DENOM = 1_000_000


def _gate(id_col: str, salt: str):
    """Uniform value in [0, 10^6) from an md5 of (salt | id) — the
    engine-portable hash family shared with operators/dedup.py."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}|"),
                                          F.col(id_col).cast("string"))),
                           1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(_DENOM))


def deterministic_sample(docs: DataFrame, rate: float,
                         id_col: str = "doc_id",
                         salt: str = "sample") -> DataFrame:
    """Keep ~``rate`` of rows, decided by the row's own id hash."""
    return docs.where(_gate(id_col, salt) < int(rate * _DENOM))


def stratified_sample(docs: DataFrame, rates: Mapping[str, float],
                      stratum_col: str = "lang",
                      default_rate: float = 0.0,
                      id_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling.  ``rates`` maps stratum value
    → keep rate; unlisted strata use ``default_rate``.  The rate lookup
    is a literal CASE chain (model-sized), so the whole op is one
    filter."""
    threshold = F.lit(int(default_rate * _DENOM))
    for value, rate in sorted(rates.items()):
        threshold = F.when(F.col(stratum_col) == value,
                           F.lit(int(rate * _DENOM))).otherwise(threshold)
    return docs.where(_gate(id_col, salt) < threshold)
