"""PII scrubbing for training-data pipelines: detect and redact emails,
phone numbers and IPv4 addresses before a corpus ships to training.

Pure-Catalyst (regexp_extract_all / regexp_replace — whole-stage
codegen, no Python), with patterns kept in the common subset of Java
regex and RE2 (no backreferences, no lookaround, non-capturing groups
only) so a DuckDB oracle replays them byte-for-byte.  The reference has
no PII module (its StringTagger/UrlTagger stop at URLs —
palladian-core .../helper/UrlHelper.java); this is the pipeline-side
extension, reusing the same tag-by-regex shape as
textproc/taggers.py.

Redaction order is fixed (email → IPv4 → phone) and counts are taken on
the ORIGINAL text, so scrub is idempotent and the counts are
independent of redaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Java-regex ∩ RE2 patterns (ASCII classes, non-capturing groups).
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_PATTERN = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
# leading digit, 7+ inner digits/dashes, trailing digit — matches
# dash-grouped international formats without eating dotted IPs
PHONE_PATTERN = "\\+?[0-9][0-9-]{7,}[0-9]"

_RULES = [("email", EMAIL_PATTERN, "<EMAIL>"),
          ("ip", IPV4_PATTERN, "<IP>"),
          ("phone", PHONE_PATTERN, "<PHONE>")]


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, n_emails, n_ips, n_phones, redacted) — per-document PII
    counts plus the text with every match replaced by its placeholder,
    applied in the fixed email → IPv4 → phone order."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("int").alias(f"n_{name}s")
        for name, pat, _ in _RULES]
    red = F.col(text_col)
    for _, pat, placeholder in _RULES:
        red = F.regexp_replace(red, pat, placeholder)
    return docs.select(id_col, *counts, red.alias("redacted"))
