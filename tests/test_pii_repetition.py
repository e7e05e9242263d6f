"""Round-4 curation signals: Gopher-style intra-document repetition
fractions (text_quality.repetition_scores) and PII scrubbing
(pii.scrub_pii)."""

from pyspark.sql import functions as F

from palladian_spark.operators.pii import scrub_pii
from palladian_spark.operators.text_quality import repetition_scores


def _rep(spark, rows):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in repetition_scores(d).collect()}


def test_repetition_hand_computed(spark):
    got = _rep(spark, [(1, "a a b"), (2, "x"), (3, "x y x y x")])
    assert got[1] == {"doc_id": 1, "n_tokens": 3,
                      "dup_token_frac": 0.333333,
                      "top_token_frac": 0.666667, "top_bigram_frac": 0.5}
    # single-token doc: no bigrams → frac 0, not null
    assert got[2]["top_bigram_frac"] == 0.0
    # "x y" twice out of 4 bigrams
    assert got[3] == {"doc_id": 3, "n_tokens": 5, "dup_token_frac": 0.6,
                      "top_token_frac": 0.6, "top_bigram_frac": 0.5}


def test_repetition_all_distinct_is_zero(spark):
    got = _rep(spark, [(1, "one two three four")])
    assert got[1]["dup_token_frac"] == 0.0
    assert got[1]["top_token_frac"] == 0.25
    assert got[1]["top_bigram_frac"] == 0.333333


def test_repetition_degenerate_spam_doc(spark):
    # the filter target: one token repeated — every fraction saturates
    got = _rep(spark, [(1, "buy buy buy buy")])
    assert got[1] == {"doc_id": 1, "n_tokens": 4, "dup_token_frac": 0.75,
                      "top_token_frac": 1.0, "top_bigram_frac": 1.0}


def test_corpus_stats_hand_computed(spark):
    from palladian_spark.operators.text_quality import corpus_stats
    rows = [(1, "a", "en"), (2, "a b", "en"), (3, "a b c", "en"),
            (4, "a b c d", "en"), (5, "x y z", "de")]
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                                    "lang string")
    got = {r["lang"]: r.asDict() for r in corpus_stats(d).collect()}
    en = got["en"]
    # token counts 1,2,3,4: p25 = 1.75, p50 = 2.5, p75 = 3.25,
    # p95 = 3.85 (linear interpolation), mean 2.5, max 4
    assert en["n_docs"] == 4
    assert en["p25_tokens"] == 1.75
    assert en["p50_tokens"] == 2.5
    assert en["p75_tokens"] == 3.25
    assert en["p95_tokens"] == 3.85
    assert en["mean_tokens"] == 2.5
    assert en["max_tokens"] == 4
    de = got["de"]
    assert (de["n_docs"], de["p50_tokens"], de["max_tokens"]) == (1, 3.0, 3)


def test_quality_outliers_flags_the_deviant(spark):
    from palladian_spark.operators.text_quality import quality_outliers
    normal = ["the ships sail out of the harbor with the morning tide",
              "a quiet town sits of the river and the old stone bridge",
              "the birds fly over and the fields turn gold in autumn",
              "a long road runs of the coast and the cliffs of chalk"]
    rows = [(i, t, "en") for i, t in enumerate(normal)] + \
           [(99, "!!!! #### %%%% ????", "en")]
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                                    "lang string")
    got = {r["doc_id"]: r.asDict() for r in quality_outliers(d).collect()}
    # the junk doc is far below the group mean → strongly negative z
    assert got[99]["z_score"] < -1.5
    assert got[99]["is_outlier"] == (abs(got[99]["z_score"]) > 2.0)
    assert all(abs(got[i]["z_score"]) < 1.5 for i in range(4))


def test_quality_outliers_zero_variance_group(spark):
    from palladian_spark.operators.text_quality import quality_outliers
    rows = [(1, "same text of a", "de"), (2, "same text of a", "de")]
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                                    "lang string")
    got = {r["doc_id"]: r["z_score"] for r in quality_outliers(d).collect()}
    assert got == {1: 0.0, 2: 0.0}


def _scrub(spark, rows):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in scrub_pii(d).collect()}


def test_scrub_golden(spark):
    got = _scrub(spark, [
        (1, "mail a.b@ex.com or 12-345-678-90 from 10.0.0.1"),
        (2, "clean text"),
    ])
    assert got[1] == {"doc_id": 1, "n_emails": 1, "n_ips": 1,
                      "n_phones": 1,
                      "redacted": "mail <EMAIL> or <PHONE> from <IP>"}
    assert got[2]["redacted"] == "clean text"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) \
        == (0, 0, 0)


def test_scrub_phone_does_not_eat_ips(spark):
    # the phone class has no dot: a dotted IPv4 must redact as <IP>,
    # and its short digit runs must not count as phones
    got = _scrub(spark, [(1, "ip 192.168.1.1 only")])
    assert got[1]["n_phones"] == 0
    assert got[1]["n_ips"] == 1
    assert got[1]["redacted"] == "ip <IP> only"


def test_scrub_idempotent(spark):
    rows = [(1, "a.b@ex.com 10.0.0.1 +49-171-123-4567"),
            (2, "nothing here"), (3, "x@y.io x@y.io")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    once = scrub_pii(d)
    twice = scrub_pii(
        once.select("doc_id", F.col("redacted").alias("text")))
    a = sorted(r["redacted"] for r in once.collect())
    b = sorted(r["redacted"] for r in twice.collect())
    assert a == b
    # and the second pass sees nothing to count
    assert all(r["n_emails"] == r["n_ips"] == r["n_phones"] == 0
               for r in twice.collect())


def test_scrub_multiple_matches_all_replaced(spark):
    got = _scrub(spark, [(1, "x@y.io then z@w.io")])
    assert got[1]["n_emails"] == 2
    assert got[1]["redacted"] == "<EMAIL> then <EMAIL>"
