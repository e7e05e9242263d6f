"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on transcripts
derived deterministically from the sf0.001 TPC-H parquet; ``queries()`` /
``oracle_sql()`` expose one entry per implemented operator (SURVEY.md §2)
with DuckDB-checkable oracles.

Oracle strategy: transcripts are built from the TPC-H tables with a fixed
text template ('Customer C<ck> works for Supplier S<sk> in Nation N<nk>.'),
so the DuckDB oracle can state the EXPECTED mention spans / triples
analytically from the base tables while the Spark side runs the real regex
tagger, rule chain, classifier, linker and relation patterns.  Operators
whose semantics the oracle can't express in RE2-safe SQL (the StringTagger
regex itself, Jaro-Winkler with the reference's quirks) are golden-tested
in pytest instead (tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _tpch_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from palladian_spark.data.transcripts import tpch_transcripts_df
    return tpch_transcripts_df(spark, sf_dir)


def _tpch_entity_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-entity dictionary derived from the base tables:
    customers → PER-like, suppliers → ORG-like, nations → LOC-like."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c = customer.select(
        F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")).alias("entity_id"),
        F.concat(F.lit("Customer C"), F.col("c_custkey").cast("string")).alias("surface"),
        F.lit("PER").alias("concept"))
    s = supplier.select(
        F.concat(F.lit("supp:"), F.col("s_suppkey").cast("string")).alias("entity_id"),
        F.concat(F.lit("Supplier S"), F.col("s_suppkey").cast("string")).alias("surface"),
        F.lit("ORG").alias("concept"))
    n = nation.select(
        F.concat(F.lit("nat:"), F.col("n_nationkey").cast("string")).alias("entity_id"),
        F.concat(F.lit("Nation N"), F.col("n_nationkey").cast("string")).alias("surface"),
        F.lit("LOC").alias("concept"))
    return c.unionByName(s).unionByName(n)


def _tpch_model(spark: SparkSession, sf_dir: str):
    from palladian_spark.pipeline import model_from_entity_dictionary
    entries = [(r["surface"], r["concept"])
               for r in _tpch_entity_dict(spark, sf_dir).collect()]
    return model_from_entity_dictionary(entries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline (NER chain → linking → relation patterns →
    canonical triples) over sf0.001-derived transcripts."""
    from palladian_spark.relations import extract_triples, canonicalize_triples
    transcripts = _tpch_transcripts(spark, SF_DEFAULT)
    model = _tpch_model(spark, SF_DEFAULT)
    entity_dict = _tpch_entity_dict(spark, SF_DEFAULT)
    raw = extract_triples(transcripts, model)
    return (canonicalize_triples(raw, entity_dict)
            .select("conv_id", "turn_idx", "subj", "pred", "obj"))


# ---------------------------------------------------------------------------
# per-operator queries
# ---------------------------------------------------------------------------

def _q_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringTagger candidate scan (SURVEY.md §2.3) on derived transcripts."""
    from palladian_spark.operators.mentions import extract_candidates
    df = extract_candidates(_tpch_transcripts(spark, sf_dir))
    return df.select("conv_id", "turn_idx",
                     F.col("start").alias("m_start"),
                     F.col("end").alias("m_end"),
                     "value", "tag")


def _q_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline → (subj, pred, obj) (SURVEY.md §2.5 + §2.7)."""
    from palladian_spark.relations import extract_triples, canonicalize_triples
    transcripts = _tpch_transcripts(spark, sf_dir)
    model = _tpch_model(spark, sf_dir)
    raw = extract_triples(transcripts, model)
    return (canonicalize_triples(raw, _tpch_entity_dict(spark, sf_dir))
            .select("conv_id", "turn_idx", "subj", "pred", "obj"))


def _q_link_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity linking via normalized-key broadcast join (SURVEY.md §2.6):
    noisy mention values (lowercased, padded) → canonical entity ids."""
    from palladian_spark.linking import link_mentions
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    mentions = supplier.select(
        F.lit("c").alias("conv_id"), F.lit(0).cast("int").alias("turn_idx"),
        F.lit(0).cast("int").alias("start"), F.lit(1).cast("int").alias("end"),
        F.concat(F.lit("  supplier s"), F.col("s_suppkey").cast("string"),
                 F.lit(" ")).alias("value"),
        F.lit("CANDIDATE").alias("tag"), F.lit(1.0).alias("conf"))
    linked = link_mentions(mentions, _tpch_entity_dict(spark, sf_dir), fuzzy=False)
    return linked.select("value", "entity_id", "canonical", "concept")


def _q_remove_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval de-nesting sweep (Annotations.java:43-56 semantics) on
    deterministic spans derived from lineitem."""
    from palladian_spark.operators.mentions import remove_nested_df
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spans = lineitem.select(
        F.concat(F.lit("g"), F.col("l_orderkey").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        ((F.col("l_linenumber") - 1) * 5).cast("int").alias("start"),
        ((F.col("l_linenumber") - 1) * 5 + 1
         + (F.col("l_quantity").cast("int") * 7) % 9).cast("int").alias("end"),
        F.lit("s").alias("value"), F.lit("X").alias("tag"),
        F.lit(1.0).alias("conf"))
    kept = remove_nested_df(spans)
    return kept.select("conv_id",
                       F.col("start").alias("m_start"),
                       F.col("end").alias("m_end"))


def _q_combine_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency merge, gaps-and-islands JVM-side (PalladianNer.java:573-601)."""
    from palladian_spark.operators.mentions import combine_adjacent_df
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spans = lineitem.select(
        F.concat(F.lit("g"), F.col("l_orderkey").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        ((F.col("l_linenumber") - 1) * 6).cast("int").alias("start"),
        ((F.col("l_linenumber") - 1) * 6 + 5).cast("int").alias("end"),
        F.concat(F.lit("w"), F.col("l_linenumber").cast("string")).alias("value"),
        F.when(F.col("l_linenumber") <= 2, F.lit("A")).otherwise(F.lit("B")).alias("tag"),
        F.lit(1.0).alias("conf"))
    merged = combine_adjacent_df(spans)
    return merged.select("conv_id",
                         F.col("start").alias("m_start"),
                         F.col("end").alias("m_end"), "value", "tag")


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy over turn text (duplicate turns are organic
    in the derived transcripts — same customer/supplier pair repeats)."""
    t = _tpch_transcripts(spark, sf_dir)
    return (t.groupBy(F.md5(F.col("text")).alias("fingerprint"))
            .agg(F.count("*").alias("n_dups"))
            .where(F.col("n_dups") > 1))


def _q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counting + quality ratios over documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    stop = F.filter(toks, lambda t: t.isin("the", "a"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        F.length("text").cast("int").alias("n_chars"),
        (F.size(stop).cast("double") / F.size(toks)).alias("stopword_ratio"))


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def _q_similarity_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein similarity join on part names (JVM-side built-in;
    1 − dist/max(len) per LevenshteinSimilarity.java:24-37)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = part.select(F.col("p_partkey").alias("a_key"), F.col("p_name").alias("a_name"),
                    F.col("p_type").alias("a_type"))
    b = part.select(F.col("p_partkey").alias("b_key"), F.col("p_name").alias("b_name"),
                    F.col("p_type").alias("b_type"))
    pairs = (a.join(b, (F.col("a_type") == F.col("b_type"))
                    & (F.col("a_key") < F.col("b_key"))))
    sim = (F.lit(1.0) - F.levenshtein("a_name", "b_name")
           / F.greatest(F.length("a_name"), F.length("b_name")))
    return (pairs.select("a_key", "b_key", sim.alias("lev_sim"))
            .where(F.col("lev_sim") >= 0.5))


def _q_ngram_dice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-3-gram Dice similarity (CharacterNGramSimilarity.java:50-85,
    '#'-padded) between part names of the same brand — pure Catalyst
    expressions (no UDF)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")

    def grams(col):
        padded = F.concat(F.lit("##"), F.lower(col), F.lit("##"))
        idx = F.sequence(F.lit(1), F.length(padded) - 2)
        return F.array_distinct(
            F.transform(idx, lambda i: padded.substr(i, F.lit(3))))

    a = part.select(F.col("p_partkey").alias("a_key"), F.col("p_name").alias("a_name"),
                    F.col("p_brand").alias("a_brand"))
    b = part.select(F.col("p_partkey").alias("b_key"), F.col("p_name").alias("b_name"),
                    F.col("p_brand").alias("b_brand"))
    pairs = a.join(b, (F.col("a_brand") == F.col("b_brand"))
                   & (F.col("a_key") < F.col("b_key")))
    ga, gb = grams(F.col("a_name")), grams(F.col("b_name"))
    inter = F.size(F.array_intersect(ga, gb))
    dice = F.when(F.lower(F.col("a_name")) == F.lower(F.col("b_name")), F.lit(1.0)) \
        .otherwise(2.0 * inter / (F.size(ga) + F.size(gb)))
    return (pairs.select("a_key", "b_key", F.round(dice, 6).alias("dice_sim"))
            .where(F.col("dice_sim") >= 0.5))


def _q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures over 3-token shingles of documents (dedup
    building block): 4 hash seeds, md5-derived 32-bit values — engine-
    portable by construction."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    shingles = F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 3))))
    exploded = docs.select("doc_id", F.explode(shingles).alias("shingle"))
    sigs = [
        F.min(F.conv(F.substring(F.md5(F.concat(F.lit(f"seed{k}|"),
                                                F.col("shingle"))), 1, 8),
                     16, 10).cast("long")).alias(f"minhash_{k}")
        for k in range(4)
    ]
    return exploded.groupBy("doc_id").agg(*sigs)


def _q_ann_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-1 neighbor per embedding (similarity-search
    baseline).  Scale path: the candidate matrix is broadcast once and each
    Arrow batch of query vectors runs ONE float64 matmul against it — no
    pairwise cross join ever materializes."""
    from palladian_spark.operators.similarity_search import brute_force_top_k
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_top_k(emb, k=1, round_decimals=4) \
        .select("a_id", "b_id", "cos_sim")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "candidates_stringtagger": _q_candidates,
        "kg_triples": _q_triples,
        "link_entities": _q_link_entities,
        "remove_nested": _q_remove_nested,
        "combine_adjacent": _q_combine_adjacent,
        "dedup_exact": _q_dedup_exact,
        "doc_token_stats": _q_doc_token_stats,
        "doc_fingerprint": _q_doc_fingerprint,
        "similarity_levenshtein": _q_similarity_levenshtein,
        "similarity_ngram_dice": _q_ngram_dice,
        "minhash_signatures": _q_minhash_signatures,
        "ann_cosine_top1": _q_ann_top1,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_BASE_CTE = """
WITH base AS (
  SELECT 'conv-' || CAST(l.l_orderkey AS VARCHAR) AS conv_id,
         CAST(l.l_linenumber AS INT) AS turn_idx,
         'Customer C' || CAST(o.o_custkey AS VARCHAR) AS cust,
         'Supplier S' || CAST(l.l_suppkey AS VARCHAR) AS supp,
         'Nation N'  || CAST(s.s_nationkey AS VARCHAR) AS nat
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "candidates_stringtagger": _BASE_CTE + """
SELECT conv_id, turn_idx, 0 AS m_start,
       CAST(length(cust) AS INT) AS m_end, cust AS value,
       'CANDIDATE' AS tag FROM base
UNION ALL
SELECT conv_id, turn_idx, CAST(length(cust) + 11 AS INT),
       CAST(length(cust) + 11 + length(supp) AS INT), supp, 'CANDIDATE'
FROM base
UNION ALL
SELECT conv_id, turn_idx, CAST(length(cust) + 15 + length(supp) AS INT),
       CAST(length(cust) + 15 + length(supp) + length(nat) AS INT), nat,
       'CANDIDATE'
FROM base
""",
        # the pipeline dedups identical (conv, turn, s, p, o) tuples — the
        # synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
        # the oracle must DISTINCT too
        "kg_triples": _BASE_CTE + """
SELECT DISTINCT conv_id, turn_idx, cust AS subj, 'works_for' AS pred,
       supp AS obj
FROM base
UNION
SELECT DISTINCT conv_id, turn_idx, supp, 'located_in', nat FROM base
""",
        "link_entities": """
SELECT '  supplier s' || CAST(s_suppkey AS VARCHAR) || ' ' AS value,
       'supp:' || CAST(s_suppkey AS VARCHAR) AS entity_id,
       'Supplier S' || CAST(s_suppkey AS VARCHAR) AS canonical,
       'ORG' AS concept
FROM supplier
""",
        "remove_nested": """
WITH RECURSIVE spans AS (
  SELECT 'g' || CAST(l_orderkey AS VARCHAR) AS conv_id,
         CAST((l_linenumber - 1) * 5 AS INT) AS m_start,
         CAST((l_linenumber - 1) * 5 + 1
              + (CAST(l_quantity AS INT) * 7) % 9 AS INT) AS m_end
  FROM lineitem
), ordered AS (
  SELECT conv_id, m_start, m_end,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY m_start ASC, m_end DESC) AS rn
  FROM spans
), walk AS (
  SELECT conv_id, rn, m_start, m_end, TRUE AS kept, m_end AS last_end
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.conv_id, o.rn, o.m_start, o.m_end,
         o.m_start >= w.last_end AS kept,
         CASE WHEN o.m_start >= w.last_end THEN o.m_end ELSE w.last_end END
  FROM ordered o JOIN walk w ON o.conv_id = w.conv_id AND o.rn = w.rn + 1
)
SELECT conv_id, m_start, m_end FROM walk WHERE kept
""",
        "combine_adjacent": """
WITH spans AS (
  SELECT 'g' || CAST(l_orderkey AS VARCHAR) AS conv_id,
         CAST((l_linenumber - 1) * 6 AS INT) AS m_start,
         CAST((l_linenumber - 1) * 6 + 5 AS INT) AS m_end,
         'w' || CAST(l_linenumber AS VARCHAR) AS value,
         CASE WHEN l_linenumber <= 2 THEN 'A' ELSE 'B' END AS tag
  FROM lineitem
), numbered AS (
  -- fix a total order first: duplicate spans are identical in every column,
  -- and two window operators may permute ties inconsistently otherwise
  SELECT *, row_number() OVER (PARTITION BY conv_id
                               ORDER BY m_start ASC, m_end DESC) AS rn
  FROM spans
), flagged AS (
  SELECT *,
         CASE WHEN lag(m_end) OVER w IS NULL
                OR m_start != lag(m_end) OVER w + 1
                OR lower(tag) != lower(lag(tag) OVER w)
              THEN 1 ELSE 0 END AS new_island
  FROM numbered
  WINDOW w AS (PARTITION BY conv_id ORDER BY rn)
), islands AS (
  SELECT *, sum(new_island) OVER (PARTITION BY conv_id ORDER BY rn
                                  ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT conv_id, CAST(min(m_start) AS INT) AS m_start,
       CAST(max(m_end) AS INT) AS m_end,
       string_agg(value, ' ' ORDER BY m_start, value) AS value,
       min(tag) AS tag
FROM islands GROUP BY conv_id, island
""",
        "dedup_exact": _BASE_CTE + """
SELECT md5(cust || ' works for ' || supp || ' in ' || nat || '.')
         AS fingerprint,
       count(*) AS n_dups
FROM base
GROUP BY 1 HAVING count(*) > 1
""",
        "doc_token_stats": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the', 'a'))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio
FROM documents
""",
        "doc_fingerprint": """
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
FROM documents
""",
        "similarity_levenshtein": """
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
             / greatest(length(a.p_name), length(b.p_name)) AS lev_sim
FROM part a JOIN part b
  ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
WHERE 1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
            / greatest(length(a.p_name), length(b.p_name)) >= 0.5
""",
        "similarity_ngram_dice": """
WITH g AS (
  SELECT p_partkey, p_name, p_brand,
         list_distinct([substr('##' || lower(p_name) || '##', i, 3)
                        for i in range(1, length(p_name) + 3)]) AS grams
  FROM part
)
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       round(CASE WHEN lower(a.p_name) = lower(b.p_name) THEN 1.0
                  ELSE 2.0 * len(list_intersect(a.grams, b.grams))
                       / (len(a.grams) + len(b.grams)) END, 6) AS dice_sim
FROM g a JOIN g b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE round(CASE WHEN lower(a.p_name) = lower(b.p_name) THEN 1.0
                 ELSE 2.0 * len(list_intersect(a.grams, b.grams))
                      / (len(a.grams) + len(b.grams)) END, 6) >= 0.5
""",
        "minhash_signatures": """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(ts[i:i+2], ' ')
            for i in range(1, greatest(len(ts) - 2, 1) + 1)])) AS shingle
  FROM tok
)
SELECT doc_id,
       min(('0x' || substr(md5('seed0|' || shingle), 1, 8))::BIGINT) AS minhash_0,
       min(('0x' || substr(md5('seed1|' || shingle), 1, 8))::BIGINT) AS minhash_1,
       min(('0x' || substr(md5('seed2|' || shingle), 1, 8))::BIGINT) AS minhash_2,
       min(('0x' || substr(md5('seed3|' || shingle), 1, 8))::BIGINT) AS minhash_3
FROM sh GROUP BY doc_id
""",
        "ann_cosine_top1": """
WITH pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         -- cast to DOUBLE[]: duckdb computes FLOAT[] cosine in float32,
         -- the Spark side folds in float64
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4) AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY a_id
                               ORDER BY cos_sim DESC, b_id ASC) AS rn
  FROM pairs
)
SELECT a_id, b_id, cos_sim FROM ranked WHERE rn = 1
""",
    }
