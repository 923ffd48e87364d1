"""Rulebook cleaning and catalog search: action buckets, corrections
(incl. 4-part ESM composite key), typo suggestions, codebook.

Split out of the original single-file registry (round-5 verdict item #7);
sections moved verbatim, registration order preserved per family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from data_validator_guard_spark.sources import read_table
from data_validator_guard_spark.queries._registry import query

# =====================================================================
# 16. Rulebook cleaning (operators/cleaning.py; M1/M2). Inline rulebook,
#     byte-identity of surviving rows proven via sha256 in both engines.
# =====================================================================
_CLEANING_ORACLE = """
WITH rb AS (
  SELECT * FROM (VALUES
    ('src1', NULL, 'delete'),
    ('src3', 'src103', 'update'),
    ('src5', 'src105', 'merge'),
    ('src7', NULL, 'skip')
  ) AS t(source, correct_value, action)
),
kept AS (
  SELECT d.* FROM documents d
  WHERE d.source NOT IN (SELECT source FROM rb WHERE action = 'delete')
),
rewritten AS (
  SELECT k.doc_id,
         COALESCE(r.correct_value, k.source) AS source,
         k.lang,
         sha256(k.text) AS text_sha,
         CASE WHEN r.correct_value IS NOT NULL THEN 'rewritten' ELSE 'kept' END AS __action
  FROM kept k
  LEFT JOIN (SELECT source, correct_value FROM rb
             WHERE action IN ('update','merge','add') AND correct_value IS NOT NULL) r
    ON k.source = r.source
)
SELECT * FROM rewritten
"""


@query("cleaning_rulebook", oracle=_CLEANING_ORACLE)
def q_cleaning_rulebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.cleaning import apply_rulebook

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source", "lang", "text")
    rb = spark.createDataFrame(
        [
            ("src1", None, "delete"),
            ("src3", "src103", "update"),
            ("src5", "src105", "merge"),
            ("src7", None, "skip"),
        ],
        "source string, correct_value string, action string",
    )
    cleaned = apply_rulebook(docs, rb, key_col="source")
    return cleaned.select(
        "doc_id", "source", "lang", F.sha2(F.col("text"), 256).alias("text_sha"), "__action"
    )


# =====================================================================
# 20. Catalog search + codebook (P5 / S6 / M6).
# =====================================================================
@query(
    "search_values",
    oracle="""
SELECT 'documents' AS table_name, 'text' AS column_name,
       EXISTS(SELECT 1 FROM documents WHERE text LIKE '%spark%') AS found
UNION ALL
SELECT 'documents', 'lang', EXISTS(SELECT 1 FROM documents WHERE lang LIKE '%spark%')
UNION ALL
SELECT 'documents', 'source', EXISTS(SELECT 1 FROM documents WHERE source LIKE '%spark%')
UNION ALL
SELECT 'events', 'event_type', EXISTS(SELECT 1 FROM events WHERE event_type LIKE '%spark%')
UNION ALL
SELECT 'events', 'props', EXISTS(SELECT 1 FROM events WHERE props LIKE '%spark%')
""",
)
def q_search_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.search import search_value

    tables = {
        "documents": read_table(spark, sf_dir, "documents").select("text", "lang", "source"),
        "events": read_table(spark, sf_dir, "events").select("event_type", "props"),
    }
    return search_value(spark, tables, "spark")


@query(
    "codebook",
    oracle="""
SELECT * FROM (VALUES
  ('documents', 'doc_id', 'bigint'),
  ('documents', 'text', 'string'),
  ('documents', 'lang', 'string'),
  ('documents', 'source', 'string'),
  ('documents', 'n_chars', 'bigint'),
  ('events', 'event_id', 'bigint'),
  ('events', 'ts', 'timestamp_ntz'),
  ('events', 'user_id', 'bigint'),
  ('events', 'event_type', 'string'),
  ('events', 'value', 'double'),
  ('events', 'props', 'string')
) AS t(table_name, column_name, data_type)
""",
)
def q_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.search import codebook

    tables = {
        "documents": read_table(spark, sf_dir, "documents"),
        "events": read_table(spark, sf_dir, "events"),
    }
    return codebook(spark, tables)


# =====================================================================
# 37. Typo suggestions (the reference's mock-fixture defect class) and
#     exact heavy hitters (skew diagnosis).
# =====================================================================
@query(
    "typo_suggestions",
    oracle="""
WITH bad AS (
  SELECT doc_id AS id,
         source || CASE WHEN doc_id % 3 = 0 THEN 'x' ELSE '' END AS value
  FROM documents
  WHERE doc_id % 3 = 0
),
allowed AS (SELECT 'src' || CAST(unnest(generate_series(0, 19)) AS VARCHAR) AS a),
scored AS (
  SELECT b.id, b.value, a.a, levenshtein(b.value, a.a) AS dist,
         ROW_NUMBER() OVER (PARTITION BY b.id
                            ORDER BY levenshtein(b.value, a.a), a.a) AS rn
  FROM bad b CROSS JOIN allowed a
)
SELECT id, value,
       CASE WHEN dist <= 3 THEN a END AS suggestion,
       CASE WHEN dist <= 3 THEN dist END AS distance
FROM scored WHERE rn = 1
""",
)
def q_typo_suggestions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant 'srcNx' typos on every third doc and repair them against the
    allowed src0..src19 dictionary (mock_data.py city-typo class)."""
    from data_validator_guard_spark.operators.text import closest_allowed_value

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    typod = docs.select(
        "doc_id", F.concat(F.col("source"), F.lit("x")).alias("typod_source")
    )
    return closest_allowed_value(
        typod, "typod_source", [f"src{i}" for i in range(20)], "doc_id"
    )


@query(
    "heavy_hitter_users",
    oracle="""
SELECT value, n, rank FROM (
  SELECT user_id AS value, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rank
  FROM events GROUP BY user_id
) WHERE rank <= 10
""",
)
def q_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import heavy_hitters

    return heavy_hitters(read_table(spark, sf_dir, "events"), "user_id", k=10)


# =====================================================================
# 40. Composite-key rulebook corrections (the reference ESM system's 4-part
#     key (participant_identifier, participant_number, VisitCode, SiteCode),
#     general_id_cleaning.py:96-101,185-251) with reference-aligned action
#     semantics: `add` assigns the correct id (:114,196-214), `use` is
#     skipped (:119). Byte-identity of surviving rows proven via sha256.
# =====================================================================
_CLEANING_ESM_ORACLE = """
WITH t AS (
  SELECT doc_id, source, lang,
         CAST(doc_id % 3 AS VARCHAR) AS visit,
         CAST(doc_id % 2 AS VARCHAR) AS site,
         text
  FROM documents
),
rb AS (
  SELECT * FROM (VALUES
    ('src1', 'en', '0', '0', NULL, 'delete'),
    ('src3', 'de', '1', '1', 'src303', 'add'),
    ('src5', 'fr', '2', '0', 'src505', 'update'),
    ('src7', 'es', '0', '1', 'src707', 'use')
  ) AS v(source, lang, visit, site, correct_value, action)
),
kept AS (
  SELECT t.* FROM t
  WHERE NOT EXISTS (
    SELECT 1 FROM rb WHERE rb.action = 'delete'
      AND rb.source = t.source AND rb.lang = t.lang
      AND rb.visit = t.visit AND rb.site = t.site
  )
)
SELECT k.doc_id,
       COALESCE(r.correct_value, k.source) AS source,
       k.lang, k.visit, k.site,
       sha256(k.text) AS text_sha,
       CASE WHEN r.correct_value IS NOT NULL THEN 'rewritten' ELSE 'kept' END AS __action
FROM kept k
LEFT JOIN (SELECT source, lang, visit, site, correct_value FROM rb
           WHERE action IN ('update','merge','add') AND correct_value IS NOT NULL) r
  ON k.source = r.source AND k.lang = r.lang
 AND k.visit = r.visit AND k.site = r.site
"""


@query("cleaning_rulebook_esm", oracle=_CLEANING_ESM_ORACLE)
def q_cleaning_rulebook_esm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.cleaning import apply_rulebook

    docs = (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            "lang",
            (F.col("doc_id") % 3).cast("string").alias("visit"),
            (F.col("doc_id") % 2).cast("string").alias("site"),
            "text",
        )
    )
    rb = spark.createDataFrame(
        [
            ("src1", "en", "0", "0", None, "delete"),
            ("src3", "de", "1", "1", "src303", "add"),
            ("src5", "fr", "2", "0", "src505", "update"),
            ("src7", "es", "0", "1", "src707", "use"),
        ],
        "source string, lang string, visit string, site string, correct_value string, action string",
    )
    cleaned = apply_rulebook(docs, rb, key_col=("source", "lang", "visit", "site"))
    return cleaned.select(
        "doc_id", "source", "lang", "visit", "site",
        F.sha2(F.col("text"), 256).alias("text_sha"), "__action",
    )
