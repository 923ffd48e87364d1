"""Driver-facing query registry: Spark implementations + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 over the read-only
testdata tables. Contract (``__spark_entry__.py``): the Spark result and the
oracle SQL must agree on row count, schema (column names) and an
order-insensitive value hash at sf=0.01.

Determinism rules applied throughout:
- aggregate sums of doubles go through a per-addend DECIMAL cast (exact,
  order-independent accumulation) — never raw double SUM;
- ratios appear as integer numerator/denominator pairs or single IEEE ops;
- ranking queries emit ranks with explicit total tiebreaks, not raw floats.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_validator_guard_spark.engine import validate
from data_validator_guard_spark.operators.stats import column_stats
from data_validator_guard_spark.operators.uniqueness import duplicate_keys
from data_validator_guard_spark.rules import Rule, RuleSuite
from data_validator_guard_spark.sources import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

ALLOWED_DOC_LANGS = ["de", "en", "es", "fr"]  # 'zh' deliberately excluded → planted FK violations
LANG_PATTERN = r"^[a-z]{2}$"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# =====================================================================
# 1. Flagship: full rule-suite verdicts over `documents`, oracle-checked
#    end-to-end (every verdict counter reproduced in ANSI SQL).
# =====================================================================
@query(
    "verdicts_documents",
    oracle="""
WITH t AS (SELECT * FROM documents),
dup AS (
  SELECT COALESCE(SUM(n), 0) AS n FROM (
    SELECT COUNT(*) AS n FROM t GROUP BY doc_id HAVING COUNT(*) > 1
  ) d
)
SELECT 'text_not_blank' AS rule_id, '__all__' AS "partition",
       SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) = 0 AS pass,
       COUNT(*) AS n_rows,
       SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS n_violations
FROM t
UNION ALL
SELECT 'lang_pattern', '__all__',
       SUM(CASE WHEN lang IS NULL OR NOT regexp_matches(lang, '^[a-z]{2}$') THEN 1 ELSE 0 END) = 0,
       COUNT(*),
       SUM(CASE WHEN lang IS NULL OR NOT regexp_matches(lang, '^[a-z]{2}$') THEN 1 ELSE 0 END)
FROM t
UNION ALL
SELECT 'nchars_range', '__all__',
       SUM(CASE WHEN n_chars IS NULL OR n_chars < 1 OR n_chars > 1000000 THEN 1 ELSE 0 END) = 0,
       COUNT(*),
       SUM(CASE WHEN n_chars IS NULL OR n_chars < 1 OR n_chars > 1000000 THEN 1 ELSE 0 END)
FROM t
UNION ALL
SELECT 'source_cardinality', '__all__',
       COUNT(DISTINCT source) BETWEEN 1 AND 1000,
       COUNT(*),
       CASE WHEN COUNT(DISTINCT source) BETWEEN 1 AND 1000 THEN 0 ELSE 1 END
FROM t
UNION ALL
SELECT 'min_rows', '__all__', COUNT(*) >= 1, COUNT(*),
       CASE WHEN COUNT(*) >= 1 THEN 0 ELSE 1 END
FROM t
UNION ALL
SELECT 'doc_unique', '__all__', (SELECT n FROM dup) = 0, COUNT(*), (SELECT n FROM dup)
FROM t
UNION ALL
SELECT 'lang_fk', '__all__',
       SUM(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr') THEN 1 ELSE 0 END) = 0,
       COUNT(*),
       SUM(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr') THEN 1 ELSE 0 END)
FROM t
""",
)
def q_verdicts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    dim = spark.createDataFrame([(l,) for l in ALLOWED_DOC_LANGS], "lang string")
    suite = RuleSuite(
        name="documents",
        rules=[
            Rule("text_not_blank", "not_blank", ("text",)),
            Rule("lang_pattern", "regex_match", ("lang",), {"pattern": LANG_PATTERN}),
            Rule("nchars_range", "min_max", ("n_chars",), {"lo": 1, "hi": 1000000}),
            Rule("source_cardinality", "cardinality_range", ("source",), {"lo": 1, "hi": 1000, "exact": True}),
            Rule("min_rows", "min_rows", (), {"n": 1}),
            Rule("doc_unique", "unique", ("doc_id",)),
            Rule("lang_fk", "foreign_key", ("lang",), {"dim": dim}),
        ],
        key_cols=("doc_id",),
    )
    verdicts, _ = validate(docs, suite)
    return verdicts


@query(
    "violations_documents",
    oracle="""
WITH t AS (SELECT * FROM documents)
SELECT 'lang_fk' AS rule_id, '__all__' AS "partition",
       CAST(doc_id AS VARCHAR) AS keys,
       'unknown value in reference: ' || COALESCE(lang, 'NULL') AS detail
FROM t WHERE lang IS NULL OR lang NOT IN ('de','en','es','fr')
UNION ALL
SELECT 'lang_pattern', '__all__', CAST(doc_id AS VARCHAR),
       'lang !~ ^[a-z]{2}$: ' || COALESCE(lang, 'NULL')
FROM t WHERE lang IS NULL OR NOT regexp_matches(lang, '^[a-z]{2}$')
""",
)
def q_violations_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    dim = spark.createDataFrame([(l,) for l in ALLOWED_DOC_LANGS], "lang string")
    suite = RuleSuite(
        name="documents",
        rules=[
            Rule("lang_pattern", "regex_match", ("lang",), {"pattern": LANG_PATTERN}),
            Rule("lang_fk", "foreign_key", ("lang",), {"dim": dim}),
        ],
        key_cols=("doc_id",),
    )
    _, violations = validate(docs, suite)
    return violations


# =====================================================================
# 2. Fused column-stats suite (SURVEY.md §2.4 family, one agg pass).
# =====================================================================
def _stats_oracle_one(col: str, regex: str | None) -> str:
    n_match = (
        f"SUM(CASE WHEN {col} IS NOT NULL AND regexp_matches(CAST({col} AS VARCHAR), '{regex}') THEN 1 ELSE 0 END)"
        if regex
        else "CAST(NULL AS BIGINT)"
    )
    return f"""
SELECT '__all__' AS "partition", '{col}' AS "column",
       COUNT(*) AS n_rows,
       SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS n_null,
       SUM(CASE WHEN {col} IS NULL OR trim(CAST({col} AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS n_blank,
       COUNT(DISTINCT {col}) AS n_distinct,
       MIN(CAST({col} AS VARCHAR)) AS min_val,
       MAX(CAST({col} AS VARCHAR)) AS max_val,
       MIN(length(CAST({col} AS VARCHAR))) AS min_len,
       MAX(length(CAST({col} AS VARCHAR))) AS max_len,
       SUM(COALESCE(length(CAST({col} AS VARCHAR)), 0)) AS sum_len,
       {n_match} AS n_regex_match
FROM documents"""


@query(
    "stats_documents",
    oracle=" UNION ALL ".join(
        [
            _stats_oracle_one("text", "^the "),
            _stats_oracle_one("lang", "^[a-z]{2}$"),
            _stats_oracle_one("source", None),
            _stats_oracle_one("n_chars", None),
        ]
    ),
)
def q_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return column_stats(
        docs,
        ["text", "lang", "source", "n_chars"],
        regex_patterns={"text": "^the ", "lang": LANG_PATTERN},
        exact_distinct=True,
    )


# =====================================================================
# 3. Uniqueness via salted two-phase aggregation (A1; north rule).
# =====================================================================
@query(
    "duplicate_event_keys",
    oracle="""
SELECT user_id, event_type, COUNT(*) AS n
FROM events GROUP BY user_id, event_type HAVING COUNT(*) > 1
""",
)
def q_duplicate_event_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return duplicate_keys(events, ["user_id", "event_type"])


# =====================================================================
# 4. Referential / allowed-values (J4, P4).
# =====================================================================
@query(
    "fk_violations_lang",
    oracle="""
SELECT doc_id, lang FROM documents
WHERE lang IS NULL OR lang NOT IN ('de','en','es','fr')
""",
)
def q_fk_violations_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    dim = spark.createDataFrame([(l,) for l in ALLOWED_DOC_LANGS], "lang string")
    # broadcast left-anti join — the reference's set-difference referential
    # check (general_validation.py:94-108) distributed.
    return docs.select("doc_id", "lang").join(F.broadcast(dim), "lang", "left_anti").select(
        "doc_id", "lang"
    )


@query(
    "allowed_values_events",
    oracle="""
SELECT event_id, event_type FROM events
WHERE event_type IS NULL OR event_type NOT IN ('click','view','purchase','signup')
""",
)
def q_allowed_values_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    allowed = ["click", "view", "purchase", "signup"]
    c = F.col("event_type")
    return events.filter(c.isNull() | ~c.isin(allowed)).select("event_id", "event_type")


# =====================================================================
# 5. Group consistency (rule 11 / A8).
# =====================================================================
@query(
    "group_consistency_users",
    oracle="""
SELECT user_id, COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id HAVING COUNT(DISTINCT event_type) > 1
""",
)
def q_group_consistency_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n_types"))
        .filter(F.col("n_types") > 1)
    )


# =====================================================================
# 6. Aggregation pipeline (TPC-H Q1 shape): pruned scan → fused agg.
#    Double sums go through per-addend DECIMAL casts (exact accumulation).
# =====================================================================
@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS DECIMAL(20,4))) AS sum_qty,
       SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS sum_base_price,
       SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =====================================================================
# 7. Multi-join with broadcast dimension (J1/J2; revenue per nation).
# =====================================================================
@query(
    "revenue_by_nation",
    oracle="""
SELECT n.n_name,
       SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    n = read_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# =====================================================================
# 8. Group-concat of issue types (A4).
# =====================================================================
@query(
    "event_types_per_user",
    oracle="""
SELECT user_id, string_agg(DISTINCT event_type, ', ' ORDER BY event_type) AS event_types
FROM events GROUP BY user_id
""",
)
def q_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ", ").alias("event_types")
    )


# =====================================================================
# 9. Window top-k (O-family; §2.6).
# =====================================================================
@query(
    "top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


# =====================================================================
# 10. Baseline-date delta (A11): conditional window agg + datediff.
# =====================================================================
@query(
    "days_from_signup",
    oracle="""
WITH base AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       date_diff('day', CAST(b.signup_ts AS DATE), CAST(e.ts AS DATE)) AS days_from_signup
FROM events e JOIN base b ON e.user_id = b.user_id
""",
)
def q_days_from_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    # conditional window agg — the reference builds a participant→Baseline
    # dict then deltas per row (maganamed_validation.py:278-290).
    w = Window.partitionBy("user_id")
    signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    return (
        events.withColumn("signup_ts", signup)
        .filter(F.col("signup_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.datediff(F.to_date("ts"), F.to_date("signup_ts")).alias("days_from_signup"),
        )
    )


# =====================================================================
# 11. Set ops (U1/U2): users who clicked but never purchased.
# =====================================================================
@query(
    "clicked_not_purchased",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'purchase')
""",
)
def q_clicked_not_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.join(buys, "user_id", "left_anti")


# =====================================================================
# 12. Derived equality (rule 14): metadata-derived value vs stored column.
# =====================================================================
@query(
    "derived_source_check",
    oracle="""
SELECT doc_id, source,
       'src' || CAST(doc_id % 20 AS VARCHAR) AS expected_source,
       source = 'src' || CAST(doc_id % 20 AS VARCHAR) AS ok
FROM documents
""",
)
def q_derived_source_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    expected = F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
    return docs.select(
        "doc_id",
        "source",
        expected.alias("expected_source"),
        (F.col("source") == expected).alias("ok"),
    )
