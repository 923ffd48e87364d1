"""Classic OLAP shapes over the TPC-H-ish tables: joins, windows, set
ops, rollup/pivot, JSON extraction, salted big-big equi-join.

Split out of the original single-file registry (round-5 verdict item #7);
sections moved verbatim, registration order preserved per family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from data_validator_guard_spark.engine import validate
from data_validator_guard_spark.rules import Rule
from data_validator_guard_spark.rules import RuleSuite
from data_validator_guard_spark.sources import read_table
from data_validator_guard_spark.queries._registry import query

# =====================================================================
# 6. Aggregation pipeline (TPC-H Q1 shape): pruned scan → fused agg.
#    Double sums go through per-addend DECIMAL casts (exact accumulation).
# =====================================================================
@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulation stays exact decimal (order-independent); only the final
    per-group total is cast to double — ONE deterministic conversion, so both
    engines emit bit-identical float64 (decimal outputs hash-mismatch in the
    driver: DuckDB .df() widens them to float64, Spark keeps Decimal)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,4)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
            ).cast("double").alias("sum_disc_price"),
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
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
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
            ).cast("double").alias("revenue"),
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
# 21. Set-union ID accumulation (A10/U1) + outer-join flags (J3).
# =====================================================================
@query(
    "union_ids",
    oracle="""
SELECT DISTINCT id FROM (
  SELECT o_custkey AS id FROM orders
  UNION ALL SELECT c_custkey FROM customer
  UNION ALL SELECT user_id FROM events
)
""",
)
def q_union_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    c = read_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    e = read_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return o.unionByName(c).unionByName(e).distinct()


@query(
    "click_purchase_outer",
    oracle="""
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       c.user_id IS NOT NULL AS clicked,
       p.user_id IS NOT NULL AS purchased
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
""",
)
def q_click_purchase_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    c = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    p = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return (
        c.withColumnRenamed("user_id", "cu")
        .join(p.withColumnRenamed("user_id", "pu"), F.col("cu") == F.col("pu"), "full_outer")
        .select(
            F.coalesce(F.col("cu"), F.col("pu")).alias("user_id"),
            F.col("cu").isNotNull().alias("clicked"),
            F.col("pu").isNotNull().alias("purchased"),
        )
    )


# =====================================================================
# 22. Row completeness fractions (A7) + negative-regex filter (P3).
# =====================================================================
@query(
    "row_completeness",
    oracle="""
SELECT doc_id,
       (CASE WHEN text IS NOT NULL AND trim(text) <> '' THEN 1 ELSE 0 END
        + CASE WHEN lang IS NOT NULL AND trim(lang) <> '' THEN 1 ELSE 0 END
        + CASE WHEN source IS NOT NULL AND trim(source) <> '' THEN 1 ELSE 0 END) AS n_filled,
       CAST((CASE WHEN text IS NOT NULL AND trim(text) <> '' THEN 1 ELSE 0 END
        + CASE WHEN lang IS NOT NULL AND trim(lang) <> '' THEN 1 ELSE 0 END
        + CASE WHEN source IS NOT NULL AND trim(source) <> '' THEN 1 ELSE 0 END) AS DOUBLE) / 3.0e0 AS completeness
FROM documents
""",
)
def q_row_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.functions import is_blank

    docs = read_table(spark, sf_dir, "documents")
    cols = ["text", "lang", "source"]
    n_filled = sum((~is_blank(c)).cast("int") for c in cols)
    return docs.select(
        "doc_id",
        n_filled.alias("n_filled"),
        (n_filled.cast("double") / F.lit(3.0)).alias("completeness"),
    )


@query(
    "negative_regex_filter",
    oracle=r"""
SELECT doc_id FROM documents
WHERE NOT regexp_matches(text, '\b(slow|big)\b')
""",
)
def q_negative_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clinician/admin exclusion idiom (auxiliar_functions.py:47-52):
    keep rows NOT matching a pattern."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(~F.col("text").rlike(r"\b(slow|big)\b")).select("doc_id")


# =====================================================================
# 30. Classic OLAP shapes widening the join/agg surface: semi-join with a
#     non-equi predicate (Q4-shape), segmented top-k (Q3-shape), and a
#     window-based correlated aggregate (Q17-shape). Decimal-cast addends
#     keep every SUM order-independent.
# =====================================================================
@query(
    "late_shipment_priority_counts",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o.o_orderpriority
""",
)
def q_late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 60).cast("timestamp")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "top_building_orders",
    oracle="""
SELECT o_orderkey, CAST(revenue AS DOUBLE) AS revenue, rn FROM (
  SELECT l.l_orderkey AS o_orderkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))) AS revenue,
         ROW_NUMBER() OVER (
           ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))) DESC,
                    l.l_orderkey
         ) AS rn
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
  GROUP BY l.l_orderkey
) WHERE rn <= 10
""",
)
def q_top_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITHOUT a global window: ``orderBy(...).limit(k)`` compiles to
    distributed TakeOrderedAndProject (per-partition top-k then a k-row merge
    on the driver) — a single-partition ``Window.orderBy`` would funnel every
    aggregated row through one task. Ranks are assigned afterwards on the
    k-row result (trivial). The sort key stays the exact decimal; only the
    emitted revenue is cast to double."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    l = read_table(spark, sf_dir, "lineitem")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
            ).alias("revenue")
        )
    )
    topk = rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return topk.withColumn("rn", F.row_number().over(w)).select(
        "o_orderkey", F.col("revenue").cast("double").alias("revenue"), "rn"
    )


@query(
    "small_quantity_lineitems",
    oracle="""
WITH avgq AS (
  SELECT l_partkey, AVG(CAST(l_quantity AS DOUBLE)) AS aq, COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT l.l_orderkey, l.l_partkey, l.l_linenumber,
       l.l_quantity AS quantity
FROM lineitem l JOIN avgq a ON a.l_partkey = l.l_partkey
WHERE a.n >= 3 AND CAST(l.l_quantity AS DOUBLE) < 0.5 * (a.aq / 1.0)
""",
)
def q_small_quantity_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: per-part average via window (no second scan/self-join),
    then rows under half the average. AVG of doubles is the single
    IEEE-divide of an exact-ish sum — both engines compute sum/count over
    the same values; the 0.5x comparison keeps floats out of the output."""
    l = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    q = F.col("l_quantity").cast("double")
    avg_sum = F.sum(q).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return (
        l.withColumn("__aq", avg_sum / cnt)
        .withColumn("__n", cnt)
        .filter((F.col("__n") >= 3) & (q < 0.5 * (F.col("__aq") / F.lit(1.0))))
        .select(
            "l_orderkey",
            "l_partkey",
            "l_linenumber",
            F.col("l_quantity").alias("quantity"),
        )
    )


# =====================================================================
# 31. Remaining SURVEY.md §2 parity: group-first dedup-by-key (A5),
#     fill-missing enrichment join (J7), rulebook auto-generation (M5).
# =====================================================================
@query(
    "first_event_per_user",
    oracle="""
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
)
def q_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (`maganamed_validation.py:92-93` groupby.first) with an explicit
    total order — pandas' first-row-seen is nondeterministic under
    distribution, so the engine contract is first-by-(ts, event_id)."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@query(
    "fill_missing_lang",
    oracle="""
WITH holes AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END AS lang
  FROM documents
),
dim AS (
  SELECT 'src' || CAST(i AS VARCHAR) AS source,
         CASE WHEN i % 2 = 0 THEN 'en' ELSE 'de' END AS default_lang
  FROM (SELECT unnest(generate_series(0, 19)) AS i)
)
SELECT h.doc_id, h.source,
       CASE WHEN h.lang IS NULL OR trim(h.lang) = '' THEN d.default_lang
            ELSE h.lang END AS lang,
       (h.lang IS NULL OR trim(h.lang) = '') AND d.default_lang IS NOT NULL AS filled
FROM holes h LEFT JOIN dim d ON d.source = h.source
""",
)
def q_fill_missing_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (`general_id_cleaning.py:302-317`): fill blank values from a
    broadcast reference lookup; blanks are planted deterministically so the
    fill path is exercised."""
    from data_validator_guard_spark.functions import is_blank

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 10 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang"),
    )
    dim = spark.createDataFrame(
        [(f"src{i}", "en" if i % 2 == 0 else "de") for i in range(20)],
        "source string, default_lang string",
    )
    joined = docs.join(F.broadcast(dim), "source", "left")
    blank = is_blank("lang")
    return joined.select(
        "doc_id",
        "source",
        F.when(blank, F.col("default_lang")).otherwise(F.col("lang")).alias("lang"),
        (blank & F.col("default_lang").isNotNull()).alias("filled"),
    )


@query(
    "rulebook_autogen",
    oracle="""
SELECT k AS key, CAST(NULL AS VARCHAR) AS correct_value,
       CASE WHEN k IS NULL OR trim(k) = '' OR k LIKE '% %' OR upper(k) LIKE '%TEST%'
              THEN 'delete'
            WHEN length(k) >= 10 THEN 'update'
            ELSE 'check manually' END AS action
FROM (
  SELECT DISTINCT source || CASE WHEN doc_id % 7 = 0 THEN ' TEST'
                                 WHEN doc_id % 11 = 0 THEN '_0123456789'
                                 ELSE '' END AS k
  FROM documents
)
""",
)
def q_rulebook_autogen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 (`utils/rulebook.py:31-35,97-100`): classify keys into actions by
    content; defective keys planted deterministically."""
    from data_validator_guard_spark.operators.cleaning import rulebook_from_rules

    docs = read_table(spark, sf_dir, "documents").select(
        F.concat(
            F.col("source"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" TEST"))
            .when(F.col("doc_id") % 11 == 0, F.lit("_0123456789"))
            .otherwise(F.lit("")),
        ).alias("key")
    )
    return rulebook_from_rules(docs, "key")


# =====================================================================
# 35. Rollup and pivot shapes (multi-level aggregation surface).
# =====================================================================
@query(
    "revenue_rollup",
    oracle="""
SELECT COALESCE(l_returnflag, '__total__') AS returnflag,
       COALESCE(l_linestatus, '__total__') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,4)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("__total__")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("__total__")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@query(
    "events_pivot",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup
FROM events GROUP BY user_id
""",
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "signup"])
    )


# =====================================================================
# 39. JSON column extraction (semi-structured props on events).
# =====================================================================
@query(
    "json_props_stats",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k.isNull().cast("bigint")).alias("n_missing"),
        F.count(F.lit(1)).alias("n"),
    )


# =====================================================================
# 48. Remaining OLAP join/subquery shapes.
# =====================================================================
@query(
    "top_balance_per_nation",
    oracle="""
WITH mx AS (
  SELECT c_nationkey, MAX(c_acctbal) AS max_bal FROM customer GROUP BY c_nationkey
)
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM customer c
JOIN mx ON mx.c_nationkey = c.c_nationkey AND c.c_acctbal = mx.max_bal
JOIN nation n ON n.n_nationkey = c.c_nationkey
""",
)
def q_top_balance_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax via aggregate + self-join (Q2 shape) — keeps ALL ties, unlike
    the row_number top-k family; max of raw doubles passes through exactly."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    mx = c.groupBy(F.col("c_nationkey").alias("mx_nationkey")).agg(
        F.max("c_acctbal").alias("max_bal")
    )
    return (
        c.join(
            F.broadcast(mx),
            (c.c_nationkey == F.col("mx_nationkey")) & (c.c_acctbal == F.col("max_bal")),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
    )


@query(
    "rich_customers_no_orders",
    oracle="""
WITH tot AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(20,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_custkey, c.c_acctbal
FROM customer c, tot
WHERE CAST(c.c_acctbal AS DECIMAL(20,2)) * tot.n > tot.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
""",
)
def q_rich_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average balance and no recent (1998+) orders. The average is never
    computed as a float: the predicate cross-multiplies (bal·n > Σbal) in
    exact decimal, so the boundary set is identical in both engines."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    tot = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(20,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(F.col("c_acctbal").cast("decimal(20,2)") * F.col("n") > F.col("s"))
        .join(
            o.filter(
                F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
            ).select("o_custkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_acctbal")
    )


@query(
    "supplier_grouping_sets",
    oracle="""
SELECT COALESCE(n.n_name, '__all__') AS nation,
       COALESCE(r.r_name, '__all__') AS region,
       COUNT(*) AS n_suppliers
FROM supplier s
JOIN nation n0 ON n0.n_nationkey = s.s_nationkey
JOIN region r0 ON r0.r_regionkey = n0.n_regionkey
LEFT JOIN nation n ON n.n_nationkey = n0.n_nationkey
LEFT JOIN region r ON r.r_regionkey = r0.r_regionkey
GROUP BY GROUPING SETS ((n.n_name), (r.r_name), ())
""",
)
def q_supplier_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (not rollup/cube): per-nation, per-region and grand
    totals in one pass over the joined fact — via the SQL surface on temp
    views (the engine exposes both DataFrame and SQL entry points)."""
    read_table(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier")
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    read_table(spark, sf_dir, "region").createOrReplaceTempView("v_region")
    return spark.sql("""
        SELECT COALESCE(n_name, '__all__') AS nation,
               COALESCE(r_name, '__all__') AS region,
               COUNT(*) AS n_suppliers
        FROM v_supplier s
        JOIN v_nation n ON n.n_nationkey = s.s_nationkey
        JOIN v_region r ON r.r_regionkey = n.n_regionkey
        GROUP BY GROUPING SETS ((n_name), (r_name), ())
    """)


@query(
    "top_revenue_suppliers",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS r
  FROM lineitem GROUP BY l_suppkey
),
mx AS (SELECT MAX(r) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS revenue
FROM rev, mx
JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.r = mx.m
""",
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum revenue — the max and the
    equality run on exact decimals (ties kept); only the emitted revenue is
    cast to double."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
        ).alias("r")
    )
    mx = rev.agg(F.max("r").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("revenue"))
    )


# =====================================================================
# 64. Remaining table coverage: `part` aggregates; rule-suite validation
#     over the embeddings table (derived exact-integer norm column feeds
#     min_max — rules over derived columns, not just raw ones).
# =====================================================================
@query(
    "part_price_by_brand",
    oracle="""
SELECT p_brand,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price,
       CAST(MIN(p_size) AS BIGINT) AS min_size,
       CAST(MAX(p_size) AS BIGINT) AS max_size,
       COUNT(*) AS n
FROM part GROUP BY p_brand
""",
)
def q_part_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.sum(F.col("p_retailprice").cast("decimal(20,4)")).cast("double").alias("total_price"),
        F.min("p_size").cast("bigint").alias("min_size"),
        F.max("p_size").cast("bigint").alias("max_size"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "verdicts_embeddings",
    oracle="""
WITH q AS (
  SELECT vec_id,
         len(embedding) AS dim,
         list_sum(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS qnorm2
  FROM embeddings
)
SELECT 'dim_is_64' AS rule_id, '__all__' AS "partition",
       SUM(CASE WHEN NOT COALESCE(dim = 64, FALSE) THEN 1 ELSE 0 END) = 0 AS pass,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN NOT COALESCE(dim = 64, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM q
UNION ALL
SELECT 'norm_nonzero', '__all__',
       SUM(CASE WHEN qnorm2 IS NULL OR qnorm2 < 1 OR qnorm2 > 1000000000 THEN 1 ELSE 0 END) = 0,
       COUNT(*),
       CAST(SUM(CASE WHEN qnorm2 IS NULL OR qnorm2 < 1 OR qnorm2 > 1000000000 THEN 1 ELSE 0 END) AS BIGINT)
FROM q
UNION ALL
SELECT 'vec_id_unique', '__all__',
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
          SELECT COUNT(*) AS n FROM q GROUP BY vec_id HAVING COUNT(*) > 1)) = 0,
       COUNT(*),
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
          SELECT COUNT(*) AS n FROM q GROUP BY vec_id HAVING COUNT(*) > 1))
FROM q
""",
)
def q_verdicts_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table hygiene as a rule suite: fixed dimension, bounded
    exact-integer norm (degenerate zero/exploding vectors), unique ids —
    rules run over DERIVED columns added before validate()."""
    from data_validator_guard_spark.operators.dedup import _int_dot, _quantize

    emb = read_table(spark, sf_dir, "embeddings")
    qv = _quantize(F.col("embedding"), 1000)
    derived = emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        _int_dot(qv, qv).alias("qnorm2"),
    )
    suite = RuleSuite(
        "embeddings",
        [
            Rule("dim_is_64", "cross_column", (), {"expr": "dim = 64"}),
            Rule("norm_nonzero", "min_max", ("qnorm2",), {"lo": 1, "hi": 1_000_000_000}),
            Rule("vec_id_unique", "unique", ("vec_id",)),
        ],
        key_cols=("vec_id",),
    )
    verdicts, _ = validate(derived, suite)
    return verdicts


# =====================================================================
# 65. Semi-structured profiling: JSON key inventory over events.props
#     (schema inference for opaque JSON columns) and per-source language
#     purity (majority-share profiling).
# =====================================================================
@query(
    "json_key_inventory",
    oracle="""
SELECT k AS key, COUNT(*) AS n
FROM (SELECT unnest(json_keys(props)) AS k FROM events WHERE props IS NOT NULL)
GROUP BY k
""",
)
def q_json_key_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("props").isNotNull())
        .select(F.explode(F.json_object_keys("props")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "source_language_purity",
    oracle="""
WITH c AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
),
t AS (
  SELECT source, SUM(n) AS total, MAX(n) AS top_n,
         COUNT(*) AS n_langs
  FROM c GROUP BY source
)
SELECT source, CAST(total AS BIGINT) AS total, n_langs,
       CAST(top_n AS BIGINT) AS top_n,
       CAST(top_n AS DOUBLE) / CAST(total AS DOUBLE) AS purity
FROM t
""",
)
def q_source_language_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-language share per source — mixed-language shards are a
    curation smell; exact integer counts, one final division."""
    docs = read_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("total"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max("n").cast("bigint").alias("top_n"),
        )
        .select(
            "source",
            "total",
            "n_langs",
            "top_n",
            (F.col("top_n").cast("double") / F.col("total").cast("double")).alias("purity"),
        )
    )


# =====================================================================
# 66. Q5 shape: six-table join chain with the same-nation predicate
#     (customer and supplier of each lineitem share a nation) — the deepest
#     join the engine exercises; dims broadcast, facts shuffle on keys.
# =====================================================================
@query(
    "local_supplier_revenue",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
""",
)
def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# =====================================================================
# 29. Salted big-big equi-join (operators/uniqueness.py): the explicit
#     skew treatment when the hot key is too hot even for AQE's runtime
#     split — salt the skewed side, replicate the other n_salts times.
#     Row-identical to the plain join (the oracle IS the plain join).
# =====================================================================
@query(
    "salted_join_segments",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
)
def q_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to customers through the salted big-big join (events'
    user_id carries the corpus's natural hot keys), then aggregated per
    market segment. The salted plan's output is row-identical to the plain
    join — the oracle runs the plain join, so the equality IS the gate."""
    from data_validator_guard_spark.operators.uniqueness import salted_equijoin

    events = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "user_id", "event_id"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_equijoin(events, customer, on=["c_custkey"], n_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )
