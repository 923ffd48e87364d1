"""Temporal operators: tumbling/sliding event-time windows, as-of and
range joins, sessionization, time-gap detection.

Split out of the original single-file registry (round-5 verdict item #7);
sections moved verbatim, registration order preserved per family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from data_validator_guard_spark.sources import read_table
from data_validator_guard_spark.queries._registry import query

# =====================================================================
# 24. Event-time tumbling windows (streaming/incremental.py, batch mode).
# =====================================================================
@query(
    "windowed_event_counts",
    oracle="""
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
FROM events GROUP BY event_type, day
""",
)
def q_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.streaming.incremental import windowed_event_counts

    return windowed_event_counts(read_table(spark, sf_dir, "events"))


# =====================================================================
# 34. Temporal operators (operators/temporal.py): as-of join (checked
#     against DuckDB's native ASOF JOIN), gap sessionization, and an
#     interval range join.
# =====================================================================
@query(
    "asof_last_purchase",
    oracle="""
WITH p AS (
  SELECT user_id, ts, MAX(value) AS pval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, p.pval AS pval_asof
FROM events e
ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
""",
)
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the most recent prior (or simultaneous) purchase
    value of the same user — ASOF LEFT JOIN via the union+carry-forward
    window (one shuffle on the key, no range explosion)."""
    from data_validator_guard_spark.operators.temporal import asof_join

    events = read_table(spark, sf_dir, "events")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    joined = asof_join(
        events, purchases, key="user_id", left_ts="ts", right_ts="ts", value_cols=["pval"]
    )
    return joined.select("event_id", "user_id", F.col("pval_asof"))


@query(
    "sessionize_events",
    oracle="""
WITH x AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT event_id, user_id,
       CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_seq,
       CAST(user_id AS VARCHAR) || '#' ||
       CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) - 1 AS VARCHAR) AS session_id
FROM x
""",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-minute-gap sessions per user (lag + conditional cumsum; equal-ts
    ties land in the same session in any engine, so results are total-order
    independent)."""
    from data_validator_guard_spark.operators.temporal import sessionize

    events = read_table(spark, sf_dir, "events")
    return sessionize(events, key="user_id", ts="ts", gap_minutes=60.0).select(
        "event_id", "user_id", "session_seq", "session_id"
    )


@query(
    "events_after_signup_week",
    oracle="""
SELECT s.event_id AS signup_event, s.user_id, COUNT(*) AS n_events
FROM events s
JOIN events e
  ON e.user_id = s.user_id
 AND e.ts >= s.ts
 AND e.ts < s.ts + INTERVAL 7 DAY
WHERE s.event_type = 'signup'
GROUP BY s.event_id, s.user_id
""",
)
def q_events_after_signup_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: all events within [signup, signup+7d) per user.
    The equi key (user) carries the hash join; the range predicate is a
    post-join filter — no nested loop."""
    events = read_table(spark, sf_dir, "events")
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event"),
        F.col("user_id").alias("su"),
        F.col("ts").alias("sts"),
    )
    joined = events.join(
        s,
        (events.user_id == s.su)
        & (events.ts >= s.sts)
        & (events.ts < F.timestamp_add("DAY", F.lit(7), s.sts)),
    )
    return joined.groupBy("signup_event", F.col("su").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


# =====================================================================
# 43. Sliding event-time window (RANGE frame over seconds): 30-day rolling
#     order total per customer. Exact decimal accumulation inside the frame,
#     one final double cast (W-family: range frames, not just row frames).
# =====================================================================
@query(
    "rolling_order_totals",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) OVER (
         PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rolling_30d
FROM orders
""",
)
def q_rolling_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on epoch seconds — ties (equal timestamps) are IN
    the frame together in both engines, so the sum is frame-deterministic
    without a row tiebreak."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
        .over(w)
        .cast("double")
        .alias("rolling_30d"),
    )


# =====================================================================
# 50. Time-gap detection: calendar days with ZERO events per event_type
#     between that type's first and last day — completeness over time (the
#     reference's visit-window family generalized). sequence+explode builds
#     the per-type calendar distributed; observed days anti-join away.
# =====================================================================
@query(
    "missing_event_days",
    oracle="""
WITH ev AS (
  SELECT * FROM events WHERE day(ts) % 5 <> 0
),
span AS (
  SELECT event_type, CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
  FROM ev GROUP BY event_type
),
cal AS (
  SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
observed AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM ev)
SELECT c.event_type, c.day
FROM cal c
WHERE NOT EXISTS (
  SELECT 1 FROM observed o WHERE o.event_type = c.event_type AND o.day = c.day
)
""",
)
def q_missing_event_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drop every 5th day-of-month so the testdata (which is daily-dense)
    # exercises a non-empty gap set in both engines
    events = read_table(spark, sf_dir, "events").filter(
        F.dayofmonth("ts") % 5 != 0
    )
    span = events.groupBy("event_type").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    cal = span.select(
        "event_type",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    observed = events.select("event_type", F.to_date("ts").alias("day")).distinct()
    return cal.join(observed, ["event_type", "day"], "left_anti")
