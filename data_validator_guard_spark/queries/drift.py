"""Distribution drift: PSI and chi-square over fixed and equi-depth
edges; time-of-day profile over the same histogram machinery.

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
# 18. Distribution drift (operators/drift.py) — the engine's one pandas
#     UDF, PSI reproduced in SQL (same fixed edges + epsilon).
# =====================================================================
_DRIFT_EDGES = [0.0, 128.0, 192.0, 256.0, 384.0, 512.0]
_DRIFT_EPS = 1e-6


def _psi_oracle() -> str:
    edges = _DRIFT_EDGES
    bucket_sql = f"CASE WHEN n_chars < {edges[0]} THEN -1 " + " ".join(
        f"WHEN n_chars < {edges[i]} THEN {i - 1}" for i in range(1, len(edges))
    ) + f" ELSE {len(edges) - 1} END"
    return f"""
WITH cur AS (
  SELECT lang AS grp, {bucket_sql} AS bucket, COUNT(*) AS n_cur
  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
base AS (
  SELECT lang AS grp, {bucket_sql} AS bucket, COUNT(*) AS n_base
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
allb AS (
  SELECT g.grp, b.bucket,
         COALESCE(c.n_cur, 0) AS n_cur, COALESCE(ba.n_base, 0) AS n_base
  FROM (SELECT DISTINCT grp FROM (SELECT grp FROM cur UNION ALL SELECT grp FROM base))
       g
  CROSS JOIN (SELECT unnest(generate_series(-1, {len(edges) - 1})) AS bucket) b
  LEFT JOIN cur c ON c.grp = g.grp AND c.bucket = b.bucket
  LEFT JOIN base ba ON ba.grp = g.grp AND ba.bucket = b.bucket
),
tot AS (
  SELECT grp, SUM(n_cur) AS tc, SUM(n_base) AS tb FROM allb GROUP BY grp
)
SELECT a.grp AS lang,
       round(SUM((CAST(a.n_cur AS DOUBLE) / t.tc + {_DRIFT_EPS}
                 - CAST(a.n_base AS DOUBLE) / t.tb - {_DRIFT_EPS})
                * ln((CAST(a.n_cur AS DOUBLE) / t.tc + {_DRIFT_EPS})
                     / (CAST(a.n_base AS DOUBLE) / t.tb + {_DRIFT_EPS}))), 6) AS psi,
       CAST(SUM(a.n_cur) AS BIGINT) AS n_cur, CAST(SUM(a.n_base) AS BIGINT) AS n_base
FROM allb a JOIN tot t ON t.grp = a.grp
GROUP BY a.grp
"""


@query("drift_psi", oracle=_psi_oracle())
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.drift import histogram, psi_report

    docs = read_table(spark, sf_dir, "documents")
    cur = histogram(docs.filter(F.col("doc_id") % 2 == 1), "lang", F.col("n_chars"), _DRIFT_EDGES)
    base = histogram(docs.filter(F.col("doc_id") % 2 == 0), "lang", F.col("n_chars"), _DRIFT_EDGES)
    rep = psi_report(cur, base, _DRIFT_EDGES)
    # rounded DOUBLE, not decimal: both engines land on the same 1e-6 grid
    # point (pre-round values agree to ~1e-15), and float64 hashes identically
    # through the driver on both sides — decimals do not.
    return rep.select(
        F.col("grp").alias("lang"),
        F.round(F.col("psi"), 6).alias("psi"),
        "n_cur",
        "n_base",
    )


# =====================================================================
# 29. Chi-square drift statistic (companion to drift_psi; same fixed
#     edges, pandas-UDF result reproduced in SQL).
# =====================================================================
def _chi2_oracle() -> str:
    edges = _DRIFT_EDGES
    bucket_sql = f"CASE WHEN n_chars < {edges[0]} THEN -1 " + " ".join(
        f"WHEN n_chars < {edges[i]} THEN {i - 1}" for i in range(1, len(edges))
    ) + f" ELSE {len(edges) - 1} END"
    return f"""
WITH cur AS (
  SELECT lang AS grp, {bucket_sql} AS bucket, COUNT(*) AS n_cur
  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
base AS (
  SELECT lang AS grp, {bucket_sql} AS bucket, COUNT(*) AS n_base
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
j AS (
  SELECT COALESCE(c.grp, b.grp) AS grp, COALESCE(c.bucket, b.bucket) AS bucket,
         COALESCE(c.n_cur, 0) AS n_cur, COALESCE(b.n_base, 0) AS n_base
  FROM cur c FULL OUTER JOIN base b ON c.grp = b.grp AND c.bucket = b.bucket
),
tot AS (SELECT grp, SUM(n_cur) AS tc, SUM(n_base) AS tb FROM j GROUP BY grp)
SELECT j.grp AS lang,
       round(SUM(CASE WHEN j.n_base > 0 AND t.tb > 0 AND t.tc > 0 THEN
         (CAST(j.n_cur AS DOUBLE) - CAST(j.n_base AS DOUBLE) * t.tc / t.tb)
         * (CAST(j.n_cur AS DOUBLE) - CAST(j.n_base AS DOUBLE) * t.tc / t.tb)
         / (CAST(j.n_base AS DOUBLE) * t.tc / t.tb)
       ELSE 0.0 END), 6) AS chi2,
       CAST(SUM(j.n_cur) AS BIGINT) AS n_cur, CAST(SUM(j.n_base) AS BIGINT) AS n_base
FROM j JOIN tot t ON t.grp = j.grp
GROUP BY j.grp
"""


@query("drift_chi2", oracle=_chi2_oracle())
def q_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.drift import histogram, psi_report

    docs = read_table(spark, sf_dir, "documents")
    cur = histogram(docs.filter(F.col("doc_id") % 2 == 1), "lang", F.col("n_chars"), _DRIFT_EDGES)
    base = histogram(docs.filter(F.col("doc_id") % 2 == 0), "lang", F.col("n_chars"), _DRIFT_EDGES)
    rep = psi_report(cur, base, _DRIFT_EDGES)
    return rep.select(
        F.col("grp").alias("lang"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        "n_cur",
        "n_base",
    )


# =====================================================================
# 72. Kolmogorov–Smirnov drift (round 5): the CDF companion to drift_psi
#     over the SAME fixed-edge histograms — max |CDF_cur - CDF_base| per
#     language. Pure JVM: exact integer cumulative counts, one IEEE
#     division per CDF point, no pandas UDF anywhere on this path.
# =====================================================================
def _ks_oracle() -> str:
    edges = _DRIFT_EDGES
    bucket_sql = f"CASE WHEN n_chars < {edges[0]} THEN -1 " + " ".join(
        f"WHEN n_chars < {edges[i]} THEN {i - 1}" for i in range(1, len(edges))
    ) + f" ELSE {len(edges) - 1} END"
    return f"""
WITH cur AS (
  SELECT lang AS grp, {bucket_sql} AS bucket, COUNT(*) AS n_cur
  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
base AS (
  SELECT lang AS grp, {bucket_sql} AS bucket, COUNT(*) AS n_base
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
j AS (
  SELECT COALESCE(c.grp, b.grp) AS grp, COALESCE(c.bucket, b.bucket) AS bucket,
         COALESCE(c.n_cur, 0) AS n_cur, COALESCE(b.n_base, 0) AS n_base
  FROM cur c FULL OUTER JOIN base b ON c.grp = b.grp AND c.bucket = b.bucket
),
c AS (
  SELECT grp,
         SUM(n_cur) OVER (PARTITION BY grp ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(n_base) OVER (PARTITION BY grp ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(n_cur) OVER (PARTITION BY grp) AS tc,
         SUM(n_base) OVER (PARTITION BY grp) AS tb
  FROM j
)
SELECT grp AS lang,
       round(MAX(abs(CAST(cc AS DOUBLE) / tc - CAST(cb AS DOUBLE) / tb)), 6) AS ks,
       CAST(MAX(tc) AS BIGINT) AS n_cur, CAST(MAX(tb) AS BIGINT) AS n_base
FROM c GROUP BY grp
"""


@query("drift_ks", oracle=_ks_oracle())
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS statistic per language between the odd-doc_id (current) and
    even-doc_id (baseline) halves over the fixed drift edges. Every CDF
    point is an exact integer cumulative count with ONE division, so the
    pre-round values are bit-identical across engines (round(6) is the
    house style, not a crutch here)."""
    from data_validator_guard_spark.operators.drift import histogram, ks_report

    docs = read_table(spark, sf_dir, "documents")
    cur = histogram(docs.filter(F.col("doc_id") % 2 == 1), "lang", F.col("n_chars"), _DRIFT_EDGES)
    base = histogram(docs.filter(F.col("doc_id") % 2 == 0), "lang", F.col("n_chars"), _DRIFT_EDGES)
    rep = ks_report(cur, base)
    return rep.select(
        F.col("grp").alias("lang"),
        F.round(F.col("ks"), 6).alias("ks"),
        "n_cur",
        "n_base",
    )


# =====================================================================
# 63. Time-of-day profile + standalone fixed-bucket histogram (the drift
#     module's histogram as a first-class reporting query).
# =====================================================================
@query(
    "events_hourly_profile",
    oracle="""
SELECT event_type, CAST(hour(ts) AS INT) AS hour, COUNT(*) AS n
FROM events GROUP BY event_type, hour
""",
)
def q_events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", F.hour("ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "doc_length_histogram",
    oracle="""
SELECT lang AS grp,
       CAST(CASE WHEN n_chars < 0.0 THEN -1
                 WHEN n_chars < 128.0 THEN 0
                 WHEN n_chars < 192.0 THEN 1
                 WHEN n_chars < 256.0 THEN 2
                 WHEN n_chars < 384.0 THEN 3
                 WHEN n_chars < 512.0 THEN 4
                 ELSE 5 END AS INT) AS bucket,
       COUNT(*) AS n
FROM documents GROUP BY grp, bucket
""",
)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.drift import histogram

    docs = read_table(spark, sf_dir, "documents")
    return histogram(docs, "lang", F.col("n_chars"), _DRIFT_EDGES)


# =====================================================================
# 31. Drift over equi-depth edges: the deployment workflow — cut points
#     derived from the BASELINE snapshot's exact quantiles (BIGINT,
#     engine-identical), then fixed for the run and fed to the same
#     fused-histogram PSI path as drift_psi. The tiny cut collect (k-1
#     integers) mirrors the inline-dim pattern: edges become literals so
#     bucketize stays a constant-folded expression.
# =====================================================================
@query(
    "drift_psi_equidepth",
    oracle=f"""
WITH vhist AS (
  SELECT CAST(n_chars AS BIGINT) AS v, COUNT(*) AS n
  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL GROUP BY v
),
vcum AS (
  SELECT v,
         SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf,
         SUM(n) OVER () AS tot
  FROM vhist
),
cuts AS (
  SELECT
    CAST(MIN(CASE WHEN cf >= (tot * 25 + 99) // 100 THEN v END) AS BIGINT) AS q25,
    CAST(MIN(CASE WHEN cf >= (tot * 50 + 99) // 100 THEN v END) AS BIGINT) AS q50,
    CAST(MIN(CASE WHEN cf >= (tot * 75 + 99) // 100 THEN v END) AS BIGINT) AS q75
  FROM vcum
),
b AS (
  SELECT doc_id, lang,
         CASE WHEN n_chars < q25 THEN -1
              WHEN n_chars < q50 THEN 0
              WHEN n_chars < q75 THEN 1
              ELSE 2 END AS bucket
  FROM documents, cuts
),
cur AS (SELECT lang AS grp, bucket, COUNT(*) AS n_cur FROM b WHERE doc_id % 2 = 1 GROUP BY 1, 2),
base AS (SELECT lang AS grp, bucket, COUNT(*) AS n_base FROM b WHERE doc_id % 2 = 0 GROUP BY 1, 2),
allb AS (
  SELECT g.grp, bb.bucket,
         COALESCE(c.n_cur, 0) AS n_cur, COALESCE(ba.n_base, 0) AS n_base
  FROM (SELECT DISTINCT grp FROM (SELECT grp FROM cur UNION ALL SELECT grp FROM base)) g
  CROSS JOIN (SELECT unnest(generate_series(-1, 2)) AS bucket) bb
  LEFT JOIN cur c ON c.grp = g.grp AND c.bucket = bb.bucket
  LEFT JOIN base ba ON ba.grp = g.grp AND ba.bucket = bb.bucket
),
tot AS (SELECT grp, SUM(n_cur) AS tc, SUM(n_base) AS tb FROM allb GROUP BY grp)
SELECT a.grp AS lang,
       round(SUM((CAST(a.n_cur AS DOUBLE) / t.tc + {_DRIFT_EPS}
                 - CAST(a.n_base AS DOUBLE) / t.tb - {_DRIFT_EPS})
                * ln((CAST(a.n_cur AS DOUBLE) / t.tc + {_DRIFT_EPS})
                     / (CAST(a.n_base AS DOUBLE) / t.tb + {_DRIFT_EPS}))), 6) AS psi,
       CAST(SUM(a.n_cur) AS BIGINT) AS n_cur, CAST(SUM(a.n_base) AS BIGINT) AS n_base
FROM allb a JOIN tot t ON t.grp = a.grp
GROUP BY a.grp
""",
)
def q_drift_psi_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI per language between the odd-doc_id (current) and even-doc_id
    (baseline) halves, over equi-depth buckets cut at the BASELINE half's
    exact quartiles of n_chars — the binning a real deployment derives
    from its baseline snapshot and then fixes for the run. Cut points are
    exact BIGINTs (grouped_exact_quantiles), collected as 3 literals (the
    inline-dim collect pattern), so bucketize remains a constant-folded
    expression and the PSI path is byte-identical to drift_psi's."""
    from data_validator_guard_spark.operators.drift import histogram, psi_report
    from data_validator_guard_spark.operators.sampling import (
        grouped_exact_quantiles,
    )

    docs = read_table(spark, sf_dir, "documents")
    base_docs = docs.filter(F.col("doc_id") % 2 == 0)
    cur_docs = docs.filter(F.col("doc_id") % 2 == 1)
    row = grouped_exact_quantiles(
        base_docs.withColumn("__g", F.lit(1)), "__g", F.col("n_chars"), (25, 50, 75)
    ).collect()[0]
    edges = [float(row.q25), float(row.q50), float(row.q75)]
    rep = psi_report(
        histogram(cur_docs, "lang", F.col("n_chars"), edges),
        histogram(base_docs, "lang", F.col("n_chars"), edges),
        edges,
    )
    return rep.select(
        F.col("grp").alias("lang"),
        F.round(F.col("psi"), 6).alias("psi"),
        "n_cur",
        "n_base",
    )
