"""Deterministic sampling: hash-threshold Bernoulli, stratified exact-n,
weighted mixture sampling.

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
# 23. Deterministic sampling (operators/sampling.py) — round 4. Membership
#     derives only from md5 of the row id: reproducible, growth-stable,
#     RNG-free; oracles replicate the nibble arithmetic bit for bit.
# =====================================================================
def _hex12_sql(hash_expr: str) -> str:
    """First 12 hex nibbles of a DuckDB md5() hex string as a BIGINT —
    Horner expansion via strpos (the same construction the split/packing
    oracles use for 3 nibbles; 12 nibbles < 2^48 stays in BIGINT)."""
    acc = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        nib = f"(strpos('0123456789abcdef', substr({hash_expr}, {i}, 1)) - 1)"
        acc = f"({acc} * 16 + {nib})"
    return acc


_HASH_SAMPLE_PPM = 250_000  # ~25% of documents

_HASH_SAMPLE_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE CAST({_hex12_sql('md5(CAST(doc_id AS VARCHAR))')} AS HUGEINT) * 1000000
      < CAST({_HASH_SAMPLE_PPM} AS HUGEINT) * CAST(281474976710656 AS HUGEINT)
"""


@query("sample_documents_hash", oracle=_HASH_SAMPLE_ORACLE)
def q_sample_documents_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% Bernoulli sample of documents: membership is an
    exact integer compare on md5(doc_id) — reproducible across engines and
    stable under corpus growth (a row's membership depends only on its own
    id); nested with any other fraction (see operators/sampling.py)."""
    from data_validator_guard_spark.operators.sampling import hash_sample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_sample(docs, "doc_id", _HASH_SAMPLE_PPM)


_STRAT_SAMPLE_ORACLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 20
"""


@query("stratified_sample_langs", oracle=_STRAT_SAMPLE_ORACLE)
def q_stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(20, |stratum|) documents per language: the 20 smallest
    md5(doc_id) within each lang — one shuffle on the stratum key, window
    state bounded by the largest stratum."""
    from data_validator_guard_spark.operators.sampling import stratified_sample_n

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample_n(docs, "lang", "doc_id", 20)


_QUANTILES_ORACLE = """
WITH hist AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS v, COUNT(*) AS n
  FROM documents WHERE text IS NOT NULL GROUP BY lang, v
),
cum AS (
  SELECT lang, v,
         SUM(n) OVER (PARTITION BY lang ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf,
         SUM(n) OVER (PARTITION BY lang) AS tot
  FROM hist
)
SELECT lang,
       CAST(MAX(tot) AS BIGINT) AS n_rows,
       CAST(MIN(CASE WHEN cf >= (tot * 50 + 99) // 100 THEN v END) AS BIGINT) AS q50,
       CAST(MIN(CASE WHEN cf >= (tot * 90 + 99) // 100 THEN v END) AS BIGINT) AS q90,
       CAST(MIN(CASE WHEN cf >= (tot * 99 + 99) // 100 THEN v END) AS BIGINT) AS q99
FROM cum GROUP BY lang
"""


@query("doc_length_quantiles", oracle=_QUANTILES_ORACLE)
def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language p50/p90/p99 of content length WITHOUT any row
    sort: (lang, length) count histogram first, then the smallest value
    whose running count reaches ceil(q% * n) — the type-1 quantile, same
    shape discipline as key_skew_profile (the window runs over the tiny
    histogram, never the corpus)."""
    from data_validator_guard_spark.operators.sampling import (
        grouped_exact_quantiles,
    )

    docs = read_table(spark, sf_dir, "documents")
    return grouped_exact_quantiles(docs, "lang", F.length("text"), (50, 90, 99))


# =====================================================================
# 27. Mixture sampling (data mixing): per-group hash_sample rates — the
#     "60% web / 30% code / 5% rest" primitive. Pure per-row membership,
#     zero shuffles; each group's sample is exactly hash_sample at that
#     group's rate (nested, growth-stable, re-weighting one group never
#     touches another's rows).
# =====================================================================
_MIXTURE_PPM = {"src0": 800_000, "src1": 500_000, "src2": 200_000}
_MIXTURE_DEFAULT_PPM = 100_000

_MIXTURE_ORACLE = f"""
SELECT doc_id, source
FROM documents
WHERE CAST({_hex12_sql('md5(CAST(doc_id AS VARCHAR))')} AS HUGEINT) * 1000000
      < CAST(CASE source WHEN 'src0' THEN 800000 WHEN 'src1' THEN 500000
                         WHEN 'src2' THEN 200000 ELSE 100000 END AS HUGEINT)
        * CAST(281474976710656 AS HUGEINT)
"""


@query("mixture_sample_sources", oracle=_MIXTURE_ORACLE)
def q_mixture_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted mixture over `source`: 80% of src0, 50% of
    src1, 20% of src2, 10% of everything else — one CASE-chain rate lookup
    fused into the scan, membership decided by the same exact md5 integer
    compare as hash_sample."""
    from data_validator_guard_spark.operators.sampling import mixture_sample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_sample(docs, "source", "doc_id", _MIXTURE_PPM, _MIXTURE_DEFAULT_PPM)
