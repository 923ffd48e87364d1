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


# =====================================================================
# 28. Token-budget mixture sampling (round 5): budgets in TOKENS, not rows
#     — per source, keep documents in md5(doc_id) priority order until the
#     source's token budget is filled (minimal prefix reaching the budget).
#     The engine computes the running sum two-level (coarse hash-bucket
#     cumsum + a window bounded by one bucket's population — no task ever
#     sorts a whole source); the oracle is the naive single-window running
#     sum, which the two-level form provably equals for any bucketing.
# =====================================================================
_TOKEN_BUDGETS = {"src0": 800, "src1": 800, "src2": 800}
_TOKEN_BUDGET_DEFAULT = 250

_TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         COALESCE(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 0) AS n_tokens,
         {_hex12_sql("md5(CAST(doc_id AS VARCHAR))")} AS hpos
  FROM documents WHERE doc_id IS NOT NULL
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY hpos, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
FROM c
WHERE cum - n_tokens < CASE WHEN source IN ('src0', 'src1', 'src2')
                            THEN 800 ELSE 250 END
"""


@query("token_budget_sample", oracle=_TOKEN_BUDGET_ORACLE)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-budget mixture: 800 whitespace-tokens of src0/1/2, 250 of
    every other source, selected in deterministic md5(doc_id) priority order
    (the minimal prefix reaching each budget — overshoot < one document).
    Two-level running sum: bucket cumsum over a |sources| x 4096 frame, then
    a window partitioned by (source, bucket) — task state is one bucket's
    population, never a whole source."""
    from data_validator_guard_spark.operators.sampling import token_budget_sample
    from data_validator_guard_spark.operators.text import ws_token_count

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ws_token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    return token_budget_sample(
        docs, "source", "doc_id", F.col("n_tokens"), _TOKEN_BUDGETS, _TOKEN_BUDGET_DEFAULT
    )


# =====================================================================
# 29. Deterministic training order (round 5): shard + position assignment —
#     the "shuffle the corpus for training" primitive. Shard = hash mod
#     n_shards (one shuffle); position = rank within shard by (hash, id),
#     task state |corpus|/n_shards. A loader reading shards in index order
#     visits a fixed pseudo-random permutation, no RNG state anywhere.
# =====================================================================
_TRAINING_ORDER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_hex12_sql("md5(CAST(doc_id AS VARCHAR))")} AS hpos
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT doc_id,
       CAST(hpos % 16 AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hpos % 16 ORDER BY hpos, doc_id)
            AS BIGINT) AS position
FROM t
"""


@query("training_order", oracle=_TRAINING_ORDER_ORACLE)
def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order assignment over documents: 16 shards,
    position = rank within shard by (md5 position, id) — a reproducible
    corpus permutation without a global sort or any RNG."""
    from data_validator_guard_spark.operators.sampling import training_order

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    return training_order(docs, "doc_id", 16)
