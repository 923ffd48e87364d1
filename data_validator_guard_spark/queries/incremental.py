"""Snapshot-centric workflows: verdict regression diff across runs and
snapshot-diff incremental validation (verdicts + violations).

Split out of the original single-file registry (round-5 verdict item #7);
sections moved verbatim, registration order preserved per family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from data_validator_guard_spark.engine import validate
from data_validator_guard_spark.rules import Rule
from data_validator_guard_spark.rules import RuleSuite
from data_validator_guard_spark.sources import read_table
from data_validator_guard_spark.queries._registry import ALLOWED_DOC_LANGS
from data_validator_guard_spark.queries._registry import query

# =====================================================================
# 38. Verdict regression diff across two snapshots (operators/compare.py):
#     snapshot A = even doc_ids, snapshot B = all docs (zh rows planted in
#     the odd half change FK counts; count drift + appearances covered).
# =====================================================================
@query(
    "verdict_regressions",
    oracle="""
WITH a AS (
  SELECT 'lang_fk' AS rule_id, '__all__' AS "partition",
         SUM(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr') THEN 1 ELSE 0 END) = 0 AS pass,
         CAST(SUM(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr') THEN 1 ELSE 0 END) AS BIGINT) AS nv
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'text_not_blank', '__all__',
         SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) = 0,
         CAST(SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents WHERE doc_id % 2 = 0
),
b AS (
  SELECT 'lang_fk' AS rule_id, '__all__' AS "partition",
         SUM(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr') THEN 1 ELSE 0 END) = 0 AS pass,
         CAST(SUM(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr') THEN 1 ELSE 0 END) AS BIGINT) AS nv
  FROM documents
  UNION ALL
  SELECT 'text_not_blank', '__all__',
         SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) = 0,
         CAST(SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
)
SELECT a.rule_id, a."partition",
       CASE WHEN a.pass AND NOT b.pass THEN 'regression'
            WHEN NOT a.pass AND b.pass THEN 'recovery'
            WHEN a.nv <> b.nv THEN 'count_drift' END AS status,
       a.pass AS pass_before, b.pass AS pass_after,
       a.nv AS n_violations_before, b.nv AS n_violations_after
FROM a JOIN b ON a.rule_id = b.rule_id AND a."partition" = b."partition"
WHERE CASE WHEN a.pass AND NOT b.pass THEN 'regression'
           WHEN NOT a.pass AND b.pass THEN 'recovery'
           WHEN a.nv <> b.nv THEN 'count_drift' END IS NOT NULL
""",
)
def q_verdict_regressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.compare import compare_verdicts

    docs = read_table(spark, sf_dir, "documents")
    dim = spark.createDataFrame([(l,) for l in ALLOWED_DOC_LANGS], "lang string")
    suite = RuleSuite(
        "documents_diff",
        [
            Rule("text_not_blank", "not_blank", ("text",)),
            Rule("lang_fk", "foreign_key", ("lang",), {"dim": dim, "inline": True}),
        ],
        key_cols=("doc_id",),
    )
    before, _ = validate(docs.filter(F.col("doc_id") % 2 == 0), suite)
    after, _ = validate(docs, suite)
    return compare_verdicts(before, after)


# =====================================================================
# 28. Snapshot-diff incremental validation (operators/snapshot_diff.py):
#     fingerprint both snapshots per partition (one narrow agg each),
#     re-validate ONLY partitions whose fingerprint changed, carry prior
#     verdicts elsewhere. The oracle recomputes the fingerprints
#     (md5-half sums, HUGEINT-exact) and the merged verdict frame,
#     including which partitions were recomputed.
# =====================================================================
def _hexn_sql(hash_expr: str, start: int, n: int) -> str:
    """Horner expansion of hex nibbles [start, start+n) of a DuckDB md5()
    hex string as a BIGINT (generalizes ``_hex12_sql`` to an offset)."""
    acc = "CAST(0 AS BIGINT)"
    for i in range(start, start + n):
        nib = f"(strpos('0123456789abcdef', substr({hash_expr}, {i}, 1)) - 1)"
        acc = f"({acc} * 16 + {nib})"
    return acc


def _inc_field(expr: str) -> str:
    # per-field md5 with a value/NULL tag — the injection-proof row image
    # (mirrors snapshot_diff._row_image)
    return f"md5(CASE WHEN {expr} IS NULL THEN 'n:' ELSE 'v:' || CAST({expr} AS VARCHAR) END)"


_INC_IMG = (
    "md5("
    + " || ".join(
        _inc_field(c) for c in ["doc_id", "text", "lang", "source", "n_chars"]
    )
    + ")"
)

# shared by incremental_verdicts / incremental_violations / incremental_stats:
# the old/new snapshot pair (old = documents minus every 97th English row),
# both sides' per-partition fingerprints, and the changed-partition set.
_INC_CTE_PREFIX = f"""
WITH old AS (
  SELECT * FROM documents WHERE NOT (lang = 'en' AND doc_id % 97 = 0)
),
new AS (SELECT * FROM documents),
ofp AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS p, COUNT(*) AS n,
         SUM({_hexn_sql(_INC_IMG, 1, 12)}) AS slo,
         SUM({_hexn_sql(_INC_IMG, 13, 12)}) AS shi
  FROM old GROUP BY 1
),
nfp AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS p, COUNT(*) AS n,
         SUM({_hexn_sql(_INC_IMG, 1, 12)}) AS slo,
         SUM({_hexn_sql(_INC_IMG, 13, 12)}) AS shi
  FROM new GROUP BY 1
),
chg AS (
  SELECT COALESCE(o.p, n.p) AS p
  FROM ofp o FULL OUTER JOIN nfp n ON o.p = n.p
  WHERE o.n IS DISTINCT FROM n.n
     OR o.slo IS DISTINCT FROM n.slo
     OR o.shi IS DISTINCT FROM n.shi
)"""

_INCREMENTAL_ORACLE = f"""{_INC_CTE_PREFIX},
t AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS p,
         doc_id % 50 AS k, text, n_chars
  FROM new
),
dup AS (
  SELECT p, CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_dup FROM (
    SELECT p, COUNT(*) AS n FROM t GROUP BY p, k HAVING COUNT(*) > 1
  ) d GROUP BY p
),
tot AS (
  SELECT p, COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
         CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars < 1 OR n_chars > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_range
  FROM t GROUP BY p
),
v AS (
  SELECT 'text_not_blank' AS rule_id, p, n_blank = 0 AS pass, n_rows,
         n_blank AS n_violations FROM tot
  UNION ALL SELECT 'nchars_range', p, n_range = 0, n_rows, n_range FROM tot
  UNION ALL SELECT 'min_rows_10', p, n_rows >= 10, n_rows,
         CAST(CASE WHEN n_rows >= 10 THEN 0 ELSE 1 END AS BIGINT) FROM tot
  UNION ALL SELECT 'k_unique', tot.p, COALESCE(dup.n_dup, 0) = 0, tot.n_rows,
         CAST(COALESCE(dup.n_dup, 0) AS BIGINT)
  FROM tot LEFT JOIN dup ON dup.p = tot.p
)
SELECT rule_id, p AS "partition", pass, n_rows, n_violations,
       p IN (SELECT p FROM chg) AS recomputed
FROM v
"""


def _inc_frames(spark: SparkSession, sf_dir: str):
    """The shared incremental scenario: old = documents minus every 97th
    English row, new = the full table (one partition's fingerprint flips),
    plus the rule suite both incremental queries validate."""
    docs = read_table(spark, sf_dir, "documents")
    new = docs.withColumn("k", F.col("doc_id") % 50)
    old = new.filter(~((F.col("lang") == "en") & (F.col("doc_id") % 97 == 0)))
    suite = RuleSuite(
        name="documents_incremental",
        rules=[
            Rule("text_not_blank", "not_blank", ("text",)),
            Rule("nchars_range", "min_max", ("n_chars",), {"lo": 1, "hi": 1000000}),
            Rule("min_rows_10", "min_rows", (), {"n": 10}),
            Rule("k_unique", "unique", ("k",)),
        ],
        partition_by="lang",
        key_cols=("doc_id",),
    )
    return old, new, suite


@query("incremental_verdicts", oracle=_INCREMENTAL_ORACLE)
def q_incremental_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-incremental validation: the 'old' snapshot is `documents`
    minus a handful of English rows (every 97th), the 'new' snapshot is
    the full table — so exactly ONE partition's fingerprint changes.
    `incremental_validate` re-scans only that partition and carries every
    other verdict from the prior run; `recomputed` records which is which.
    The oracle replays the fingerprint arithmetic (two 48-bit md5-half
    sums, HUGEINT-exact), the changed-set diff, and the merged frame."""
    from data_validator_guard_spark.operators.snapshot_diff import (
        incremental_validate,
    )

    old, new, suite = _inc_frames(spark, sf_dir)
    return incremental_validate(
        old,
        new,
        suite,
        fingerprint_cols=["doc_id", "text", "lang", "source", "n_chars"],
    )


_INC_VIOLATIONS_ORACLE = f"""{_INC_CTE_PREFIX},
t AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS p,
         doc_id, doc_id % 50 AS k, text, n_chars
  FROM new
),
v AS (
  SELECT 'text_not_blank' AS rule_id, p, CAST(doc_id AS VARCHAR) AS keys,
         'text is blank' AS detail
  FROM t WHERE text IS NULL OR trim(text) = ''
  UNION ALL
  SELECT 'nchars_range', p, CAST(doc_id AS VARCHAR),
         'n_chars outside [1, 1000000]: ' || COALESCE(CAST(n_chars AS VARCHAR), 'NULL')
  FROM t WHERE n_chars IS NULL OR n_chars < 1 OR n_chars > 1000000
  UNION ALL
  SELECT 'k_unique', p, CAST(k AS VARCHAR),
         'duplicate key x' || CAST(COUNT(*) AS VARCHAR)
  FROM t GROUP BY p, k HAVING COUNT(*) > 1
)
SELECT rule_id, p AS "partition", keys, detail,
       p IN (SELECT p FROM chg) AS recomputed
FROM v
"""


@query("incremental_violations", oracle=_INC_VIOLATIONS_ORACLE)
def q_incremental_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The violations side of the same incremental run (round-4 verdict #1):
    changed partitions' violation rows are recomputed from the new snapshot,
    unchanged partitions' rows are carried from the prior run — every rule
    family is partition-local, so the merge is bit-identical to a full
    re-run (the oracle computes exactly that full frame + the recomputed
    tag from the fingerprint diff)."""
    from data_validator_guard_spark.operators.snapshot_diff import (
        incremental_validate_full,
    )

    old, new, suite = _inc_frames(spark, sf_dir)
    _, violations = incremental_validate_full(
        old,
        new,
        suite,
        fingerprint_cols=["doc_id", "text", "lang", "source", "n_chars"],
    )
    return violations


_INC_STATS_ORACLE = f"""{_INC_CTE_PREFIX},
t AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS p,
         source, CAST(n_chars AS VARCHAR) AS n_chars_s
  FROM new
),
s AS (
  SELECT p, col AS "column", COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         CAST(SUM(CASE WHEN v IS NULL OR trim(v) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
         MIN(v) AS min_val, MAX(v) AS max_val,
         CAST(SUM(COALESCE(length(v), 0)) AS BIGINT) AS sum_len
  FROM (
    SELECT p, 'source' AS col, source AS v FROM t
    UNION ALL
    SELECT p, 'n_chars', n_chars_s FROM t
  )
  GROUP BY p, col
)
SELECT p AS "partition", "column", n_rows, n_null, n_blank,
       min_val, max_val, sum_len,
       p IN (SELECT p FROM chg) AS recomputed
FROM s
"""


@query("incremental_stats", oracle=_INC_STATS_ORACLE)
def q_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stats twin of incremental_verdicts (round-4 verdict #3):
    per-partition mergeable stat partials where only the changed
    partition's stats are recomputed from the new snapshot and every other
    partition's partials are carried from the prior run. The HLL sketch is
    exercised by the pytest parity check (merge equals full recompute);
    the oracle checks every SQL-expressible measure plus the recomputed
    tag."""
    from data_validator_guard_spark.operators.snapshot_diff import (
        incremental_column_stats,
    )

    old, new, _suite = _inc_frames(spark, sf_dir)
    partials = incremental_column_stats(
        old,
        new,
        columns=["source", "n_chars"],
        partition_by="lang",
        fingerprint_cols=["doc_id", "text", "lang", "source", "n_chars"],
    )
    return partials.select(
        "partition", "column", "n_rows", "n_null", "n_blank",
        "min_val", "max_val", "sum_len", "recomputed",
    )


# =====================================================================
# 75. Incremental drift (round 5): the drift twin of incremental_verdicts
#     — a fused drift rule (baseline = the old snapshot's per-lang
#     histogram) rides the same fingerprint-diff machinery, so only the
#     changed partition's histogram is re-scanned. Unchanged partitions
#     carry the prior run's verdict, whose PSI is EXACTLY 0.0 (their
#     current counts equal the baseline's bit for bit), while the changed
#     'en' partition recomputes to PSI ~ (1/97)^2 >> the 1e-6 threshold.
# =====================================================================
_IDRIFT_EDGES = [0.0, 128.0, 192.0, 256.0, 384.0, 512.0]
_IDRIFT_EPS = 1e-6
_IDRIFT_BUCKET = (
    f"CASE WHEN n_chars < {_IDRIFT_EDGES[0]} THEN -1 "
    + " ".join(
        f"WHEN n_chars < {_IDRIFT_EDGES[i]} THEN {i - 1}"
        for i in range(1, len(_IDRIFT_EDGES))
    )
    + f" ELSE {len(_IDRIFT_EDGES) - 1} END"
)

_INC_DRIFT_ORACLE = f"""{_INC_CTE_PREFIX},
lp AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS p, n_chars, text FROM new
),
lob AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS p, n_chars FROM old
),
curh AS (SELECT p, {_IDRIFT_BUCKET} AS bucket, COUNT(*) AS nc FROM lp GROUP BY 1, 2),
baseh AS (SELECT p, {_IDRIFT_BUCKET} AS bucket, COUNT(*) AS nb FROM lob GROUP BY 1, 2),
jh AS (
  SELECT c.p, c.bucket, c.nc, COALESCE(b.nb, 0) AS nb
  FROM curh c LEFT JOIN baseh b ON b.p = c.p AND b.bucket = c.bucket
),
tot AS (SELECT p, SUM(nc) AS tc, SUM(nb) AS tb FROM jh GROUP BY p),
psi AS (
  SELECT jh.p,
         SUM((CAST(nc AS DOUBLE) / t.tc + {_IDRIFT_EPS}
              - CAST(nb AS DOUBLE) / t.tb - {_IDRIFT_EPS})
             * ln((CAST(nc AS DOUBLE) / t.tc + {_IDRIFT_EPS})
                  / (CAST(nb AS DOUBLE) / t.tb + {_IDRIFT_EPS}))) AS psi
  FROM jh JOIN tot t ON t.p = jh.p GROUP BY jh.p
),
nrows AS (
  SELECT p, COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank
  FROM lp GROUP BY p
)
SELECT 'length_drift' AS rule_id, nrows.p AS "partition",
       psi.psi <= {_IDRIFT_EPS} AS pass, n_rows,
       CAST(CASE WHEN psi.psi > {_IDRIFT_EPS} THEN 1 ELSE 0 END AS BIGINT) AS n_violations,
       nrows.p IN (SELECT p FROM chg) AS recomputed
FROM nrows JOIN psi ON psi.p = nrows.p
UNION ALL
SELECT 'text_not_blank', p, n_blank = 0, n_rows, n_blank,
       p IN (SELECT p FROM chg)
FROM nrows
"""


@query("incremental_drift", oracle=_INC_DRIFT_ORACLE)
def q_incremental_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental drift detection: same old/new snapshot pair as
    incremental_verdicts; the suite carries a fused drift rule (the
    north-rule shape — its current histogram falls out of the totals scan)
    whose baseline is the OLD snapshot's per-lang n_chars histogram, plus
    a row rule riding the same pass. The drift threshold (1e-6) sits two
    orders of magnitude below the changed partition's PSI (~(1/97)^2) and
    infinitely above the carried partitions' exact 0.0."""
    from data_validator_guard_spark.operators.drift import histogram
    from data_validator_guard_spark.operators.snapshot_diff import (
        incremental_validate,
    )

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "langp", F.coalesce(F.col("lang").cast("string"), F.lit("__null__"))
    )
    new = docs
    old = new.filter(~((F.col("lang") == "en") & (F.col("doc_id") % 97 == 0)))
    baseline = histogram(old, "langp", F.col("n_chars"), _IDRIFT_EDGES)
    suite = RuleSuite(
        name="documents_incremental_drift",
        rules=[
            Rule("text_not_blank", "not_blank", ("text",)),
            Rule(
                "length_drift",
                "drift",
                (),
                {
                    "group_by": "langp",
                    "value": "n_chars",
                    "edges": _IDRIFT_EDGES,
                    "baseline": baseline,
                    "threshold": _IDRIFT_EPS,
                },
            ),
        ],
        partition_by="langp",
        key_cols=("doc_id",),
    )
    return incremental_validate(
        old,
        new,
        suite,
        fingerprint_cols=["doc_id", "text", "lang", "source", "n_chars"],
    )


# =====================================================================
# 28b. Row-level snapshot diff (round 5): the CDC companion to the
#      partition-level fingerprint diff above — WHICH keys were added /
#      deleted / changed between two snapshots, multiset-exact, derived
#      from the snapshots themselves (no table-format changelog needed).
#      Scenario: old = documents minus the en/%97 rows (those become
#      'added'), with every %41 doc's text edited (those become
#      'changed'), plus synthetic +500000 rows (those become 'deleted').
# =====================================================================
_RD_IMG = (
    "md5("
    + " || ".join(_inc_field(c) for c in ["text", "lang", "source", "n_chars"])
    + ")"
)

_ROW_DIFF_ORACLE = f"""
WITH old AS (
  SELECT doc_id,
         CASE WHEN doc_id % 41 = 0 THEN text || ' OLDVER' ELSE text END AS text,
         lang, source, n_chars
  FROM documents WHERE NOT (lang = 'en' AND doc_id % 97 = 0)
  UNION ALL
  SELECT doc_id + 500000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 53 = 0
),
new AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
oagg AS (
  SELECT doc_id, COUNT(*) AS n,
         SUM({_hexn_sql(_RD_IMG, 1, 12)}) AS slo,
         SUM({_hexn_sql(_RD_IMG, 13, 12)}) AS shi
  FROM old GROUP BY doc_id
),
nagg AS (
  SELECT doc_id, COUNT(*) AS n,
         SUM({_hexn_sql(_RD_IMG, 1, 12)}) AS slo,
         SUM({_hexn_sql(_RD_IMG, 13, 12)}) AS shi
  FROM new GROUP BY doc_id
),
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'deleted'
              WHEN o.n <> n.n OR o.slo <> n.slo OR o.shi <> n.shi THEN 'changed'
         END AS change,
         CAST(COALESCE(o.n, 0) AS BIGINT) AS n_old,
         CAST(COALESCE(n.n, 0) AS BIGINT) AS n_new
  FROM oagg o FULL OUTER JOIN nagg n ON o.doc_id = n.doc_id
)
SELECT doc_id, change, n_old, n_new FROM j WHERE change IS NOT NULL
"""


@query("snapshot_row_diff", oracle=_ROW_DIFF_ORACLE)
def q_snapshot_row_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which doc_ids changed between snapshots and how — `row_diff` over
    (old, new) keyed by doc_id, fingerprinting (text, lang, source,
    n_chars). One hash agg per side + a co-partitioned full-outer join;
    the result is change-sized. The ledger stores this next to the
    partition fingerprints so a daily run can name the rows it re-certified,
    not just the partitions."""
    from data_validator_guard_spark.operators.snapshot_diff import row_diff

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    docs = read_table(spark, sf_dir, "documents").select(*cols)
    base = docs.filter(~((F.col("lang") == "en") & (F.col("doc_id") % 97 == 0)))
    old_mod = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 41 == 0, F.concat(F.col("text"), F.lit(" OLDVER"))
        ).otherwise(F.col("text")),
    )
    extra = docs.filter(F.col("doc_id") % 53 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    old = old_mod.select(*cols).unionByName(extra)
    return row_diff(old, docs, ["doc_id"], ["text", "lang", "source", "n_chars"])
