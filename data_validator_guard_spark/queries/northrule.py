"""The north-rule table shape from BASELINE.json input_hint, oracle-
gated end to end.

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
from data_validator_guard_spark.queries._registry import query

# =====================================================================
# 26. The north-rule table shape, oracle-gated (BASELINE.json input_hint:
#     repo, path, commit, lang, content). bench.py validates this shape at
#     8M rows via synth.source_code_table (xxhash64 — fast, JVM-only);
#     here the SAME rule suite runs over a table derived from `documents`
#     with engine-portable expressions only (md5 / modulo / concat), so
#     DuckDB replays the derivation AND the full per-partition verdict +
#     violation contract bit for bit. Defects are planted at known moduli
#     exactly like synth.py plants them (FIXTURES.md §1): duplicates every
#     97th row, bad paths every 61st, bad commits 2/83, bad langs 2/71.
# =====================================================================
_CODE_LANGS = ("de", "en", "es", "fr")
_PATH_PATTERN_PORTABLE = r"^[A-Za-z0-9_./-]+\.[A-Za-z0-9]+$"  # RE2-safe: no lookahead
_TRAVERSAL_PATTERN = r"\.\."
_COMMIT_PATTERN = "^[0-9a-f]{40}$"
# partition: repo-hash bucket (north rule's explicit repartitioning key),
# 16 buckets from the first md5 nibble — portable to any engine.
_CODE_PARTITION = "instr('0123456789abcdef', substr(md5(repo), 1, 1)) - 1"

# The derivation, shared by both queries' oracles (DuckDB SQL). `commit`
# is quoted everywhere — it is a bare keyword in DuckDB.
_CODE_TABLE_SQL = """
k AS (
  SELECT CASE WHEN doc_id % 97 = 0 AND doc_id > 0 THEN doc_id - 1 ELSE doc_id END AS kid,
         doc_id, lang AS orig_lang, text
  FROM documents
),
e AS (
  SELECT kid, doc_id, orig_lang, text,
         CASE CAST(kid % 4 AS INT) WHEN 0 THEN 'py' WHEN 1 THEN 'java'
              WHEN 2 THEN 'rs' ELSE 'go' END AS ext,
         md5(CAST(kid AS VARCHAR)) || substr(md5('c2:' || CAST(kid AS VARCHAR)), 1, 8) AS ch
  FROM k
),
c AS (
  SELECT
    CASE WHEN kid % 10 < 3 THEN 'org0/hot-repo'
         ELSE 'org' || CAST(kid % 7 AS VARCHAR) || '/repo' || CAST(kid % 41 AS VARCHAR)
    END AS repo,
    CASE WHEN kid % 61 = 0 THEN ''
         WHEN kid % 61 = 1 THEN NULL
         WHEN kid % 61 = 2 THEN 'src/../up/f' || CAST(kid AS VARCHAR) || '.' || ext
         ELSE 'src/d' || CAST(kid % 17 AS VARCHAR) || '/f' || CAST(kid AS VARCHAR) || '.' || ext
    END AS path,
    CASE WHEN kid % 83 = 5 THEN upper(ch)
         WHEN kid % 83 = 6 THEN substr(ch, 1, 39)
         ELSE ch
    END AS "commit",
    CASE WHEN doc_id % 71 = 0 THEN 'xx'
         WHEN doc_id % 71 = 1 THEN NULL
         ELSE orig_lang
    END AS lang,
    text AS content
  FROM e
),
t AS (
  SELECT c.*,
         CAST(strpos('0123456789abcdef', substr(md5(repo), 1, 1)) - 1 AS VARCHAR) AS p
  FROM c
)
"""


def _code_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (repo, path, commit, lang, content) table, derived from
    `documents` with portable expressions (the Spark twin of
    ``_CODE_TABLE_SQL``). Narrow per-row projection — fuses into the scan."""
    d = read_table(spark, sf_dir, "documents")
    kid = F.when(
        (F.col("doc_id") % 97 == 0) & (F.col("doc_id") > 0), F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    ks = kid.cast("string")
    repo = F.when(kid % 10 < 3, F.lit("org0/hot-repo")).otherwise(
        F.concat(
            F.lit("org"), (kid % 7).cast("string"),
            F.lit("/repo"), (kid % 41).cast("string"),
        )
    )
    ext = (
        F.when(kid % 4 == 0, F.lit("py"))
        .when(kid % 4 == 1, F.lit("java"))
        .when(kid % 4 == 2, F.lit("rs"))
        .otherwise(F.lit("go"))
    )
    good_path = F.concat(
        F.lit("src/d"), (kid % 17).cast("string"), F.lit("/f"), ks, F.lit("."), ext
    )
    path = (
        F.when(kid % 61 == 0, F.lit(""))
        .when(kid % 61 == 1, F.lit(None).cast("string"))
        .when(kid % 61 == 2, F.concat(F.lit("src/../up/f"), ks, F.lit("."), ext))
        .otherwise(good_path)
    )
    ch = F.concat(F.md5(ks), F.substring(F.md5(F.concat(F.lit("c2:"), ks)), 1, 8))
    commit = (
        F.when(kid % 83 == 5, F.upper(ch))
        .when(kid % 83 == 6, F.substring(ch, 1, 39))
        .otherwise(ch)
    )
    lang = (
        F.when(F.col("doc_id") % 71 == 0, F.lit("xx"))
        .when(F.col("doc_id") % 71 == 1, F.lit(None).cast("string"))
        .otherwise(F.col("lang"))
    )
    return d.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        F.col("text").alias("content"),
    )


def _code_suite(rules: list[Rule]) -> RuleSuite:
    return RuleSuite(
        name="source_code_portable",
        rules=rules,
        partition_by=_CODE_PARTITION,
        key_cols=("repo", "path", "commit"),
    )


_VERDICTS_CODE_ORACLE = (
    "WITH "
    + _CODE_TABLE_SQL
    + r""",
tot AS (
  SELECT p, COUNT(*) AS n_rows,
    CAST(SUM(CASE WHEN path IS NULL OR trim(path) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_pblank,
    CAST(SUM(CASE WHEN path IS NULL OR NOT regexp_matches(path, '^[A-Za-z0-9_./-]+\.[A-Za-z0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_ppat,
    CAST(SUM(CASE WHEN path IS NOT NULL AND regexp_matches(path, '\.\.') THEN 1 ELSE 0 END) AS BIGINT) AS n_trav,
    CAST(SUM(CASE WHEN "commit" IS NULL OR NOT regexp_matches("commit", '^[0-9a-f]{40}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_commit,
    CAST(SUM(CASE WHEN content IS NULL OR trim(content) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_cblank,
    CAST(SUM(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr') THEN 1 ELSE 0 END) AS BIGINT) AS n_fk,
    CAST(SUM(CASE WHEN lang IS NULL OR trim(lang) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_lblank,
    COUNT(DISTINCT lang) AS n_langs
  FROM t GROUP BY p
),
dup AS (
  SELECT p, CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_dup FROM (
    SELECT p, COUNT(*) AS n FROM t GROUP BY p, repo, path, "commit" HAVING COUNT(*) > 1
  ) d GROUP BY p
)
SELECT 'path_not_blank' AS rule_id, p AS "partition", n_pblank = 0 AS pass,
       n_rows, n_pblank AS n_violations FROM tot
UNION ALL SELECT 'path_pattern', p, n_ppat = 0, n_rows, n_ppat FROM tot
UNION ALL SELECT 'path_no_traversal', p, n_trav = 0, n_rows, n_trav FROM tot
UNION ALL SELECT 'commit_pattern', p, n_commit = 0, n_rows, n_commit FROM tot
UNION ALL SELECT 'content_not_blank', p, n_cblank = 0, n_rows, n_cblank FROM tot
UNION ALL SELECT 'lang_fk', p, n_fk = 0, n_rows, n_fk FROM tot
UNION ALL SELECT 'lang_null_rate', p, CAST(n_lblank AS DOUBLE) / n_rows <= 0.02,
       n_rows, n_lblank FROM tot
UNION ALL SELECT 'lang_cardinality', p, n_langs BETWEEN 1 AND 64, n_rows,
       CAST(CASE WHEN n_langs BETWEEN 1 AND 64 THEN 0 ELSE 1 END AS BIGINT) FROM tot
UNION ALL SELECT 'file_identity_unique', tot.p, COALESCE(dup.n_dup, 0) = 0,
       tot.n_rows, CAST(COALESCE(dup.n_dup, 0) AS BIGINT)
FROM tot LEFT JOIN dup ON dup.p = tot.p
"""
)


@query("verdicts_code", oracle=_VERDICTS_CODE_ORACLE)
def q_verdicts_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule flagship contract, oracle-gated end to end: per-
    (rule, repo-hash-bucket) verdicts over the (repo, path, commit, lang,
    content) shape — regex conformance on path/commit, traversal ban,
    uniqueness on the (repo, path, commit) identity (salted two-phase at
    scale), inline-dim referential on lang, null-rate and exact-cardinality
    column stats. Same engine path bench.py's validate_synth measures at
    8M rows; here every counter is replayed in DuckDB."""
    code = _code_table(spark, sf_dir)
    dim = spark.createDataFrame([(l,) for l in _CODE_LANGS], "lang string")
    suite = _code_suite(
        [
            Rule("path_not_blank", "not_blank", ("path",)),
            Rule("path_pattern", "regex_match", ("path",), {"pattern": _PATH_PATTERN_PORTABLE}),
            Rule("path_no_traversal", "no_regex_match", ("path",), {"pattern": _TRAVERSAL_PATTERN}),
            Rule("commit_pattern", "regex_match", ("commit",), {"pattern": _COMMIT_PATTERN}),
            Rule("content_not_blank", "not_blank", ("content",)),
            Rule("lang_fk", "foreign_key", ("lang",), {"dim": dim, "inline": True}),
            Rule("lang_null_rate", "null_rate_max", ("lang",), {"max_rate": 0.02}),
            Rule("lang_cardinality", "cardinality_range", ("lang",), {"lo": 1, "hi": 64, "exact": True}),
            Rule("file_identity_unique", "unique", ("repo", "path", "commit")),
        ],
    )
    verdicts, _ = validate(code, suite)
    return verdicts


_VIOLATIONS_CODE_ORACLE = (
    "WITH "
    + _CODE_TABLE_SQL
    + r"""
SELECT 'commit_pattern' AS rule_id, p AS "partition",
       concat_ws('|', repo, path, "commit") AS keys,
       'commit !~ ^[0-9a-f]{40}$: ' || COALESCE("commit", 'NULL') AS detail
FROM t WHERE "commit" IS NULL OR NOT regexp_matches("commit", '^[0-9a-f]{40}$')
UNION ALL
SELECT 'path_no_traversal', p, concat_ws('|', repo, path, "commit"),
       'path ~ \.\.: ' || path
FROM t WHERE path IS NOT NULL AND regexp_matches(path, '\.\.')
UNION ALL
SELECT 'lang_fk', p, concat_ws('|', repo, path, "commit"),
       'unknown value in reference: ' || COALESCE(lang, 'NULL')
FROM t WHERE lang IS NULL OR lang NOT IN ('de','en','es','fr')
UNION ALL
SELECT 'file_identity_unique', p, concat_ws('|', repo, path, "commit"),
       'duplicate key x' || CAST(n AS VARCHAR)
FROM (SELECT p, repo, path, "commit", COUNT(*) AS n
      FROM t GROUP BY 1, 2, 3, 4 HAVING COUNT(*) > 1)
"""
)


@query("violations_code", oracle=_VIOLATIONS_CODE_ORACLE)
def q_violations_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The violation-rows side of the north-rule contract over the code
    shape: (rule_id, partition, keys, detail) with keys = the natural
    (repo, path, commit) identity — row-level regex + traversal + inline
    FK fused into ONE emit scan, plus the salted-unique fragment emitting
    one row per duplicated identity with its multiplicity."""
    code = _code_table(spark, sf_dir)
    dim = spark.createDataFrame([(l,) for l in _CODE_LANGS], "lang string")
    suite = _code_suite(
        [
            Rule("commit_pattern", "regex_match", ("commit",), {"pattern": _COMMIT_PATTERN}),
            Rule("path_no_traversal", "no_regex_match", ("path",), {"pattern": _TRAVERSAL_PATTERN}),
            Rule("lang_fk", "foreign_key", ("lang",), {"dim": dim, "inline": True}),
            Rule("file_identity_unique", "unique", ("repo", "path", "commit")),
        ],
    )
    _, violations = validate(code, suite)
    return violations


# =====================================================================
# Vendored-code detection (round 5): content hashes appearing in >= 2
# repos — the cross-repo duplication miner every source-code curation
# pipeline runs (vendored dependencies dominate naive per-file training
# weight). The corpus has no natural exact duplicates, so the query
# plants them deterministically in its own derivation (the dedup_semantic
# pattern): every doc_id % 11 == 0 file's content becomes one of five
# canonical "vendored blobs", spread across the kid-derived repos
# (including the 30% hot repo). One md5-keyed hash aggregation — uniform
# shuffle keys regardless of repo skew; count_distinct(repo) expands to
# Spark's standard two-phase distinct aggregate.
# =====================================================================
_VENDORED_ORACLE = """
WITH k AS (
  SELECT CASE WHEN doc_id % 97 = 0 AND doc_id > 0 THEN doc_id - 1 ELSE doc_id END AS kid,
         doc_id, text
  FROM documents
), v AS (
  SELECT
    CASE WHEN kid % 10 < 3 THEN 'org0/hot-repo'
         ELSE 'org' || CAST(kid % 7 AS VARCHAR) || '/repo' || CAST(kid % 41 AS VARCHAR)
    END AS repo,
    CASE WHEN doc_id % 11 = 0
         THEN 'VENDOR-BLOB-' || CAST(doc_id % 5 AS VARCHAR)
         ELSE text END AS content
  FROM k
)
SELECT md5(content) AS content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(COUNT(DISTINCT repo) AS BIGINT) AS n_repos,
       MIN(repo) AS first_repo,
       MAX(repo) AS last_repo
FROM v
WHERE content IS NOT NULL
GROUP BY content_hash
HAVING COUNT(DISTINCT repo) >= 2
"""


@query("vendored_content", oracle=_VENDORED_ORACLE)
def q_vendored_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-repo duplicated content (vendored-code miner) over the code
    shape: md5(content) groups with files in >= 2 distinct repos, with
    file/repo multiplicities and a first/last repo sample. Hash keys are
    uniform, so the aggregation shuffle is skew-free even though 30% of
    files live in one hot repo."""
    d = read_table(spark, sf_dir, "documents")
    kid = F.when(
        (F.col("doc_id") % 97 == 0) & (F.col("doc_id") > 0), F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    repo = F.when(kid % 10 < 3, F.lit("org0/hot-repo")).otherwise(
        F.concat(
            F.lit("org"), (kid % 7).cast("string"),
            F.lit("/repo"), (kid % 41).cast("string"),
        )
    )
    content = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(F.lit("VENDOR-BLOB-"), (F.col("doc_id") % 5).cast("string")),
    ).otherwise(F.col("text"))
    v = d.select(repo.alias("repo"), content.alias("content")).filter(
        F.col("content").isNotNull()
    )
    return (
        v.groupBy(F.md5("content").alias("content_hash"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.count_distinct("repo").cast("bigint").alias("n_repos"),
            F.min("repo").alias("first_repo"),
            F.max("repo").alias("last_repo"),
        )
        .filter(F.col("n_repos") >= 2)
    )


# =====================================================================
# License screen (round 5): The-Stack-style license gating over the code
# shape. Headers are planted deterministically (doc_id % 13 buckets) so
# the classifier has real positives; detection is ordered first-match on
# literal marker strings (contains — no regex engine differences), GPL
# checked before the permissive markers so dual-marked files classify
# conservatively. Pure per-row expression: fuses into the scan, zero
# shuffles; the ACT half is a trivial filter on is_permissive.
# =====================================================================
_LICENSE_ORACLE = """
WITH v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN 'MIT License' || chr(10) || text
              WHEN doc_id % 13 = 1 THEN 'Apache License, Version 2.0' || chr(10) || text
              WHEN doc_id % 13 = 2 THEN 'GNU General Public License' || chr(10) || text
              ELSE text END AS content
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
)
SELECT doc_id,
       CASE WHEN contains(content, 'GNU General Public License') THEN 'gpl'
            WHEN contains(content, 'MIT License') THEN 'mit'
            WHEN contains(content, 'Apache License, Version 2.0') THEN 'apache-2.0'
            ELSE 'unknown' END AS license,
       CASE WHEN contains(content, 'GNU General Public License') THEN FALSE
            WHEN contains(content, 'MIT License') THEN TRUE
            WHEN contains(content, 'Apache License, Version 2.0') THEN TRUE
            ELSE FALSE END AS is_permissive
FROM v
"""


@query("license_screen", oracle=_LICENSE_ORACLE)
def q_license_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file license classification over the code shape: ordered
    first-match on literal license markers (GPL before the permissive ones
    — dual-marked files classify conservatively), emitting (doc_id,
    license, is_permissive). A training-data curation job keeps
    is_permissive; unknown defaults to NOT permissive (the conservative
    Stack policy)."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    content = (
        F.when(F.col("doc_id") % 13 == 0, F.concat(F.lit("MIT License\n"), F.col("text")))
        .when(
            F.col("doc_id") % 13 == 1,
            F.concat(F.lit("Apache License, Version 2.0\n"), F.col("text")),
        )
        .when(
            F.col("doc_id") % 13 == 2,
            F.concat(F.lit("GNU General Public License\n"), F.col("text")),
        )
        .otherwise(F.col("text"))
    )
    from data_validator_guard_spark.operators.text import classify_license

    license_col, permissive = classify_license(content)
    return d.select(
        "doc_id", license_col.alias("license"), permissive.alias("is_permissive")
    )
