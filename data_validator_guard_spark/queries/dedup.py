"""Deduplication family: exact, MinHash+LSH, n-gram Jaccard, SimHash,
embedding-cosine, cluster assignment, survivorship, size reports.

Split out of the original single-file registry (round-5 verdict item #7);
sections moved verbatim, registration order preserved per family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from data_validator_guard_spark.sources import read_table
from data_validator_guard_spark.queries._registry import query
from data_validator_guard_spark.operators.uniqueness import duplicate_keys

# =====================================================================
# 14. Deduplication family (operators/dedup.py). Near-dup queries run on
#     documents ∪ perturbed copies so the testdata (which has no planted
#     duplicates) exercises a non-empty result in both engines.
# =====================================================================
_NEAR_DUP_CTE = """
WITH docs AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' extra suffix tokens appended here', lang FROM documents
)
"""


def _docs_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pert = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix tokens appended here")).alias("text"),
        F.col("lang"),
    )
    return docs.unionByName(pert)


@query(
    "dedup_exact",
    oracle=r"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
)
SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM docs GROUP BY fp
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import exact_duplicates

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.unionByName(docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return exact_duplicates(dup, "text", "doc_id")


# CTE body shared by the pair query and the cluster query (the cluster oracle
# appends a recursive closure over the same verified pairs).
_MINHASH_CTES = (
    _NEAR_DUP_CTE
    + r""",
words AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), '\s+') AS w FROM docs),
sh AS (
  SELECT DISTINCT id,
         unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM words
),
sig AS (
  SELECT id,
         min(md5('0:' || shingle)) AS mh0, min(md5('1:' || shingle)) AS mh1,
         min(md5('2:' || shingle)) AS mh2, min(md5('3:' || shingle)) AS mh3,
         min(md5('4:' || shingle)) AS mh4, min(md5('5:' || shingle)) AS mh5,
         min(md5('6:' || shingle)) AS mh6, min(md5('7:' || shingle)) AS mh7
  FROM sh GROUP BY id
),
bands AS (
  SELECT id, 0 AS band, mh0 || '#' || mh1 AS val FROM sig
  UNION ALL SELECT id, 1, mh2 || '#' || mh3 FROM sig
  UNION ALL SELECT id, 2, mh4 || '#' || mh5 FROM sig
  UNION ALL SELECT id, 3, mh6 || '#' || mh7 FROM sig
),
cand AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val AND a.id < b.id
),
sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh s1 ON s1.id = c.id1
  JOIN sh s2 ON s2.id = c.id2 AND s2.shingle = s1.shingle
  GROUP BY c.id1, c.id2
),
verified AS (
  SELECT i.id1, i.id2,
         CAST(i.n_inter AS DOUBLE) / CAST(z1.sz + z2.sz - i.n_inter AS DOUBLE) AS jaccard
  FROM inter i JOIN sizes z1 ON z1.id = i.id1 JOIN sizes z2 ON z2.id = i.id2
  WHERE CAST(i.n_inter AS DOUBLE) / CAST(z1.sz + z2.sz - i.n_inter AS DOUBLE) >= 0.7
)
"""
)

_MINHASH_ORACLE = _MINHASH_CTES + "SELECT id1, id2, jaccard FROM verified"


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import minhash_near_duplicates

    dup = _docs_with_near_dups(spark, sf_dir)
    return minhash_near_duplicates(dup, "text", "doc_id", k=8, bands=4, n=3, threshold=0.7)


# =====================================================================
# 14b. Incremental near-dup (round 5): a NEW batch mined against the
#      already-built corpus signature/shingle store — shingle/sign the
#      batch only, band-join against the store, exclude store×store
#      pairs (already emitted when the store was built). The dedup twin
#      of incremental verdicts/stats. Oracle = the full-corpus MinHash
#      pipeline filtered to pairs touching >= 1 new id, which is exactly
#      the operator's parity contract.
# =====================================================================
_INCR_MINHASH_ORACLE = (
    _MINHASH_CTES
    + "SELECT id1, id2, jaccard FROM verified WHERE id1 >= 100000 OR id2 >= 100000"
)


@query("dedup_incremental", oracle=_INCR_MINHASH_ORACLE)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus = the original documents (store built once via
    build_signature_store); batch = the perturbed '+suffix' copies
    (doc_id + 100000). Result must equal the full-corpus run filtered to
    pairs with at least one batch id — per-batch cost stays proportional
    to the batch, never |corpus|² (reference re-runs whole tables per
    validation cycle, validation_flow.py; this is the scale path)."""
    from data_validator_guard_spark.operators.dedup import (
        build_signature_store,
        incremental_near_duplicates,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    batch = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix tokens appended here")).alias("text"),
        F.col("lang"),
    )
    sig, shingles = build_signature_store(docs, "text", "doc_id", k=8, n=3)
    return incremental_near_duplicates(
        batch, sig, shingles, "text", "doc_id", k=8, bands=4, n=3, threshold=0.7
    )


_NGRAM_ORACLE = (
    _NEAR_DUP_CTE
    + r""",
base AS (
  SELECT doc_id AS id, lang,
         CAST(floor(length(text) / 64) AS BIGINT) AS lb,
         regexp_split_to_array(trim(text), '\s+') AS w
  FROM docs
),
sh AS (
  SELECT DISTINCT id,
         unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM base
),
cand AS (
  SELECT a.id AS id1, b.id AS id2
  FROM base a JOIN base b ON a.lang = b.lang AND a.lb = b.lb AND a.id < b.id
),
sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh s1 ON s1.id = c.id1
  JOIN sh s2 ON s2.id = c.id2 AND s2.shingle = s1.shingle
  GROUP BY c.id1, c.id2
)
SELECT i.id1, i.id2,
       CAST(i.n_inter AS DOUBLE) / CAST(z1.sz + z2.sz - i.n_inter AS DOUBLE) AS jaccard
FROM inter i JOIN sizes z1 ON z1.id = i.id1 JOIN sizes z2 ON z2.id = i.id2
WHERE CAST(i.n_inter AS DOUBLE) / CAST(z1.sz + z2.sz - i.n_inter AS DOUBLE) >= 0.7
"""
)


@query("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import ngram_jaccard_duplicates

    dup = _docs_with_near_dups(spark, sf_dir)
    return ngram_jaccard_duplicates(
        dup, "text", "doc_id", block_cols=["lang"], length_bucket=64, n=3, threshold=0.7
    )


# =====================================================================
# 19. Normalized + suffix-normalized duplicate detection (A2/A3). Input
#     plants case/suffix variants so normalization is what finds them.
# =====================================================================
_NORM_DUP_CTE = """
WITH t AS (
  SELECT doc_id, source || '#' || CAST(doc_id AS VARCHAR) AS k FROM documents
  UNION ALL
  SELECT doc_id + 100000, ' ' || upper(source) || '#' || CAST(doc_id AS VARCHAR) || '_v'
  FROM documents
)
"""


@query(
    "normalized_duplicates",
    oracle=_NORM_DUP_CTE
    + r"""
SELECT upper(trim(regexp_replace(k, '[_-]?[vV]$', '', 'g'))) AS norm_key, COUNT(*) AS n
FROM t GROUP BY norm_key HAVING COUNT(*) > 1
""",
)
def q_normalized_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case/whitespace/version-suffix variants collapse to one key
    (general_validation.py:29-55 + maganamed_validation.py:136-155)."""
    from data_validator_guard_spark.functions import normalized, suffix_normalized
    from data_validator_guard_spark.operators.uniqueness import duplicate_keys

    docs = read_table(spark, sf_dir, "documents")
    k = F.concat(F.col("source"), F.lit("#"), F.col("doc_id").cast("string"))
    t = docs.select(k.alias("k")).unionByName(
        docs.select(
            F.concat(
                F.lit(" "), F.upper(F.col("source")), F.lit("#"),
                F.col("doc_id").cast("string"), F.lit("_v"),
            ).alias("k")
        )
    )
    normed = t.select(normalized(suffix_normalized(F.col("k"))).alias("norm_key"))
    return duplicate_keys(normed, ["norm_key"])


# =====================================================================
# 25. Embedding-cosine near-duplicates (dedup family, prompt-mandated):
#     integer-quantized LSH bucketing + exact integer threshold decision —
#     no float ever reaches a comparison, so the SQL oracle replicates the
#     operator bit-for-bit (HUGEINT there, decimal(38,0) here).
# =====================================================================
def _emb_neardup_oracle(threshold_cents: int = 90, n_planes: int = 4, scale: int = 1000) -> str:
    proj = lambda p: (  # noqa: E731
        f"list_sum(list_transform(generate_series(1, len(qv)), "
        f"d -> qv[d] * (((d*31 + {p * 17}) % 7) - 3)))"
    )
    bits = " || ".join(
        f"(CASE WHEN {proj(p)} >= 0 THEN '1' ELSE '0' END)" for p in range(n_planes)
    )
    t2 = threshold_cents * threshold_cents
    return f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
),
q AS (
  SELECT id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS qv
  FROM corpus
),
keyed AS (
  SELECT id, qv, {bits} AS bucket,
         list_sum(list_transform(qv, x -> x * x)) AS n2
  FROM q
),
pairs AS (
  SELECT a.id AS id1, b.id AS id2,
         list_sum(list_transform(generate_series(1, len(a.qv)),
                                 d -> a.qv[d] * b.qv[d])) AS dot,
         a.n2 AS na2, b.n2 AS nb2
  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.id < b.id
)
SELECT id1, id2 FROM pairs
WHERE dot > 0
  AND CAST(10000 AS HUGEINT) * CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT)
      >= CAST({t2} AS HUGEINT) * CAST(na2 AS HUGEINT) * CAST(nb2 AS HUGEINT)
"""


@query("dedup_embedding_cosine", oracle=_emb_neardup_oracle())
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import embedding_near_duplicates

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    return embedding_near_duplicates(corpus, "embedding", "vec_id", threshold_cents=90)


# =====================================================================
# 41. 64-bit SimHash near-dup with banded pairing (round-1 scale flag: a
#     16-bit signature space is quadratic-within-bucket at corpus scale).
#     Candidates share >= 1 exact 16-bit band; verification is exact
#     Hamming over the full 64-bit signature (DuckDB `hamming`).
# =====================================================================
_SIMHASH64_SUMS = ",\n".join(
    "    SUM(CASE WHEN strpos('89abcdef', substr({h}, {pos}, 1)) > 0 "
    "THEN 1 ELSE -1 END) AS s{j}".format(
        h="h0" if j < 32 else "h1", pos=(j % 32) + 1, j=j
    )
    for j in range(64)
)
_SIMHASH64_BITS_SQL = " || ".join(
    f"(CASE WHEN s{j} >= 0 THEN '1' ELSE '0' END)" for j in range(64)
)
_SIMHASH64_BANDS = "\n  UNION ALL ".join(
    f"SELECT id, simhash, {b} AS band, substr(simhash, {b * 16 + 1}, 16) AS val FROM sig"
    for b in range(4)
)

_SIMHASH64_ORACLE = (
    _NEAR_DUP_CTE
    + rf""",
tok AS (
  SELECT DISTINCT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM docs
),
h AS (SELECT id, md5('0:' || t) AS h0, md5('1:' || t) AS h1 FROM tok),
agg AS (
  SELECT id,
{_SIMHASH64_SUMS}
  FROM h GROUP BY id
),
sig AS (SELECT id, {_SIMHASH64_BITS_SQL} AS simhash FROM agg),
bands AS (
  {_SIMHASH64_BANDS}
),
cand AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2, a.simhash AS s1, b.simhash AS s2
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val AND a.id < b.id
)
SELECT id1, id2, CAST(hamming(s1, s2) AS BIGINT) AS hamming
FROM cand WHERE hamming(s1, s2) <= 4
"""
)


@query("dedup_simhash64", oracle=_SIMHASH64_ORACLE)
def q_dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import simhash_near_duplicates

    dup = _docs_with_near_dups(spark, sf_dir)
    return simhash_near_duplicates(dup, "text", "doc_id", bands=4, max_hamming=4)


# `dedup_simhash` (round-2 verdict #3): the public SimHash query now routes
# through the SAME 64-bit banded pairing over the plain documents table — the
# 16-bit signature operator is deleted (65,536 buckets → quadratic pairing at
# corpus scale). Name kept stable for the driver snapshot.
_SIMHASH_ORACLE = _SIMHASH64_ORACLE.replace(
    _NEAR_DUP_CTE, "WITH docs AS (SELECT doc_id, text, lang FROM documents)\n"
)


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import simhash_near_duplicates

    docs = read_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(docs, "text", "doc_id", bands=4, max_hamming=4)


# =====================================================================
# 42. Duplicate-cluster assignment: connected components over verified
#     MinHash near-dup pairs (min reachable doc_id = canonical survivor).
#     Spark side: distributed min-label propagation; oracle: recursive CTE
#     transitive closure over the SAME verified pairs.
# =====================================================================
_CLUSTERS_ORACLE = (
    _MINHASH_CTES.replace("WITH docs AS (", "WITH RECURSIVE docs AS (", 1)
    + """
, sym AS (
  SELECT id1 AS a, id2 AS b FROM verified
  UNION ALL
  SELECT id2, id1 FROM verified
),
nodes AS (SELECT DISTINCT doc_id AS id FROM docs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
)
SELECT n.id,
       CAST(LEAST(n.id, COALESCE(MIN(r.b), n.id)) AS BIGINT) AS cluster
FROM nodes n LEFT JOIN reach r ON r.a = n.id
GROUP BY n.id
"""
)


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document's cluster = min doc_id reachable through near-dup pairs;
    pipelines keep one row per cluster (the reference's keep='first' dedup,
    general_validation.py:19-27, generalized to transitive duplicate groups)."""
    from data_validator_guard_spark.operators.dedup import (
        connected_components,
        minhash_near_duplicates,
    )

    dup = _docs_with_near_dups(spark, sf_dir)
    pairs = minhash_near_duplicates(dup, "text", "doc_id", k=8, bands=4, n=3, threshold=0.7)
    return connected_components(dup.select("doc_id"), pairs, id_col="doc_id")


# =====================================================================
# 42b. Quality-aware survivorship (round-4 verdict #6): keep the BEST copy
#     of each near-dup cluster, not the first — quality = the
#     quality_features score (integer-quantized quarters) with content
#     length then min-id tiebreaks, so the perturbed longer copies win
#     over their originals where scores tie. Survivors proven byte-
#     identical via sha256 in both engines.
# =====================================================================
_SURVIVOR_ORACLE = (
    _MINHASH_CTES.replace("WITH docs AS (", "WITH RECURSIVE docs AS (", 1)
    + r""",
sym AS (
  SELECT id1 AS a, id2 AS b FROM verified
  UNION ALL SELECT id2, id1 FROM verified
),
nodes AS (SELECT DISTINCT doc_id AS id FROM docs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
),
cl AS (
  SELECT n.id, CAST(LEAST(n.id, COALESCE(MIN(r.b), n.id)) AS BIGINT) AS cluster
  FROM nodes n LEFT JOIN reach r ON r.a = n.id GROUP BY n.id
),
feat AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS n_stop,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
  FROM docs
),
qual AS (
  SELECT doc_id, text,
         (CASE WHEN n_chars BETWEEN 64 AND 100000 THEN 2 ELSE 0 END
          + CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.01 THEN 1 ELSE 0 END
          + CASE WHEN n_chars = 0 OR CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) <= 0.2 THEN 1 ELSE 0 END
         ) * CAST(1000000000 AS BIGINT) + n_chars AS qq
  FROM feat
),
win AS (
  SELECT q.doc_id, q.text,
         ROW_NUMBER() OVER (PARTITION BY cl.cluster ORDER BY q.qq DESC, q.doc_id ASC) AS rn
  FROM qual q JOIN cl ON cl.id = q.doc_id
)
SELECT doc_id, sha256(text) AS text_sha FROM win WHERE rn = 1
"""
)


@query("dedup_apply_quality", oracle=_SURVIVOR_ORACLE)
def q_dedup_apply_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-copy survivorship over the minhash near-dup clusters: quality =
    quality_features' score quantized to integer quarters (exact — the
    score is k*0.25 by construction), then content length, then min id.
    The perturbed '+ suffix' copies are LONGER, so where scores tie the
    survivor differs from keep-min-id — the policy is observably not
    first-copy-wins. sha256 of each survivor pins byte identity."""
    from data_validator_guard_spark.operators.dedup import (
        apply_survivorship,
        connected_components,
        minhash_near_duplicates,
    )
    from data_validator_guard_spark.operators.text import quality_features

    dup = _docs_with_near_dups(spark, sf_dir)
    pairs = minhash_near_duplicates(dup, "text", "doc_id", k=8, bands=4, n=3, threshold=0.7)
    clusters = connected_components(dup.select("doc_id"), pairs, id_col="doc_id")
    qf = quality_features(dup, "text", "doc_id").select(
        "doc_id",
        (
            (F.col("quality_score") * 4).cast("bigint") * F.lit(1_000_000_000)
            + F.col("n_chars_actual")
        ).alias("__qq"),
    )
    kept = apply_survivorship(dup.join(qf, "doc_id"), clusters, "doc_id", F.col("__qq"))
    return kept.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))


# =====================================================================
# 53. Dedup survivorship: materialize the deduplicated corpus (keep the
#     min-id row per normalized fingerprint) with byte-identity sha256 —
#     the operator pipelines actually run after duplicate DETECTION.
# =====================================================================
@query(
    "dedup_apply",
    oracle=r"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
),
fp AS (
  SELECT doc_id, text,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM docs
),
keep AS (SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY f)
SELECT p.doc_id, sha256(p.text) AS text_sha
FROM fp p JOIN keep k ON k.f = p.f AND k.keep_id = p.doc_id
""",
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import exact_duplicates

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.unionByName(docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    keep = exact_duplicates(dup, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    return dup.join(keep, "doc_id", "left_semi").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
    )


# =====================================================================
# 62. Dedup reporting: duplicate-cluster size distribution (how much of the
#     corpus collapses, and into how large groups) — the summary a dedup
#     run reports before materializing survivors.
# =====================================================================
@query(
    "dedup_cluster_sizes",
    oracle=r"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
),
fp AS (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM docs
),
cl AS (SELECT f, COUNT(*) AS sz FROM fp GROUP BY f)
SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
       CAST(sz * COUNT(*) AS BIGINT) AS n_docs
FROM cl GROUP BY sz
""",
)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.dedup import exact_duplicates

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.unionByName(docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    clusters = exact_duplicates(dup, "text", "doc_id")
    return (
        clusters.groupBy(F.col("n_copies").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        )
    )


# =====================================================================
# 63. SemDeDup — semantic near-duplicate pairs (Abbas et al. 2023,
#     arXiv:2303.09540): candidates from the deterministic integer
#     k-means (IVF) index, exact-integer cosine verification. The WHOLE
#     pipeline — perturbation, quantization, md5 seeding, Lloyd step, L2
#     cell assignment, HUGEINT threshold — is SQL-replicable, so even the
#     cell-boundary recall loss is oracle-identical. Planted near-dups:
#     50 copies with coord 1 shifted +0.25 (cos ≈ 0.95-0.97 against
#     unit-norm originals), threshold 0.95 → the decision boundary cuts
#     through the planted distribution instead of rubber-stamping it.
# =====================================================================
_SEM_DIST_SQL = (
    "list_sum(list_transform(generate_series(1, len({v})), "
    "d -> ({v}[d] - {c}[d]) * ({v}[d] - {c}[d])))"
)

_SEM_ORACLE = rf"""
WITH src AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(generate_series(1, len(embedding)),
                        d -> CASE WHEN d = 1 THEN CAST(embedding[d] AS DOUBLE) + 0.25
                             ELSE CAST(embedding[d] AS DOUBLE) END)
  FROM embeddings WHERE vec_id < 50
),
e AS (
  SELECT vec_id, list_transform(emb, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv
  FROM src
),
sd AS (SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h FROM e ORDER BY h LIMIT 8),
c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS centroid_id, qv AS cvec FROM sd),
d0 AS (
  SELECT e.vec_id, c.centroid_id, {_SEM_DIST_SQL.format(v='e.qv', c='c.cvec')} AS dist
  FROM e CROSS JOIN c0 c
),
a0 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
    FROM d0
  ) WHERE rn = 1
),
sums AS (
  SELECT a.centroid_id, d - 1 AS pos, SUM(e.qv[d]) AS s, COUNT(*) AS n
  FROM a0 a JOIN e USING (vec_id), generate_series(1, 64) AS g(d)
  GROUP BY a.centroid_id, pos
),
c1new AS (
  SELECT centroid_id, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cvec
  FROM sums GROUP BY centroid_id
),
c1 AS (
  SELECT c0.centroid_id, COALESCE(c1new.cvec, c0.cvec) AS cvec
  FROM c0 LEFT JOIN c1new USING (centroid_id)
),
d1 AS (
  SELECT e.vec_id, c.centroid_id, {_SEM_DIST_SQL.format(v='e.qv', c='c.cvec')} AS dist
  FROM e CROSS JOIN c1 c
),
a1 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
    FROM d1
  ) WHERE rn = 1
),
cells AS (
  SELECT a1.vec_id AS id, a1.centroid_id, e.qv,
         list_sum(list_transform(e.qv, x -> x * x)) AS n2
  FROM a1 JOIN e USING (vec_id)
),
pairs AS (
  SELECT a.id AS id1, b.id AS id2,
         list_sum(list_transform(generate_series(1, len(a.qv)),
                                 d -> a.qv[d] * b.qv[d])) AS dot,
         a.n2 AS na2, b.n2 AS nb2
  FROM cells a JOIN cells b ON a.centroid_id = b.centroid_id AND a.id < b.id
)
SELECT id1, id2 FROM pairs
WHERE dot > 0
  AND CAST(10000 AS HUGEINT) * CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT)
      >= CAST({95 * 95} AS HUGEINT) * CAST(na2 AS HUGEINT) * CAST(nb2 AS HUGEINT)
"""


@query("dedup_semantic", oracle=_SEM_ORACLE)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table with 50 planted near-duplicates
    (coord-1 +0.25 shift, cos ≈ 0.95-0.97): k-means cells propose, the
    exact decimal cosine kit disposes. Cell-straddling planted pairs are
    the family's by-design recall loss — reproduced identically by the
    oracle because the whole index build is deterministic integer math."""
    from data_validator_guard_spark.operators.similarity import (
        semantic_near_duplicates,
    )

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(0.25)).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    corpus = base.unionByName(pert)
    return semantic_near_duplicates(
        corpus, "embedding", "vec_id", n_clusters=8, iters=1, threshold_cents=95
    )
