"""Text-analysis family: tokens/quality/lang-id, PII screen, repetition,
chunking, vocabulary, token document frequency.

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
# 13. Text analysis family (operators/text.py) — all expression-level.
# =====================================================================
@query(
    "token_counts",
    oracle=r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_word_tokens
FROM documents
""",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import token_counts

    return token_counts(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "quality_features",
    oracle=r"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars_actual,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS n_stopwords,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
  FROM documents
)
SELECT doc_id, n_chars_actual, n_tokens, n_stopwords, n_punct,
       COALESCE(CAST(n_stopwords AS DOUBLE) / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) END), 0.0) AS stopword_ratio,
       COALESCE(CAST(n_punct AS DOUBLE) / (CASE WHEN n_chars_actual > 0 THEN CAST(n_chars_actual AS DOUBLE) END), 0.0) AS punct_ratio,
       CAST(CASE WHEN n_chars_actual BETWEEN 64 AND 100000 THEN 0.5 ELSE 0.0 END
        + CASE WHEN COALESCE(CAST(n_stopwords AS DOUBLE) / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) END), 0.0) >= 0.01 THEN 0.25 ELSE 0.0 END
        + CASE WHEN COALESCE(CAST(n_punct AS DOUBLE) / (CASE WHEN n_chars_actual > 0 THEN CAST(n_chars_actual AS DOUBLE) END), 0.0) <= 0.2 THEN 0.25 ELSE 0.0 END
       AS DOUBLE) AS quality_score
FROM f
""",
)
def q_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import quality_features

    return quality_features(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "language_id",
    oracle=r"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\bthe\b')) AS c_en,
         len(regexp_extract_all(text, '\btable\b')) AS c_fr,
         len(regexp_extract_all(text, '\bdata\b')) AS c_de,
         len(regexp_extract_all(text, '\brow\b')) AS c_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN c_en >= greatest(c_fr, c_de, c_es) THEN 'en'
            WHEN c_fr >= greatest(c_de, c_es) THEN 'fr'
            WHEN c_de >= c_es THEN 'de'
            ELSE 'es' END AS pred_lang,
       c_en, c_fr, c_de, c_es
FROM c
""",
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import language_id

    return language_id(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "fingerprints",
    oracle=r"""
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
FROM documents
""",
)
def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import fingerprint

    return fingerprint(read_table(spark, sf_dir, "documents"), "text", "doc_id")


# =====================================================================
# 46. PII pattern screen (scrub-before-training): planted emails/phones/
#     IPs so every counter exercises a non-zero path; patterns are
#     Java-regex/RE2 portable so both engines count identically.
# =====================================================================
@query(
    "pii_scan",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0 THEN ' contact: user7@example.com' ELSE '' END
              || CASE WHEN doc_id % 11 = 0 THEN ' from 192.168.0.1' ELSE '' END
              || CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
       len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
       len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
       OR len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) > 0
       OR len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) > 0 AS has_pii
FROM t
""",
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import pii_scan

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" contact: user7@example.com")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" from 192.168.0.1")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scan(docs, "text", "doc_id")


# =====================================================================
# 46b. PII redaction (scan → ACT): the rewrite pass a training pipeline
#      runs after the screen — typed placeholders, fixed replacement
#      order, count + sha256 + length of the redacted payload so both
#      engines byte-verify the transform without hashing megabytes.
# =====================================================================
@query(
    "pii_redact",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0 THEN ' contact: user7@example.com' ELSE '' END
              || CASE WHEN doc_id % 11 = 0 THEN ' from 192.168.0.1' ELSE '' END
              || CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567' ELSE '' END AS text
  FROM documents
), s1 AS (
  -- stage-wise: each pattern counts on the text AS ITS STAGE SEES IT, so
  -- n_redactions = placeholders actually inserted even under overlaps
  -- (a phone-shaped email local part is ONE email replacement, not two).
  SELECT doc_id, text AS t0,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM t
), s2 AS (
  SELECT doc_id, t0, t1,
         regexp_replace(t1, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t2
  FROM s1
), r AS (
  SELECT doc_id,
         len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
       + len(regexp_extract_all(t1, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
       + len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_redactions,
         regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS red
  FROM s2
)
SELECT doc_id,
       CAST(n_redactions AS BIGINT) AS n_redactions,
       sha256(red) AS redacted_sha256,
       CAST(length(red) AS BIGINT) AS redacted_len
FROM r
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import pii_redact

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" contact: user7@example.com")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" from 192.168.0.1")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_redact(docs, "text", "doc_id")


# =====================================================================
# 54. Intra-document repetition signals (Gopher-style quality filters).
# =====================================================================
@query(
    "repetition_signals",
    oracle=r"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct_tokens
  FROM documents
),
top AS (
  SELECT doc_id, MAX(c) AS topc FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT w.doc_id AS id, w.n_tokens, w.n_distinct_tokens,
       1.0 - CAST(w.n_distinct_tokens AS DOUBLE)
             / (CASE WHEN w.n_tokens > 0 THEN CAST(w.n_tokens AS DOUBLE) END) AS dup_token_frac,
       CAST(COALESCE(top.topc, 0) AS DOUBLE)
       / (CASE WHEN w.n_tokens > 0 THEN CAST(w.n_tokens AS DOUBLE) END) AS top_token_frac
FROM w LEFT JOIN top ON top.doc_id = w.doc_id
""",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import repetition_signals

    return repetition_signals(read_table(spark, sf_dir, "documents"), "text", "doc_id")


# =====================================================================
# 58. Document chunking (training prep): overlapping 512-char windows with
#     stride 384 — the 1→N reshaping before tokenization, sha-verified.
# =====================================================================
@query(
    "chunk_documents",
    oracle="""
SELECT doc_id AS id, CAST(i AS INT) AS chunk_idx,
       sha256(substr(text, CAST(i AS INT) * 384 + 1, 512)) AS chunk_sha,
       length(substr(text, CAST(i AS INT) * 384 + 1, 512)) AS chunk_len
FROM documents,
     (SELECT unnest(generate_series(0, 63)) AS i) g  -- fixed series (docs < 24k chars); filtered per doc below
WHERE i <= floor((greatest(length(text) - 512, 0) + 383) / 384)
""",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import chunk_documents

    chunks = chunk_documents(
        read_table(spark, sf_dir, "documents"), "text", "doc_id", 512, 384
    )
    return chunks.select(
        "id",
        "chunk_idx",
        F.sha2(F.col("chunk_text"), 256).alias("chunk_sha"),
        F.length("chunk_text").alias("chunk_len"),
    )


# =====================================================================
# 59. Corpus vocabulary top-k (vocab building): exact term frequencies,
#     distributed TakeOrderedAndProject (never a global window).
# =====================================================================
@query(
    "top_tokens",
    oracle=r"""
SELECT tok, n, rank FROM (
  SELECT tok, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents)
  GROUP BY tok
) WHERE rank <= 20
""",
)
def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import heavy_hitters

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    return heavy_hitters(toks, "tok", k=20).select(
        F.col("value").alias("tok"), "n", "rank"
    )


# =====================================================================
# 24. Token document frequency (the IDF foundation for TF-IDF style
#     weighting) — exact integers only: df + n_docs, never ln(N/df)
#     (libm transcendentals are not bit-portable across engines; IDF is
#     one division+log away for any consumer).
# =====================================================================
@query(
    "token_doc_frequency",
    oracle=r"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
tot AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tok, CAST(df AS BIGINT) AS df, rank, CAST(n_docs AS BIGINT) AS n_docs
FROM (
  SELECT tok, COUNT(*) AS df,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
  FROM dt GROUP BY tok
), tot
WHERE rank <= 20
""",
)
def q_token_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by document frequency: per-doc DISTINCT tokens first
    (array_distinct before the explode — the exploded row count is bounded
    by distinct tokens/doc, not raw token count), one hash-count shuffle on
    the token, TakeOrdered for the top-k (never a global window over the
    vocabulary), corpus size attached via a broadcast one-row aggregate."""
    from data_validator_guard_spark.operators.text import heavy_hitters

    docs = read_table(spark, sf_dir, "documents")
    doc_tokens = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias(
            "tok"
        ),
    )
    top = heavy_hitters(doc_tokens, "tok", k=20).select(
        F.col("value").alias("tok"), F.col("n").alias("df"), "rank"
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return top.crossJoin(F.broadcast(total))


# =====================================================================
# 76. TF-IDF scoring against a fixed vocabulary (round 5): the weighting
#     step on top of token_doc_frequency. The vocabulary (top-20 tokens
#     by document frequency) and the corpus size are broadcast; per-doc
#     term frequencies come from one hash aggregation after a broadcast
#     semi-filter, so the heavy explode never shuffles unfiltered tokens.
#     No ranking ever happens on the float score (ties across engines are
#     a last-ulp hazard) — the exact-integer (tf, df) pair travels with
#     each row and tfidf is one division + one ln + one multiply, rounded.
# =====================================================================
@query(
    "tfidf_scores",
    oracle=r"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, df FROM (
    SELECT tok, COUNT(*) AS df,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
    FROM dt GROUP BY tok
  ) WHERE rank <= 20
),
tot AS (SELECT COUNT(*) AS n_docs FROM documents),
tf AS (
  SELECT t.doc_id, t.tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents) t
  JOIN vocab v ON v.tok = t.tok
  GROUP BY t.doc_id, t.tok
)
SELECT tf.doc_id, tf.tok, CAST(tf.tf AS BIGINT) AS tf, CAST(v.df AS BIGINT) AS df,
       CAST(tot.n_docs AS BIGINT) AS n_docs,
       round(CAST(tf.tf AS DOUBLE) * ln(CAST(tot.n_docs AS DOUBLE) / v.df), 6) AS tfidf
FROM tf JOIN vocab v ON v.tok = tf.tok, tot
""",
)
def q_tfidf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import heavy_hitters

    docs = read_table(spark, sf_dir, "documents")
    doc_toks_distinct = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("tok"),
    )
    vocab = heavy_hitters(doc_toks_distinct, "tok", k=20).select(
        F.col("value").alias("tok"), F.col("n").alias("df")
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    tf = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id", "tok", "df")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "tok",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(
            F.col("tf").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )


# =====================================================================
# 70. Cross-document duplicated-segment screen + removal (the CCNet /
#     RefinedWeb boilerplate pass): planted nav-header (every 3rd doc)
#     and copyright-footer (every 5th) segments, min_docs=3. The SCAN
#     query returns the boilerplate set (hash, doc reach, occurrences);
#     the CLEAN query rebuilds every document without it, order
#     preserved, payload byte-verified via sha256 + length (the
#     pii_redact contract).
# =====================================================================
_SEG_DOCS_CTE = r"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'NAV: home | about | contact' || chr(10) ELSE '' END
         || text
         || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'Copyright 2026 Example Corp' ELSE '' END AS text
  FROM documents
),
segs AS (
  SELECT doc_id, unnest(a) AS seg, generate_subscripts(a, 1) AS idx
  FROM (SELECT doc_id, string_split(text, chr(10)) AS a FROM docs) t
)
"""


def _planted_seg_docs(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("NAV: home | about | contact\n")
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("\nCopyright 2026 Example Corp")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


@query(
    "duplicate_segments",
    oracle=_SEG_DOCS_CTE
    + """
SELECT md5(seg) AS seg_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM segs GROUP BY seg_hash HAVING COUNT(DISTINCT doc_id) >= 3
""",
)
def q_duplicate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import duplicate_segments

    return duplicate_segments(
        _planted_seg_docs(spark, sf_dir), "text", "doc_id", sep="\n", min_docs=3
    )


@query(
    "segment_dedup_clean",
    oracle=_SEG_DOCS_CTE
    + """,
dup AS (
  SELECT md5(seg) AS seg_hash FROM segs
  GROUP BY seg_hash HAVING COUNT(DISTINCT doc_id) >= 3
),
kept AS (
  SELECT s.doc_id, s.idx, s.seg FROM segs s
  WHERE md5(s.seg) NOT IN (SELECT seg_hash FROM dup)
),
rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(seg, chr(10) ORDER BY idx) AS cleaned
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_segments FROM segs GROUP BY doc_id)
SELECT d.doc_id AS id,
       CAST(COALESCE(t.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(t.n_segments, 0) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       sha256(CASE WHEN d.text IS NOT NULL THEN COALESCE(r.cleaned, '') END) AS cleaned_sha256,
       CAST(length(CASE WHEN d.text IS NOT NULL THEN COALESCE(r.cleaned, '') END) AS BIGINT) AS cleaned_len
FROM docs d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
""",
)
def q_segment_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import remove_duplicate_segments

    return remove_duplicate_segments(
        _planted_seg_docs(spark, sf_dir), "text", "doc_id", sep="\n", min_docs=3
    )


# =====================================================================
# 71. Intra-document segment dedup (RefinedWeb "remove duplicated lines
#     within document"): keep the first occurrence of each segment per
#     doc. Planted repeats: a marker line around every 4th doc, the whole
#     text doubled on every 6th (non-multiple-of-4) doc.
# =====================================================================
@query(
    "segment_dedup_within",
    oracle=r"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 'REPEAT ME' || chr(10) || text || chr(10) || 'REPEAT ME'
              WHEN doc_id % 6 = 0 THEN text || chr(10) || text
              ELSE text END AS text
  FROM documents
),
segs AS (
  SELECT doc_id, unnest(a) AS seg, generate_subscripts(a, 1) AS idx
  FROM (SELECT doc_id, string_split(text, chr(10)) AS a FROM docs) t
),
kept AS (SELECT doc_id, seg, MIN(idx) AS idx FROM segs GROUP BY doc_id, seg),
rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(seg, chr(10) ORDER BY idx) AS cleaned
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_segments FROM segs GROUP BY doc_id)
SELECT d.doc_id AS id,
       CAST(COALESCE(t.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(t.n_segments, 0) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       sha256(CASE WHEN d.text IS NOT NULL THEN COALESCE(r.cleaned, '') END) AS cleaned_sha256,
       CAST(length(CASE WHEN d.text IS NOT NULL THEN COALESCE(r.cleaned, '') END) AS BIGINT) AS cleaned_len
FROM docs d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
""",
)
def q_segment_dedup_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.text import (
        remove_repeated_segments_within,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("REPEAT ME\n"), F.col("text"), F.lit("\nREPEAT ME")),
        )
        .when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.col("text"), F.lit("\n"), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return remove_repeated_segments_within(planted, "text", "doc_id", sep="\n")


# =====================================================================
# 29. URL/domain blocklist screen (round 5): the C4/RefinedWeb
#     provenance gate. URLs are planted deterministically (doc_id % 13
#     buckets) to cover every decision branch: a subdomain of a blocked
#     domain (suffix catch), an exact blocked host, the substring trap
#     (notbad.example must NOT block), an uppercase host (lowercased
#     first), an unparseable URL (NULL host, never blocked), and clean
#     hosts. Pure per-row expression — fuses into the scan, zero
#     shuffles; the blocklist is plan literals.
# =====================================================================
_URL_CASE = """
CASE WHEN doc_id % 13 = 0 THEN 'https://cdn.bad.example/p/' || CAST(doc_id AS VARCHAR)
     WHEN doc_id % 13 = 1 THEN 'https://spam.test/x'
     WHEN doc_id % 13 = 2 THEN 'https://notbad.example/ok'
     WHEN doc_id % 13 = 3 THEN 'ftp://BAD.EXAMPLE/y'
     WHEN doc_id % 13 = 4 THEN 'no-scheme-garbage'
     ELSE 'https://' || source || '.example/d/' || CAST(doc_id AS VARCHAR) END
"""

_URL_ORACLE = f"""
WITH u AS (
  SELECT doc_id, {_URL_CASE} AS url FROM documents WHERE doc_id IS NOT NULL
),
h AS (
  SELECT doc_id,
         CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1) = ''
              THEN NULL
              ELSE lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) END AS host
  FROM u
)
SELECT doc_id, host,
       COALESCE(host = 'bad.example' OR host LIKE '%.bad.example'
                OR host = 'spam.test' OR host LIKE '%.spam.test', FALSE) AS blocked
FROM h
"""


@query("url_blocklist_screen", oracle=_URL_ORACLE)
def q_url_blocklist_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist verdicts over planted URLs: blocked iff the host
    equals a blocklisted domain or is a subdomain of one."""
    from data_validator_guard_spark.operators.text import domain_screen

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    url = (
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.lit("https://cdn.bad.example/p/"), F.col("doc_id").cast("string")),
        )
        .when(F.col("doc_id") % 13 == 1, F.lit("https://spam.test/x"))
        .when(F.col("doc_id") % 13 == 2, F.lit("https://notbad.example/ok"))
        .when(F.col("doc_id") % 13 == 3, F.lit("ftp://BAD.EXAMPLE/y"))
        .when(F.col("doc_id") % 13 == 4, F.lit("no-scheme-garbage"))
        .otherwise(
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example/d/"),
                F.col("doc_id").cast("string"),
            )
        )
    )
    return domain_screen(
        docs.select("doc_id", url.alias("url")),
        "url",
        "doc_id",
        ["bad.example", "spam.test"],
    )
