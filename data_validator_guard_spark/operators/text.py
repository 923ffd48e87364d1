"""Text-analysis operators for training-data pipelines.

All pure Column expressions — JVM-side, whole-stage codegen, zero Python in
the hot path. These generalize the reference's string-normalization +
regex-predicate family (SURVEY.md §2.8) to corpus-scale document processing:
language-ID (marker-token heuristic), quality scoring, token counting, and
document fingerprinting.

Determinism: every output is either an integer count, a single IEEE double
operation (one division), or an md5 hex string — all exactly reproducible
across engines for oracle comparison.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WORD_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish pre-tokenizer split
STOPWORD_PATTERN = r"\b(the|a|of|and|to|in)\b"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

# deterministic marker-token language heuristic (n-gram-style scoring with a
# fixed priority order for ties)
LANG_MARKERS = [("en", r"\bthe\b"), ("fr", r"\btable\b"), ("de", r"\bdata\b"), ("es", r"\brow\b")]


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def word_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.regexp_count(text, F.lit(WORD_TOKEN_PATTERN))


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document token counts: ``id, n_ws_tokens, n_word_tokens``."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        ws_token_count(t).alias("n_ws_tokens"),
        word_token_count(t).alias("n_word_tokens"),
    )


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality features + score.

    ``id, n_chars, n_tokens, n_stopwords, n_punct, stopword_ratio,
    punct_ratio, quality_score`` — integer counts plus single-division
    doubles; score is a fixed linear blend clipped to [0, 1].
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = ws_token_count(t)
    n_stop = F.regexp_count(t, F.lit(STOPWORD_PATTERN))
    n_punct = F.regexp_count(t, F.lit(PUNCT_PATTERN))
    nt = F.when(n_tokens > 0, n_tokens.cast("double"))
    nc = F.when(n_chars > 0, n_chars.cast("double"))
    stop_ratio = F.coalesce(n_stop.cast("double") / nt, F.lit(0.0))
    punct_ratio = F.coalesce(n_punct.cast("double") / nc, F.lit(0.0))
    length_ok = (n_chars >= 64) & (n_chars <= 100000)
    score = (
        F.when(length_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-token language heuristic: ``id, pred_lang, c_<lang>...``.

    Fixed priority order breaks ties deterministically (first language in
    LANG_MARKERS whose count is >= all later ones wins).
    """
    t = F.col(text_col)
    counts = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in LANG_MARKERS}
    langs = [lang for lang, _ in LANG_MARKERS]
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [counts[l2] for l2 in langs[langs.index(lang) + 1:]]
        cond = counts[lang] >= F.greatest(*later) if len(later) > 1 else counts[lang] >= later[0]
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        *[counts[lang].alias(f"c_{lang}") for lang in langs],
    )


def normalize_text(text: Column) -> Column:
    """Canonical text normalization: trim, collapse whitespace, lowercase."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint over normalized text: ``id, fp`` (md5 hex).

    The whitespace/case-insensitive analog of the engine's byte-identity
    invariant ``sha2(content, 256)`` (BASELINE.json input_hint) — used as the
    exact-dedup key.
    """
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp")
    )


def closest_allowed_value(
    df: DataFrame, col: str, allowed: list[str], id_col: str, max_distance: int = 3
) -> DataFrame:
    """Typo repair suggestions: for values outside the allowed set, the
    nearest allowed value by Levenshtein distance (ties broken
    lexicographically), or NULL when nothing is within ``max_distance``.

    The reference's mock fixture plants exactly this defect class
    ('Londen'/'Pariss' vs {'London','Paris'}, validation/testing/
    mock_data.py:3-28) and checks membership only; the engine adds the
    suggestion. Distributed shape: broadcast the (small) allowed list,
    score |allowed| candidates per offending row — offending rows only,
    never the clean majority.
    """
    allowed_df = df.sparkSession.createDataFrame([(a,) for a in allowed], "allowed string")
    bad = df.select(F.col(id_col).alias("id"), F.col(col).alias("value")).filter(
        F.col("value").isNotNull() & ~F.col("value").isin(allowed)
    )
    scored = bad.crossJoin(F.broadcast(allowed_df)).withColumn(
        "dist", F.levenshtein(F.col("value"), F.col("allowed"))
    )
    w = Window.partitionBy("id").orderBy(F.col("dist"), F.col("allowed"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "id",
            "value",
            F.when(F.col("dist") <= max_distance, F.col("allowed")).alias("suggestion"),
            F.when(F.col("dist") <= max_distance, F.col("dist")).alias("distance"),
        )
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Exact top-k most frequent values (skew diagnosis for salting / AQE
    tuning): two-phase hash count then ``orderBy(...).limit(k)``, which
    compiles to distributed TakeOrderedAndProject (per-partition top-k, k-row
    merge) — NOT a global ``Window.orderBy``, which would funnel one row per
    distinct value through a single task. Ranks are assigned afterwards on
    the k-row result."""
    counts = df.groupBy(F.col(col).alias("value")).agg(F.count(F.lit(1)).alias("n"))
    topk = counts.orderBy(F.col("n").desc(), F.col("value")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("value"))
    return topk.withColumn("rank", F.row_number().over(w))


# PII detection patterns — RE2/Java-portable (no backreferences, no lookarounds)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII pattern counts: ``id, n_email, n_phone, n_ipv4,
    has_pii`` — the scrub-before-training screening pass, entirely
    expression-level (regexp_count, JVM-side; patterns chosen to behave
    identically under Java regex and RE2). Counts are a *screen*, not a
    guarantee — a production scrubber layers NER on top; this finds the
    structured 95%."""
    t = F.col(text_col)
    counts = {k: F.regexp_count(t, F.lit(p)) for k, p in PII_PATTERNS.items()}
    has = None
    for c in counts.values():
        has = (c > 0) if has is None else (has | (c > 0))
    return df.select(
        F.col(id_col),
        *[counts[k].alias(f"n_{k}") for k in PII_PATTERNS],
        has.alias("has_pii"),
    )


PII_PLACEHOLDERS = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Scan-to-ACT companion of :func:`pii_scan`: replace every structured
    PII match with a typed placeholder and return
    ``id, n_redactions, redacted_sha256, redacted_len``.

    Chained ``regexp_replace`` in a FIXED order (email → phone → ipv4) so
    the transform is deterministic and identical under Java regex and RE2;
    the placeholders contain no digits or ``@``, so an earlier replacement
    can never create a later pattern's match (no rescan cascades). Each
    pattern's count is taken on the text AS THAT STAGE SEES IT (the
    original for email, the email-redacted text for phone, …), so
    ``n_redactions`` equals the number of placeholders actually inserted
    even when patterns overlap — counting every pattern on the original
    would double-count e.g. a phone-shaped local part inside an email
    (``555-123-4567@x.com`` is ONE replacement). Everything is
    expression-level (one projection, JVM-side, whole-stage codegen); the
    redacted payload itself is returned as a sha256 so callers can
    byte-verify the output of a rewrite job without the oracle hashing
    megabytes of text. Scale: embarrassingly parallel, zero shuffles —
    the same shape as the reference's per-cell cleaning pass
    (data_cleaning.py) re-expressed as a single narrow projection.
    """
    red = F.col(text_col)
    n_red = None
    for k, p in PII_PATTERNS.items():
        c = F.regexp_count(red, F.lit(p))
        n_red = c if n_red is None else (n_red + c)
        red = F.regexp_replace(red, p, PII_PLACEHOLDERS[k])
    return df.select(
        F.col(id_col),
        n_red.cast("bigint").alias("n_redactions"),
        F.sha2(red, 256).alias("redacted_sha256"),
        F.length(red).cast("bigint").alias("redacted_len"),
    )


def repetition_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: ``id, n_tokens,
    n_distinct_tokens, dup_token_frac, top_token_frac``.

    dup_token_frac = 1 − distinct/total (expression-level); top_token_frac =
    most-frequent-token count / total (explode + per-(doc, token) count + max
    — distributed, two hash aggregations, no UDF). High values flag
    boilerplate/spam documents that length or stopword filters miss.
    """
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    n_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(words))
    base = df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        words.alias("__w"),
    )
    top = (
        base.select("id", F.explode("__w").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("__top"))
    )
    return (
        base.drop("__w")
        .join(top, "id", "left")
        .select(
            "id",
            "n_tokens",
            "n_distinct_tokens",
            (
                F.lit(1.0)
                - F.col("n_distinct_tokens").cast("double")
                / F.when(F.col("n_tokens") > 0, F.col("n_tokens").cast("double"))
            ).alias("dup_token_frac"),
            (
                F.coalesce(F.col("__top"), F.lit(0)).cast("double")
                / F.when(F.col("n_tokens") > 0, F.col("n_tokens").cast("double"))
            ).alias("top_token_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Overlapping training chunks: ``id, chunk_idx, chunk_text`` — windows
    of ``chunk_size`` chars every ``stride`` chars (overlap = size − stride),
    the 1→N reshaping step before tokenization. Pure expressions
    (sequence + explode + substring): one scan, rows fan out ~len/stride×,
    no Python. Every document yields at least one chunk (short docs emit
    themselves)."""
    n = F.length(F.col(text_col))
    n_extra = F.floor(
        (F.greatest(n - chunk_size, F.lit(0)) + (stride - 1)) / stride
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_extra))
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"), idx.alias("chunk_idx"))
        .select(
            "id",
            "chunk_idx",
            F.substring(F.col("__t"), F.col("chunk_idx") * stride + 1, chunk_size).alias(
                "chunk_text"
            ),
        )
    )


def duplicate_segments(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
    min_docs: int = 3,
) -> DataFrame:
    """Cross-document duplicated-segment detection (the CCNet/RefinedWeb
    boilerplate screen): split each document on ``sep``, return one row per
    segment that appears in >= ``min_docs`` DISTINCT documents —
    ``seg_hash, n_docs, n_occurrences``. The segment travels as its md5
    (boilerplate text can be megabytes; the hash is 32 bytes and is what
    the removal pass keys on anyway).

    ``sep`` is applied as a regex by ``split`` (and as a LITERAL by the
    removal pass's rejoin) — pass a regex-safe literal like ``"\\n"``;
    a metacharacter separator would split and rejoin differently.

    Scale: one explode (map-side, no shuffle) + one hash aggregation keyed
    by segment hash — the same shape as exact_duplicates, but at segment
    granularity. Headers/footers/nav-chrome repeat across millions of pages;
    their groups are big but the OUTPUT is only the distinct boilerplate
    set, which is tiny relative to the corpus.
    """
    segs = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), sep)).alias("seg"),
    )
    return (
        segs.groupBy(F.md5(F.col("seg")).alias("seg_hash"))
        .agg(
            F.count_distinct(F.col("id")).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_segments(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
    min_docs: int = 3,
) -> DataFrame:
    """The ACT half of :func:`duplicate_segments`: rebuild every document
    with its cross-document duplicated segments removed, preserving segment
    order — ``id, n_segments, n_removed, cleaned_sha256, cleaned_len``.

    The cleaned payload is emitted as sha256 + length (the pii_redact
    contract: byte-verifiable without shipping megabytes through the
    oracle). A document whose every segment was boilerplate cleans to the
    empty string; NULL text stays NULL end to end. ``sep`` must be a
    regex-safe literal (it splits as a regex and rejoins as a literal).

    Scale shape: explode -> aggregate duplicated hashes (tiny output,
    auto-broadcast back) -> left_anti to drop boilerplate occurrences ->
    regroup per document via sorted struct collect. The per-document state
    of the rebuild is that document's own segments — bounded by document
    size, never by corpus size; the only corpus-wide aggregation is the
    segment-hash count whose output is the boilerplate set. The
    per-document segment total comes straight from ``size(split(...))``
    on the base scan — never a second explode + aggregation pass.
    """
    segs = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "seg"),
    )
    dup = (
        segs.groupBy(F.md5(F.col("seg")).alias("seg_hash"))
        .agg(F.count_distinct(F.col("id")).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("seg_hash")
    )
    kept = segs.join(
        dup, F.md5(segs.seg) == dup.seg_hash, "left_anti"
    )
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                lambda st: st.seg,
            ),
            sep,
        ).alias("__cleaned"),
    )
    return _finish_segment_rebuild(df, rebuilt, text_col, id_col, sep)


def _finish_segment_rebuild(
    df: DataFrame, rebuilt: DataFrame, text_col: str, id_col: str, sep: str
) -> DataFrame:
    """Shared tail of the segment-rebuild operators: join the kept-segment
    aggregate back to the base frame and emit the output contract. The
    per-document segment total is ``size(split(...))`` computed inline on
    the base scan (NULL text -> 0), so no second explode/aggregation pass
    over the corpus exists just to count segments."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        F.when(
            F.col(text_col).isNotNull(), F.size(F.split(F.col(text_col), sep))
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_segments"),
    )
    cleaned = F.when(
        F.col("__text").isNotNull(), F.coalesce(F.col("__cleaned"), F.lit(""))
    )
    return base.join(rebuilt, "id", "left").select(
        "id",
        "n_segments",
        (F.col("n_segments") - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
        F.sha2(cleaned, 256).alias("cleaned_sha256"),
        F.length(cleaned).cast("bigint").alias("cleaned_len"),
    )


def remove_repeated_segments_within(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
) -> DataFrame:
    """Intra-document segment dedup (the RefinedWeb "remove duplicated
    lines within a document" filter — the WITHIN-doc sibling of
    :func:`remove_duplicate_segments`'s cross-doc pass): keep the FIRST
    occurrence of each segment inside each document, drop the repeats,
    rebuild order-preserved. Same output contract: ``id, n_segments,
    n_removed, cleaned_sha256, cleaned_len``; same ``sep`` contract
    (regex-safe literal — splits as a regex, rejoins as a literal).

    Scale: first-occurrence selection is groupBy(id, segment) -> min(idx)
    — the shuffle key includes the doc id, so state per task is bounded by
    a single document's segments, and no corpus-wide structure exists at
    all (unlike the cross-doc pass there is no boilerplate set to build).
    """
    segs = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "seg"),
    )
    kept = segs.groupBy("id", "seg").agg(F.min("idx").alias("idx"))
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                lambda st: st.seg,
            ),
            sep,
        ).alias("__cleaned"),
    )
    return _finish_segment_rebuild(df, rebuilt, text_col, id_col, sep)


# Ordered license markers: copyleft checked FIRST so a dual-marked file
# classifies conservatively (The Stack keeps permissive-only; a GPL notice
# anywhere must win over an MIT header). Literal contains — no regex
# engine differences across engines.
LICENSE_MARKERS: list[tuple[str, str, bool]] = [
    ("gpl", "GNU General Public License", False),
    ("mit", "MIT License", True),
    ("apache-2.0", "Apache License, Version 2.0", True),
]


def classify_license(content: Column) -> tuple[Column, Column]:
    """``(license, is_permissive)`` columns from ordered first-match on
    literal license markers. Unknown ⇒ NOT permissive (the conservative
    curation default). Pure per-row expression — fuses into any scan."""
    lic: Column = F.lit("unknown")
    perm: Column = F.lit(False)
    for name, marker, permissive in reversed(LICENSE_MARKERS):
        hit = F.contains(content, F.lit(marker))
        lic = F.when(hit, F.lit(name)).otherwise(lic)
        perm = F.when(hit, F.lit(permissive)).otherwise(perm)
    return lic, perm


# Structured-credential patterns (the detect-secrets screen The Stack ran
# before publishing source code; Kocetkov et al. 2022 §4). Fixed-width
# token classes with no backtracking — identical under Java regex and RE2,
# so counts are oracle-exact. Like pii_scan, this finds the structured
# majority; a production scrubber layers entropy/NER detectors on top.
SECRET_PATTERNS = {
    "aws_key": r"AKIA[0-9A-Z]{16}",
    "github_pat": r"ghp_[A-Za-z0-9]{36}",
    "private_key": r"-----BEGIN [A-Z ]*PRIVATE KEY-----",
}


def secret_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document credential-pattern counts: ``id, n_aws_key,
    n_github_pat, n_private_key, has_secret`` — the publish-gate every
    source-code corpus runs (committed cloud keys / tokens / private keys
    must never reach a training set). Entirely expression-level
    (``regexp_count``, JVM-side, zero shuffles); non-overlapping
    left-to-right counting is identical across engines."""
    t = F.col(text_col)
    counts = {k: F.regexp_count(t, F.lit(p)) for k, p in SECRET_PATTERNS.items()}
    has = None
    for c in counts.values():
        has = (c > 0) if has is None else (has | (c > 0))
    return df.select(
        F.col(id_col),
        *[counts[k].cast("bigint").alias(f"n_{k}") for k in SECRET_PATTERNS],
        has.alias("has_secret"),
    )


# Auto-generated / vendored-output markers (literal contains — no regex).
# "DO NOT EDIT" and "Code generated by" are the Go/protobuf conventions;
# "@generated" is the Meta/thrift convention. Generated files are near-
# worthless as training signal and dominate line counts if kept.
GENERATED_MARKERS = ("DO NOT EDIT", "Code generated by", "@generated")


def code_file_screen(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_line_len: int = 1000,
    max_avg_line_len: float = 120.0,
    min_alnum_frac: float = 0.25,
) -> DataFrame:
    """The Stack / StarCoder per-file quality screen over raw source text:
    ``id, n_lines, max_line_len, avg_line_len, alnum_frac,
    comment_line_frac, is_generated, keep``.

    Filters (Kocetkov et al. 2022 §4; Li et al. 2023 appendix A): drop
    files with a generated-code marker, any line longer than
    ``max_line_len`` (minified/packed output), mean line length above
    ``max_avg_line_len``, or alphanumeric fraction below
    ``min_alnum_frac`` (binary-ish blobs). ``comment_line_frac`` is
    reported but not gated (corpus-dependent policy).

    Everything is one narrow whole-stage-codegen projection — higher-order
    array expressions (``transform``/``filter`` over the line split), no
    Python, no shuffle; at 100 TB this fuses into the scan alongside any
    other per-row screen. Determinism: integer counts and two IEEE
    divisions of exact integers — bit-identical across engines. Empty
    content yields ``alnum_frac = 0.0`` and fails the keep gate (a
    zero-byte file carries no signal)."""
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    n_lines = F.size(lines).cast("bigint")
    max_line = F.array_max(F.transform(lines, lambda l: F.length(l))).cast("bigint")
    n_comment = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^(//|#|/\*)"))
    ).cast("bigint")
    total_len = F.length(t)
    alnum_len = F.length(F.regexp_replace(t, r"[^A-Za-z0-9]", ""))
    alnum_frac = F.when(total_len > 0, alnum_len / total_len).otherwise(F.lit(0.0))
    avg_line = total_len / n_lines
    gen = None
    for m in GENERATED_MARKERS:
        hit = F.contains(t, F.lit(m))
        gen = hit if gen is None else (gen | hit)
    keep = (
        (~gen)
        & (max_line <= F.lit(max_line_len))
        & (avg_line <= F.lit(max_avg_line_len))
        & (alnum_frac >= F.lit(min_alnum_frac))
    )
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        max_line.alias("max_line_len"),
        avg_line.cast("double").alias("avg_line_len"),
        alnum_frac.cast("double").alias("alnum_frac"),
        (n_comment / n_lines).cast("double").alias("comment_line_frac"),
        gen.alias("is_generated"),
        keep.alias("keep"),
    )


def domain_screen(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocklist: Sequence[str],
) -> DataFrame:
    """URL/domain blocklist screen — the C4/RefinedWeb provenance gate
    (Raffel et al. 2020 §2.2 ran a curated blocklist over Common Crawl;
    RefinedWeb §3.1 the same): ``id_col, host, blocked`` per document.
    ``host`` is the lowercased authority of the URL (scheme://HOST/...,
    port/path/query stripped); ``blocked`` is True when the host equals a
    blocklisted domain OR is a subdomain of one (suffix match on
    ``.domain``) — exact-host lists miss ``cdn.bad.example``, naive
    substring lists false-positive ``notbad.example``. NULL or
    unparseable URLs yield NULL host and blocked=False (no provenance =
    no verdict; route them to a not-null rule if absence should fail).

    Pure per-row expression (one regexp_extract + an OR-chain of literal
    comparisons — no regex per blocklist entry, RE2/Java-portable): fuses
    into the scan, zero shuffles, and the blocklist travels as plan
    literals (the broadcast-dim degenerate). Contract: blocklist entries
    are lowercase bare domains, non-empty."""
    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    for b in blocklist:
        if not b or b != b.lower() or "/" in b or ":" in b:
            raise ValueError(f"blocklist entries must be lowercase bare domains: {b!r}")
    host = F.lower(F.regexp_extract(F.col(url_col), "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    host = F.when(host != "", host)  # unparseable -> NULL
    blocked = F.lit(False)
    for b in blocklist:
        blocked = blocked | (host == b) | host.endswith("." + b)
    return df.select(
        F.col(id_col),
        host.alias("host"),
        F.coalesce(blocked, F.lit(False)).alias("blocked"),
    )
