"""Shared quality-filter + curation-disposition operators.

ONE implementation of the Dolma/Gopher-style document quality screen, used by
BOTH the ``quality_filter_pipeline`` registry query and the end-to-end
curation job (``jobs/curate.py``) — round 2 carried two hand-copied variants
whose thresholds drifted (the job's stopword predicate read ``< 0.0``, a
no-op); sharing the expression kills that class of bug.

``curation_disposition`` folds the whole curation pipeline
(filter → exact dedup → deterministic split → decontamination) into one
per-document label, so the pipeline's *semantics* — not just its stage
counts — are SQL-oracle-checkable (the ``curation_pipeline`` registry query).

Scale shape: everything is expression-level except two shuffles, both on the
content fingerprint (md5 — uniform, skew-free): the survivor window and the
eval-fingerprint decontamination join. No UDFs, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_validator_guard_spark.operators.text import (
    PII_PATTERNS,
    STOPWORD_PATTERN,
    normalize_text,
)

# Default thresholds — the single source of truth for both the registry query
# and the curation job (SQL oracles hard-code the same literals).
MIN_CHARS = 64
MAX_CHARS = 100_000
MIN_STOPWORD_RATIO = 0.01
MAX_REPETITION = 0.6


def quality_flag_conditions(
    text: Column,
    min_chars: int = MIN_CHARS,
    max_chars: int = MAX_CHARS,
    min_stopword_ratio: float = MIN_STOPWORD_RATIO,
    max_repetition: float = MAX_REPETITION,
) -> list[tuple[Column, str]]:
    """The (condition, reason) list of the quality screen, in fixed order:
    too_short, too_long, low_stopword, too_repetitive, has_pii (email).

    Pure Column expressions — length / split / regexp_count, all JVM-side.
    The two ratios are each ONE IEEE division of exact integer counts, so a
    SQL oracle reproduces the booleans bit-for-bit.
    """
    tr = F.trim(text)
    n_chars = F.length(text)
    n_tokens = F.when(F.length(tr) == 0, F.lit(0)).otherwise(F.size(F.split(tr, r"\s+")))
    n_distinct = F.size(F.array_distinct(F.split(tr, r"\s+")))
    n_stop = F.regexp_count(text, F.lit(STOPWORD_PATTERN))
    n_email = F.regexp_count(text, F.lit(PII_PATTERNS["email"]))
    return [
        (n_chars < min_chars, "too_short"),
        (n_chars > max_chars, "too_long"),
        (
            (n_tokens > 0)
            & (n_stop.cast("double") / n_tokens.cast("double") < min_stopword_ratio),
            "low_stopword",
        ),
        (
            (n_tokens > 0)
            & (
                F.lit(1.0) - n_distinct.cast("double") / n_tokens.cast("double")
                > max_repetition
            ),
            "too_repetitive",
        ),
        (n_email > 0, "has_pii"),
    ]


def with_quality(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Append ``keep`` (boolean) and ``reasons`` (comma-joined flags, '' when
    clean) columns to ``df`` — the composable form both the query and the
    curation job build on."""
    flags = quality_flag_conditions(F.col(text_col), **thresholds)
    drop = flags[0][0]
    for cond, _ in flags[1:]:
        drop = drop | cond
    return df.withColumn("keep", ~drop).withColumn(
        "reasons", F.concat_ws(",", *[F.when(c, F.lit(name)) for c, name in flags])
    )


def split_bucket(id_col: Column) -> Column:
    """Deterministic 0..99 split bucket from the first 3 hex nibbles of
    md5(id) — stable under corpus growth (adding rows never reshuffles
    existing assignments, unlike RNG sampling)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 3), 16, 10).cast("bigint")
        % 100
    )


def split_name(bucket: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def curation_disposition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_docs: DataFrame | None = None,
    **thresholds,
) -> DataFrame:
    """One row per input document: ``(id_col, disposition, reasons)`` with
    disposition ∈ {dropped, duplicate, contaminated, train, val, test}.

    Pipeline semantics, in order (each doc gets exactly one label):

    - **dropped** — failed the quality screen (``reasons`` says why);
    - **duplicate** — passed the screen but is not the min-id survivor of its
      exact-content fingerprint group;
    - survivors are split **train/val/test** by md5 bucket of the id;
    - **contaminated** — a train survivor whose fingerprint appears among
      val/test survivors or in ``eval_docs`` (an external benchmark corpus —
      the decontamination that actually bites: within a self-split, exact
      dedup already guarantees one survivor per fingerprint, so
      internal-split contamination is structurally impossible and the label
      exists to guard weaker-than-fingerprint dedup variants).

    Execution shape: quality flags are pure expressions over the scan; the
    survivor choice is a window min over the fingerprint (one shuffle on an
    md5 key — uniform by construction); decontamination is an equi-join on
    the same fingerprint key (exchange reusable). Nothing touches the driver.
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    base = with_quality(docs, text_col, **thresholds).select(
        F.col(id_col), "keep", "reasons", fp.alias("__fp")
    )
    w = Window.partitionBy("__fp")
    enriched = (
        base.withColumn(
            "__min_kept", F.min(F.when(F.col("keep"), F.col(id_col))).over(w)
        )
        .withColumn(
            "__surv",
            F.coalesce(F.col("keep") & (F.col(id_col) == F.col("__min_kept")), F.lit(False)),
        )
        .withColumn("__split", split_name(split_bucket(F.col(id_col))))
    )
    eval_fps = enriched.filter(
        F.col("__surv") & (F.col("__split") != "train")
    ).select("__fp")
    if eval_docs is not None:
        eval_fps = eval_fps.unionByName(
            eval_docs.select(F.md5(normalize_text(F.col(text_col))).alias("__fp"))
        )
    eval_fps = eval_fps.distinct().withColumn("__in_eval", F.lit(True))
    disposition = (
        F.when(~F.col("keep"), F.lit("dropped"))
        .when(~F.col("__surv"), F.lit("duplicate"))
        .when(
            (F.col("__split") == "train") & F.col("__in_eval").isNotNull(),
            F.lit("contaminated"),
        )
        .otherwise(F.col("__split"))
    )
    return enriched.join(eval_fps, "__fp", "left").select(
        F.col(id_col), disposition.alias("disposition"), F.col("reasons")
    )
