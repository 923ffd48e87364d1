"""Train/eval contamination checks — the decontamination pass every serious
training pipeline runs before shipping a split (no reference ancestor; the
LLM-data extension of the dedup family, same shingle machinery).

Two strengths:
- **exact**: eval documents whose normalized fingerprint also appears in the
  train split (verbatim leakage);
- **n-gram**: eval documents sharing any word n-gram (the GPT-3 paper used
  13-grams) with any train document — catches paraphrase-adjacent leakage
  and quoted snippets.

Scale shape: the join key is the fingerprint / shingle, so the shuffle is
partitioned by content, never all-pairs; the n-gram path reuses
``dedup.shingle_table`` (distinct shingles per doc) and aggregates matches
per eval doc. Train-side shingles are the big side and stay partitioned;
no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_guard_spark.operators.dedup import shingle_table
from data_validator_guard_spark.operators.text import normalize_text


def exact_contamination(
    train: DataFrame, eval_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Eval docs verbatim-present in train: ``id, fp, n_train_copies``."""
    tfp = train.select(F.md5(normalize_text(F.col(text_col))).alias("fp"))
    tcounts = tfp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_train_copies"))
    efp = eval_df.select(
        F.col(id_col).alias("id"), F.md5(normalize_text(F.col(text_col))).alias("fp")
    )
    return efp.join(tcounts, "fp", "inner").select("id", "fp", "n_train_copies")


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Eval docs sharing >= ``min_overlap`` distinct word n-grams with the
    train split: ``id, n_shared_ngrams, n_ngrams, overlap_frac``.

    ``overlap_frac`` = shared / total distinct n-grams of the eval doc (one
    IEEE division of exact integers). Train-side n-grams are deduplicated
    before the join so a shingle repeated across many train docs costs one
    row, not a fan-out.
    """
    train_sh = shingle_table(train, text_col, id_col, n).select("shingle").distinct()
    eval_sh = shingle_table(eval_df, text_col, id_col, n)
    sizes = eval_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    shared = (
        eval_sh.join(train_sh, "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        sizes.join(shared, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_shared_ngrams"), F.lit(0)).alias("n_shared_ngrams"),
            "n_ngrams",
            (
                F.coalesce(F.col("n_shared_ngrams"), F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("overlap_frac"),
        )
        .filter(F.col("n_shared_ngrams") >= min_overlap)
    )
