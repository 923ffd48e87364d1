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


def fuzzy_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.7,
    max_bucket: int | None = None,
) -> DataFrame:
    """Eval documents NEAR-duplicating any train document (the fuzzy third
    strength, between ``exact_contamination`` and raw n-gram overlap):
    ``eval_id, train_id, jaccard`` for every cross-corpus pair with exact
    Jaccard >= ``threshold`` — the MinHash decontamination pass frontier
    training pipelines run so a lightly-edited eval document (reformatted,
    suffixed, translated boilerplate) cannot hide from the verbatim check.

    Cross-corpus LSH, reusing the dedup machinery end to end: sign both
    sides (k MinHashes over word n-gram shingles), band, cap degenerate
    buckets over the COMBINED band population (same semantics as
    ``incremental_near_duplicates``), and generate candidates from
    eval-band x train-band collisions ONLY — train x train and eval x eval
    pairs are never formed, so candidate work is proportional to genuine
    cross-corpus collisions, not either corpus squared. Verification is
    exact Jaccard over shingles semi-joined down to candidate ids before
    the intersection join. Contract (as for the incremental miner): ids
    must be disjoint across the two sides.
    """
    from data_validator_guard_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
        _band_table,
        _cap_buckets,
        _track_persist,
        jaccard_verify,
        minhash_signature,
    )

    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET
    t_sig = _track_persist(minhash_signature(train, text_col, id_col, k, n))
    e_sig = _track_persist(minhash_signature(eval_df, text_col, id_col, k, n))
    banded = (
        _band_table(e_sig, k, bands)
        .withColumn("is_eval", F.lit(True))
        .unionByName(_band_table(t_sig, k, bands).withColumn("is_eval", F.lit(False)))
    )
    banded = _track_persist(_cap_buckets(banded, ["band", "val"], max_bucket))
    e = banded.filter(F.col("is_eval")).alias("e")
    t = banded.filter(~F.col("is_eval")).alias("t")
    pairs = (
        e.join(
            t,
            (F.col("e.band") == F.col("t.band")) & (F.col("e.val") == F.col("t.val")),
        )
        .select(F.col("e.id").alias("id1"), F.col("t.id").alias("id2"))
        .distinct()
    )
    pairs = _track_persist(pairs)
    cand_ids = (
        pairs.select(F.col("id1").alias("id"))
        .unionByName(pairs.select(F.col("id2").alias("id")))
        .distinct()
    )
    # jaccard_verify reads the shingle frame from several subplans (sizes,
    # both join sides); persist the candidate-pruned frame once or each
    # reference re-explodes BOTH corpora into n-grams (the minhash_near_
    # duplicates persist rationale — verified by plan audit: 248 static
    # scans without this persist, 10 with).
    shingles = _track_persist(
        shingle_table(eval_df, text_col, id_col, n)
        .unionByName(shingle_table(train, text_col, id_col, n))
        .join(cand_ids, "id", "left_semi")
    )
    return jaccard_verify(pairs, shingles, threshold).select(
        F.col("id1").alias("eval_id"), F.col("id2").alias("train_id"), "jaccard"
    )
