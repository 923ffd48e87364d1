"""Sequence packing for LLM pretraining: concat-and-chunk over hash shards.

The standard pretraining data layout concatenates documents into a token
stream and slices it into fixed-length context windows. A faithful greedy
"reset the accumulator per bin" packer is a sequential fold — inherently
single-threaded — so the scalable formulation used here (and by real
pipelines) is OFFSET packing: documents are assigned a deterministic shard,
ordered within the shard by a stable hash, and each document's bin span is a
pure function of its cumulative token offset. Every shard packs
independently — the only window is ``partitionBy(shard)``, so a 1000-executor
cluster packs 1000+ shards with zero cross-shard coordination, and adding a
shard never changes another shard's layout.

Determinism: shard and order derive from md5(id) (portable: DuckDB
reproduces both the 3-nibble shard bucket and the hex-string sort), token
counts from the engine-portable BPE-ish regex (`operators/text.py`), and all
outputs are exact integers — no float ever decides a bin boundary.

Reference has no packing; this extends the training-data family
(SURVEY.md LLM-pipeline operators) the same way dedup/contamination do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_validator_guard_spark.operators.text import word_token_count


def _hex_nibble_bucket(col, n_buckets: int):
    """First-3-hex-nibbles md5 bucket in [0, n_buckets) — same arithmetic the
    split/packing oracles reproduce with strpos in DuckDB."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 3), 16, 10).cast("bigint")
        % n_buckets
    )


def auto_n_shards(
    n_rows: int,
    avg_doc_tokens: int = 200,
    target_shard_tokens: int = 50_000_000,
) -> int:
    """Shard count so each shard's window state stays bounded:
    ``n_shards ≈ n_rows * avg_doc_tokens / target_shard_tokens`` (mirrors
    ``auto_n_planes``, dedup.py). Each shard is ONE window partition whose
    rows sort on a single executor — the fixed default ``n_shards=8`` that is
    fine at sandbox scale is executor-memory-bound at 100 TB, so callers at
    unknown scale should pass ``n_shards=auto_n_shards(df.count())`` (one
    cheap count job). NOTE: changing the shard count changes the layout —
    shard assignment and within-shard order are deterministic PER shard
    count, not across shard counts; pin ``n_shards`` explicitly when two runs
    must produce identical layouts."""
    import math

    total = max(1, n_rows) * max(1, avg_doc_tokens)
    return max(1, math.ceil(total / target_shard_tokens))


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Offset-pack documents into ``ctx_len``-token windows per shard.

    Returns ``id_col, shard, n_tokens, start_offset, first_bin, n_bins``:
    the document's tokens occupy stream offsets
    ``[start_offset, start_offset + n_tokens)`` of its shard, spanning bins
    ``first_bin .. first_bin + n_bins - 1`` (``n_bins = 0`` for an empty
    document). ``sum(n_bins)`` over a shard bounds its padding-free window
    count; downstream slicing is a pure per-bin gather.

    Contract on ``n_shards``: the default (8) suits sandbox-scale corpora
    only — each shard sorts on one executor, so at scale derive it from
    corpus volume via :func:`auto_n_shards` (layout-changing; see its note).
    """
    if ctx_len <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")
    idc = F.col(id_col)
    base = df.select(
        idc,
        _hex_nibble_bucket(idc, n_shards).alias("shard"),
        F.md5(idc.cast("string")).alias("__h"),
        word_token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    # total order inside the shard: (hash, id) — id is unique, so the RANGE
    # pitfall of sum-over-ordered-window never applies, but ROWS is explicit
    # anyway to pin running-sum (not peer-group) semantics.
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    first_bin = F.floor((cum - F.col("n_tokens")) / ctx_len).cast("bigint")
    last_bin = F.floor((cum - 1) / ctx_len).cast("bigint")
    return base.select(
        idc,
        "shard",
        "n_tokens",
        start,
        first_bin.alias("first_bin"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint"))
        .otherwise(last_bin - first_bin + 1)
        .alias("n_bins"),
    )


def packing_summary(packed: DataFrame, ctx_len: int) -> DataFrame:
    """Per-shard packing accounting over :func:`pack_sequences` output:
    ``shard, n_docs, total_tokens, n_windows, waste_tokens`` where
    ``n_windows = ceil(total_tokens / ctx_len)`` and ``waste_tokens`` is the
    final window's padding — exact integers, one shuffle on shard."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.floor((F.col("total_tokens") + ctx_len - 1) / ctx_len)
            .cast("bigint")
            .alias("n_windows"),
            (
                F.floor((F.col("total_tokens") + ctx_len - 1) / ctx_len) * ctx_len
                - F.col("total_tokens")
            )
            .cast("bigint")
            .alias("waste_tokens"),
        )
    )
