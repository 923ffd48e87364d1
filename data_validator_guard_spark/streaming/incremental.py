"""Streaming validation + event-time windowed aggregation.

- :func:`validate_stream`: ``readStream`` over a parquet directory →
  ``foreachBatch`` running the batch rule engine → append verdict/violation
  parquet, exactly-once per input file via the streaming checkpoint. The rule
  engine is reused unchanged — foreachBatch hands each micro-batch to the
  same fused plans the batch path compiles.
- :func:`windowed_event_counts`: event-time tumbling-window aggregation with
  a watermark for late data — the Structured Streaming idiom the engine uses
  where the reference has nothing (SURVEY.md §2.9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_validator_guard_spark.engine import validate
from data_validator_guard_spark.rules import RuleSuite


def validate_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    suite: RuleSuite,
    out_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Validate files as they arrive under ``input_path``.

    ``available_now=True`` drains everything currently present and stops —
    the batch-resume idiom; ``False`` runs continuously. Outputs are appended
    under ``out_dir`` with a ``batch_id`` provenance column.
    """
    stream = spark.readStream.schema(schema).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        verdicts, violations = validate(batch_df, suite)
        (
            verdicts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(os.path.join(out_dir, "verdicts"))
        )
        (
            violations.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(os.path.join(out_dir, "violations"))
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Tumbling event-time window counts (works on both batch and streaming
    DataFrames; streaming adds the watermark for state eviction)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col(key_col),
            F.to_date(F.col("w.start")).alias("day"),
            F.col("n"),
        )
    )


RUNNING_VERDICT_SCHEMA = "partition string, n_rows bigint, n_violations bigint, pass boolean"
_STATE_SCHEMA = "n bigint, v bigint"


def running_verdicts_stream(
    flagged: DataFrame,
    partition_col: str = "partition",
    flag_col: str = "is_violation",
):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    cumulative per-partition verdicts across micro-batches.

    Input: a *streaming* DataFrame with ``partition_col`` and an int/bool
    ``flag_col`` (1 = the row violates). State per partition is the running
    ``(n_rows, n_violations)``; each batch emits the updated verdict row, so
    a downstream sink always holds the latest cumulative pass/fail per
    partition — the engine's verdict contract made incremental. State lives
    in the streaming state store (checkpointed, restart-safe).
    """
    import pandas as pd  # local import: keep module import light

    def update(key, pdfs, state):
        n, v = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v += int(pdf[flag_col].astype("int64").sum())
        state.update((n, v))
        yield pd.DataFrame(
            {
                "partition": [key[0]],
                "n_rows": [n],
                "n_violations": [v],
                "pass": [v == 0],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        flagged.groupBy(F.col(partition_col).alias("partition"))
        .applyInPandasWithState(
            update,
            RUNNING_VERDICT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first arrival per key wins; later arrivals of
    the same key are dropped as long as they land within ``watermark`` of the
    stream's event-time frontier. ``dropDuplicatesWithinWatermark`` keeps key
    state only inside the watermark horizon, so state is bounded by the
    arrival-skew window — not by total corpus cardinality — which is what
    makes exact streaming dedup viable at 10^12-file scale (the batch
    ``dedup_exact`` handles the unbounded-history case; this handles the
    continuously-arriving case). The dedup state lives in the checkpointed
    state store: a restarted query still drops duplicates of keys it saw
    before the restart (pinned by the restart test)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def minhash_signature_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n: int = 3,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming near-dup bridge, emit side: per-micro-batch MinHash
    signature (and shingle) emission into an append-only parquet store.

    The batch MinHash family (``dedup.minhash_near_duplicates``) assumes the
    whole corpus is in hand; a continuously-arriving corpus instead computes
    each document's signature ONCE, on arrival, and accumulates it — pairing
    then runs periodically over the store
    (:func:`near_duplicates_from_store`) without ever re-hashing old
    documents. foreachBatch reuses the batch emitters unchanged
    (``minhash_signature`` / ``shingle_table``); exactly-once per input file
    via the streaming checkpoint, so a restarted query neither re-emits nor
    skips (pinned by the restart test). Shingles are stored alongside
    signatures because the pairing round's exact-Jaccard verify needs them;
    both stores grow linearly with the corpus (k hashes / distinct shingles
    per doc) and stay partitioned — nothing is driver-side.
    """
    from data_validator_guard_spark.operators.dedup import (
        minhash_signature,
        shingle_table,
    )

    stream = spark.readStream.schema(schema).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sig = minhash_signature(batch_df, text_col, id_col, k, n)
        sig.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(store_dir, "signatures")
        )
        sh = shingle_table(batch_df, text_col, id_col, n)
        sh.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(store_dir, "shingles")
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", os.path.join(store_dir, "_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def near_duplicates_from_store(
    spark: SparkSession,
    store_dir: str,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
    max_bucket: int | None = None,
) -> DataFrame:
    """Streaming near-dup bridge, pairing side: banded LSH + exact-Jaccard
    verification over the ACCUMULATED signature store — the periodic batch
    pass that completes :func:`minhash_signature_stream`. Returns
    ``id1, id2, jaccard`` exactly like ``minhash_near_duplicates``, including
    cross-batch pairs (a document that arrived in drain 1 pairs with its
    near-duplicate from drain 2). Signatures/shingles are deterministic per
    document, so if an id was ever double-emitted the duplicates are
    identical rows — collapsed here (dropDuplicates on full rows) before
    pairing. ``max_bucket`` defaults to the dedup module's cap when None.
    """
    from data_validator_guard_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
        jaccard_verify,
        lsh_candidate_pairs,
    )

    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET
    sig = (
        spark.read.parquet(os.path.join(store_dir, "signatures"))
        .drop("batch_id")
        .dropDuplicates(["id"])
    )
    shingles = (
        spark.read.parquet(os.path.join(store_dir, "shingles"))
        .drop("batch_id")
        .dropDuplicates(["id", "shingle"])
    )
    pairs = lsh_candidate_pairs(sig, k, bands, max_bucket)
    return jaccard_verify(pairs, shingles, threshold)
