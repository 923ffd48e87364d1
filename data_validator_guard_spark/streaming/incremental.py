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
