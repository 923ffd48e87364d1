"""Temporal operators Spark lacks as primitives: as-of join, sessionization.

Neither exists in the reference (its only temporal logic is the ±10-day
visit-window check, `maganamed_validation.py:283-296`); both are table stakes
for event/training-data pipelines, so the engine provides them as
compositions of existing DataFrame ops (SURVEY-prompt contract: composition
first, pandas UDF only if semantics demand it — they don't here).

Scale design:
- ``asof_join``: the union trick — tag both sides, union, one window sorted
  by (key, ts, side) carrying the right side's payload forward, keep left
  rows. ONE shuffle on the key (the window partition); no range explosion,
  no nested-loop join. Skewed keys can be pre-salted by bucketing ts.
- ``sessionize``: gap-threshold sessions via lag + conditional cumulative
  sum over (key, ts) — one shuffle, pure window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` for the same key (ASOF LEFT JOIN semantics;
    ties on equal timestamps take the right row — "as of now" includes now).

    Returns all left columns plus ``<value_col><suffix>`` for each requested
    right value column (NULL when no prior right row exists).
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ats", F.col(left_ts))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ats"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = lt.select(
        *left.columns,
        "__side",
        "__ats",
        *[F.lit(None).cast(dict(rt.dtypes)[f"{c}{suffix}"]).alias(f"{c}{suffix}") for c in value_cols],
    ).unionByName(rt.select(*left.columns, "__side", "__ats", *[f"{c}{suffix}" for c in value_cols]))

    # right rows sort before left rows at the same timestamp (__side 0 < 1),
    # so an equal-ts right row IS visible to the left row. The value columns
    # complete the sort as a deterministic tiebreak: when several right rows
    # share (key, ts), the carried value is the GREATEST (value_cols) tuple —
    # fixed across runs/partitionings instead of whichever row happened to
    # sort last (nulls first, so a non-null value wins over a null one).
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("__ats"),
            F.col("__side"),
            *[F.col(f"{c}{suffix}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *left.columns,
        "__side",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Gap-based sessionization: rows of the same ``key`` whose timestamps
    are within ``gap_minutes`` of the previous row share a session.

    Adds ``session_seq`` (0-based per key, in time order) and ``session_id``
    (``"<key>#<seq>"``). Ties on equal timestamps are ordered by the full
    row's remaining sort stability via the timestamp only — callers needing a
    total order should pass a deduplicated or uniquely-timestamped frame.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts))
    # unix_micros keeps the comparison in exact integer microseconds
    # (TIMESTAMP_NTZ has no direct numeric cast; session tz is UTC)
    micros = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(micros).over(w)
    gap = micros - prev
    new_session = F.when(
        prev.isNull() | (gap > F.lit(int(gap_minutes * 60_000_000))), F.lit(1)
    ).otherwise(F.lit(0))
    seq = F.sum(new_session).over(
        Window.partitionBy(key).orderBy(F.col(ts)).rowsBetween(Window.unboundedPreceding, 0)
    ) - 1
    return df.withColumn("session_seq", seq.cast("bigint")).withColumn(
        "session_id", F.concat(F.col(key).cast("string"), F.lit("#"), F.col("session_seq"))
    )
