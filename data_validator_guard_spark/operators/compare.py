"""Cross-run verdict comparison: what regressed between two snapshots.

The reference's operational loop is "validate, fix, re-validate" (main.py
runs cleaning after validation and the DB is re-checked next run); this
operator makes the re-check diffable: given the verdicts of two runs
(e.g. two ledger outputs, or snapshot N vs N+1), emit one row per
(rule, partition) whose state changed, classified as regression / recovery /
count drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_verdicts(before: DataFrame, after: DataFrame) -> DataFrame:
    """Full-outer diff on (rule_id, partition).

    Output: ``rule_id, partition, status, pass_before, pass_after,
    n_violations_before, n_violations_after`` where status ∈
    ``regression`` (pass→fail), ``recovery`` (fail→pass), ``count_drift``
    (same pass state, violation count changed), ``appeared``/``disappeared``
    (partition or rule present on one side only). Unchanged rows are not
    emitted — at 10^6 partitions × rules the diff is the small output.
    """
    b = before.select(
        "rule_id",
        "partition",
        F.col("pass").alias("pass_before"),
        F.col("n_violations").alias("n_violations_before"),
    )
    a = after.select(
        "rule_id",
        "partition",
        F.col("pass").alias("pass_after"),
        F.col("n_violations").alias("n_violations_after"),
    )
    j = b.join(a, ["rule_id", "partition"], "full_outer")
    status = (
        F.when(F.col("pass_before").isNull(), F.lit("appeared"))
        .when(F.col("pass_after").isNull(), F.lit("disappeared"))
        .when(F.col("pass_before") & ~F.col("pass_after"), F.lit("regression"))
        .when(~F.col("pass_before") & F.col("pass_after"), F.lit("recovery"))
        .when(
            F.col("n_violations_before") != F.col("n_violations_after"),
            F.lit("count_drift"),
        )
    )
    return j.withColumn("status", status).filter(F.col("status").isNotNull()).select(
        "rule_id",
        "partition",
        "status",
        "pass_before",
        "pass_after",
        "n_violations_before",
        "n_violations_after",
    )
