"""SparkSession factory with scale-appropriate defaults.

The reference runs eager single-threaded pandas (no session concept). Here the
session is configured for the plans this engine emits: AQE on (runtime shuffle
coalescing + skew-join splitting), Arrow on (the drift statistic is the one
pandas UDF), and a shuffle-partition count suited to the local[] harness while
remaining a plain config knob for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # AQE: coalesce small shuffle partitions, split skewed ones at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the pandas-UDF drift path (SURVEY.md §2.10) — batched, not per-row.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast dims/rulebooks aggressively; every join in this engine is
    # intentionally broadcastable (SURVEY.md §2.3: "every join ... is a
    # broadcast join except the uniqueness self-check").
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI on (the Spark 4 default, pinned explicitly): a VALIDATION engine
    # must fail loudly on overflow / invalid casts in its own arithmetic,
    # never silently null them into wrong verdicts. Every oracle-facing cast
    # in this repo is null-safe by construction under ANSI (string-widening
    # casts, guarded numeric casts, bounded decimal arithmetic).
    "spark.sql.ansi.enabled": "true",
    # Local harness default; a real cluster sets this per input size.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_session(
    app_name: str = "data-validator-guard-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback ``local[*]``)
    in the sandbox; on a real cluster it comes from spark-submit and is left
    unset here.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
