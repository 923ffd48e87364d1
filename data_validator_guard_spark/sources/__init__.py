"""Sources/sinks (SURVEY.md §2.1).

The reference ingests CSV/XLSX directory trees into SQLite
(`/root/reference/database/db.py:78-110`) with delimiter sniffing and encoding
detection. The engine's contract is schema-first columnar input: parquet (the
sandbox stand-in for Iceberg), plus CSV with an explicit schema for parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (S5 analog). Parquet → predicate pushdown,
    column pruning and partition pruning come free from the reader."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (S6 analog: the
    reference's sqlite_master catalog scan becomes spark.catalog)."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema: str, sep: str = ";") -> DataFrame:
    """CSV scan with explicit schema (S1 analog) — no sniffing: the engine's
    input contract declares schema + separator up front."""
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .schema(schema)
        .csv(path)
    )


def write_report(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Violations/verdicts sink (S7 analog). Parquet for the large path;
    single-file CSV only for small final reports."""
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "csv":
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read_source(
    spark: SparkSession, source: str, snapshot_id: str | int | None = None
) -> DataFrame:
    """Read the north-rule input table ``(repo, path, commit, lang, content)``.

    ``source`` is either an Iceberg table identifier (``catalog.db.table`` —
    requires the Iceberg runtime on the cluster classpath) or a parquet
    directory (the sandbox stand-in). For Iceberg, ``snapshot_id`` pins the
    read to a snapshot (the lineage id the ledger records), so resume always
    re-reads the exact snapshot the first attempt saw — the distributed
    version of the reference's clone-before-clean (`database/db.py:113-126`).
    """
    if os.path.exists(source) or source.endswith(".parquet"):
        return spark.read.parquet(source)
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.table(source)
