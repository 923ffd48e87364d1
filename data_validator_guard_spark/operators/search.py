"""Catalog-wide substring search + schema codebook (P5, S6, M6).

The reference probes every table × column for a value with ``LIKE '%v%'
LIMIT 1`` against sqlite_master (`/root/reference/validation/seach_values.py:9-42`)
and exports a (table, column) inventory (`utils/auxiliar_functions.py:73-92`).
Here both walk the Spark catalog / supplied table map; the existence probe is
a short-circuit ``limit(1).count()`` per string column (cheap: scans stop at
the first matching row group in practice)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F


def search_value(
    spark: SparkSession, tables: dict[str, DataFrame], needle: str
) -> DataFrame:
    """``table_name, column_name, found`` for every string column."""
    rows = []
    for tname, df in tables.items():
        for f in df.schema.fields:
            if f.dataType.simpleString() != "string":
                continue
            found = (
                df.filter(F.col(f.name).contains(needle)).limit(1).count() > 0
            )
            rows.append((tname, f.name, found))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, found boolean"
    )


def codebook(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """Schema inventory: ``table_name, column_name, data_type``."""
    rows = [
        (tname, f.name, f.dataType.simpleString())
        for tname, df in tables.items()
        for f in df.schema.fields
    ]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, data_type string"
    )
