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


def schema_check(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    expected: list[tuple[str, str, str]],
) -> DataFrame:
    """Expected-schema validation: the north rule's "schema" half made a
    first-class check (the reference guards UPDATEs with per-table
    ``PRAGMA table_info`` column-existence probes,
    `/root/reference/cleaning/cleaning_db.py:27-113`; this generalizes that
    to a declarative contract).

    ``expected``: (table, column, type) triples. Output one row per
    discrepancy: ``table_name, column_name, status, expected_type,
    actual_type`` with status ∈ 'missing_column' (declared, absent),
    'unexpected_column' (present, undeclared), 'type_mismatch', plus
    'missing_table' for declared tables not supplied. Empty output = schema
    conforms. Pure metadata — no data scan.
    """
    actual = {
        (t, f.name): f.dataType.simpleString()
        for t, df in tables.items()
        for f in df.schema.fields
    }
    exp = {(t, c): ty for t, c, ty in expected}
    exp_tables = {t for t, _, _ in expected}
    rows = []
    for t in sorted(exp_tables - set(tables)):
        rows.append((t, None, "missing_table", None, None))
    for (t, c), ty in sorted(exp.items()):
        if t not in tables:
            continue
        if (t, c) not in actual:
            rows.append((t, c, "missing_column", ty, None))
        elif actual[(t, c)] != ty:
            rows.append((t, c, "type_mismatch", ty, actual[(t, c)]))
    for (t, c), ty in sorted(actual.items()):
        if t in exp_tables and (t, c) not in exp:
            rows.append((t, c, "unexpected_column", None, ty))
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, status string, "
        "expected_type string, actual_type string",
    )
