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


# BOM signatures in sniff order (longest first — UTF-32 LE's BOM starts with
# UTF-16 LE's two bytes).
_BOMS = (
    (b"\x00\x00\xfe\xff", "UTF-32BE"),
    (b"\xff\xfe\x00\x00", "UTF-32LE"),
    (b"\xef\xbb\xbf", "UTF-8"),
    (b"\xfe\xff", "UTF-16BE"),
    (b"\xff\xfe", "UTF-16LE"),
)


def detect_encoding(spark: SparkSession, path: str, sample_files: int = 4) -> str:
    """Encoding detection for text sources (S3; the reference sniffs with
    chardet per file, `database/db.py:82-90`).

    Distributed-safe shape: sample the first ``sample_files`` files via the
    ``binaryFile`` reader (driver sees only K × leading bytes, never file
    bodies at scale), sniff BOMs, else try strict UTF-8 and fall back to
    ISO-8859-1 (which decodes any byte sequence). Heuristic by nature —
    callers with a known contract should pass the encoding explicitly.
    """
    rows = (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .limit(sample_files)
        .collect()
    )
    votes: list[str] = []
    for (data,) in rows:
        head = bytes(data[:4096])
        enc = None
        for bom, name in _BOMS:
            if head.startswith(bom):
                enc = name
                break
        if enc is None:
            try:
                head.decode("utf-8")
                enc = "UTF-8"
            except UnicodeDecodeError:
                enc = "ISO-8859-1"
        votes.append(enc)
    if not votes:
        return "UTF-8"
    # majority vote, ties broken by first-seen (deterministic: binaryFile
    # lists files in path order)
    return max(votes, key=lambda e: (votes.count(e), -votes.index(e)))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ";",
    encoding: str | None = None,
) -> DataFrame:
    """CSV scan with explicit schema (S1 analog) — no schema sniffing: the
    engine's input contract declares schema + separator up front.
    ``encoding=None`` keeps the reader default (UTF-8); pass
    ``detect_encoding(...)``'s result to mirror the reference's sniffing
    ingest (S3) when the contract is unknown."""
    reader = spark.read.option("header", True).option("sep", sep).schema(schema)
    if encoding is not None:
        reader = reader.option("encoding", encoding)
    return reader.csv(path)


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
