"""Snapshot-diff incremental validation: re-validate only changed partitions.

At 10^12 rows a daily validation run cannot re-scan the whole corpus when a
few repos changed. The reference's nearest analog is its clone-then-process
cycle (`/root/reference/database/db.py:113-126` clones the table, then every
check re-reads it whole); here the cycle becomes incremental, the distributed
way:

1. **Fingerprint** each partition of both snapshots in ONE aggregation pass
   per side: per partition, the exact row count plus two order-insensitive
   96-bit-wide hash sums (the two 48-bit halves of ``md5`` over the
   per-field-hashed row image, summed exactly in ``decimal(38,0)``). A sum is
   commutative and multiplicity-sensitive, so any insert / delete / update /
   duplicate-count change flips the fingerprint regardless of row order or
   physical layout — and the same arithmetic is bit-identical in any engine
   (the md5 + exact-integer construction every sampling/split oracle here
   uses).
2. **Diff** the two fingerprint frames (tiny: one row per partition) to the
   changed-partition set. The collect is guarded like the engine's inline-FK
   dim (fail fast over ``max_partitions``, never an unbounded driver pull).
3. **Re-validate** only rows whose partition expression falls in the changed
   set — an ``isin`` filter on literals, so when the partition expression is
   (or derives from) a physical partition column, Catalyst prunes unchanged
   files from the SCAN, not just from the result. Verdicts for unchanged
   partitions are carried from the prior run's output (in production: the
   ledger store this engine already checkpoints; see ``ledger.py``).

Partitions present only in the OLD snapshot (dropped data) disappear from the
merged verdicts — their rows no longer exist to certify. Partitions present
only in the NEW snapshot are recomputed like any changed partition.

Collision note: 2x48-bit sums make an accidental fingerprint collision
vanishingly unlikely but not impossible; a production deployment that needs
cryptographic certainty can widen to the full md5 (four 32-hex-digit sums)
at the same single-scan cost. The *shape* — one narrow agg per snapshot, a
broadcast-scale diff, a pruned re-scan — is the point.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validator_guard_spark.rules import RuleSuite

def _partition_col(suite_partition_by: str) -> Column:
    # identical null-safe rendering to engine.validate's partition column
    return F.coalesce(F.expr(suite_partition_by).cast("string"), F.lit("__null__"))


def _row_image(cols: Sequence[str]) -> Column:
    """md5 over the concatenation of PER-FIELD md5s (each tagged 'v:'/'n:'
    for value-vs-NULL). Hashing each field first makes the row image immune
    to delimiter injection — a naive ``concat_ws(sep, ...)`` image collides
    ('a'+sep, 'b') with ('a', sep+'b') and NULL with a literal sentinel
    byte, which on arbitrary-bytes columns (source-code ``content``) would
    let a real edit slip past the fingerprint. Field hashes are fixed-width
    hex, so plain concatenation is unambiguous."""
    fields = [
        F.md5(
            F.when(F.col(c).isNull(), F.lit("n:")).otherwise(
                F.concat(F.lit("v:"), F.col(c).cast("string"))
            )
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("", *fields))


def partition_fingerprints(
    df: DataFrame, partition_by: str, fingerprint_cols: Sequence[str]
) -> DataFrame:
    """One narrow aggregation pass: ``partition, n_rows, fp_lo, fp_hi`` where
    fp_lo/fp_hi are exact decimal(38,0) sums of the two 48-bit halves of
    md5 over the row image. Order-insensitive, multiplicity-sensitive,
    engine-portable."""
    img = _row_image(fingerprint_cols)
    lo = F.conv(F.substring(img, 1, 12), 16, 10).cast("bigint").cast("decimal(38,0)")
    hi = F.conv(F.substring(img, 13, 12), 16, 10).cast("bigint").cast("decimal(38,0)")
    return df.groupBy(_partition_col(partition_by).alias("partition")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(lo).alias("fp_lo"),
        F.sum(hi).alias("fp_hi"),
    )


def changed_partitions(
    old_fp: DataFrame, new_fp: DataFrame, max_partitions: int = 100_000
) -> list[str]:
    """Partitions whose (count, fp_lo, fp_hi) differ between snapshots, or
    that exist on only one side. Guarded driver collect: partition counts
    are bounded by design (they key verdicts, ledgers, and resume units);
    a runaway partition expression fails fast instead of OOMing the driver."""
    o = old_fp.select(
        "partition",
        F.col("n_rows").alias("o_n"),
        F.col("fp_lo").alias("o_lo"),
        F.col("fp_hi").alias("o_hi"),
    )
    n = new_fp.select(
        "partition",
        F.col("n_rows").alias("n_n"),
        F.col("fp_lo").alias("n_lo"),
        F.col("fp_hi").alias("n_hi"),
    )
    diff = (
        o.join(n, "partition", "full_outer")
        .filter(
            ~(
                F.col("o_n").eqNullSafe(F.col("n_n"))
                & F.col("o_lo").eqNullSafe(F.col("n_lo"))
                & F.col("o_hi").eqNullSafe(F.col("n_hi"))
            )
        )
        .select("partition")
    )
    rows = diff.limit(max_partitions + 1).collect()
    if len(rows) > max_partitions:
        raise ValueError(
            f"more than {max_partitions} changed partitions — the partition "
            "expression is too fine-grained for incremental validation "
            "(or the whole corpus changed; run a full validate instead)"
        )
    return sorted(r[0] for r in rows)


def incremental_validate(
    old_df: DataFrame,
    new_df: DataFrame,
    suite: RuleSuite,
    prior_verdicts: DataFrame | None = None,
    fingerprint_cols: Sequence[str] | None = None,
    max_partitions: int = 100_000,
) -> DataFrame:
    """Verdicts for the NEW snapshot, recomputing only changed partitions.

    Returns the full verdict frame (``rule_id, partition, pass, n_rows,
    n_violations``) plus ``recomputed`` — True where this run actually
    re-scanned the partition, False where the verdict is carried from
    ``prior_verdicts`` (defaults to validating ``old_df``, which a real
    deployment replaces with the stored output of the previous run — the
    ledger already persists exactly this frame per snapshot).

    Scale shape: 2 fingerprint scans (narrow: partition expr + fingerprint
    columns), a partition-count-sized diff, then ONE re-validation whose
    input filter is an ``isin`` over literal changed-partition values —
    prunable at the scan when the partition expression is physical.
    """
    from data_validator_guard_spark.engine import validate

    cols = list(fingerprint_cols) if fingerprint_cols else list(new_df.columns)
    changed = changed_partitions(
        partition_fingerprints(old_df, suite.partition_by, cols),
        partition_fingerprints(new_df, suite.partition_by, cols),
        max_partitions=max_partitions,
    )
    part = _partition_col(suite.partition_by)
    if prior_verdicts is None:
        prior_verdicts, _ = validate(old_df, suite)
    carried = prior_verdicts.filter(~F.col("partition").isin(changed)).withColumn(
        "recomputed", F.lit(False)
    )
    if not changed:
        return carried
    fresh, _ = validate(new_df.filter(part.isin(changed)), suite)
    return carried.unionByName(fresh.withColumn("recomputed", F.lit(True)))
