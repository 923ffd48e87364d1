"""Resume test (SURVEY.md §5.2): kill-and-resume re-validates only unfinished
partitions and the final results equal a single full run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validator_guard_spark.ledger import load_results, run_with_ledger
from data_validator_guard_spark.rules import Rule, RuleSuite


@pytest.fixture()
def suite():
    return RuleSuite(
        "t",
        [
            Rule("v_not_null", "not_null", ("v",)),
            Rule("v_unique", "unique", ("grp", "v")),
        ],
        partition_by="grp",
        key_cols=("v",),
    )


def _mkdf(spark):
    rows = [(f"p{i % 4}", None if i % 11 == 0 else i % 37) for i in range(200)]
    return spark.createDataFrame(rows, "grp string, v int")


def test_resume_only_recomputes_unfinished(spark, suite, tmp_path):
    df = _mkdf(spark)
    out = str(tmp_path / "run")

    # simulated kill: first attempt saw only partitions p0/p1
    partial = df.filter(F.col("grp").isin(["p0", "p1"]))
    s1 = run_with_ledger(partial, suite, out, snapshot_id="s1", rule_version="r1")
    assert s1 == {"partitions_done_before": 0, "partitions_validated": 2}

    # resume over the full input: only p2/p3 are validated
    s2 = run_with_ledger(df, suite, out, snapshot_id="s1", rule_version="r1")
    assert s2 == {"partitions_done_before": 2, "partitions_validated": 2}

    # a third run is a no-op
    s3 = run_with_ledger(df, suite, out, snapshot_id="s1", rule_version="r1")
    assert s3 == {"partitions_done_before": 4, "partitions_validated": 0}

    # results identical to one uninterrupted run
    fresh_out = str(tmp_path / "fresh")
    run_with_ledger(df, suite, fresh_out, snapshot_id="s1", rule_version="r1")
    got_v, got_x = load_results(spark, out)
    exp_v, exp_x = load_results(spark, fresh_out)
    assert sorted(map(tuple, got_v.collect())) == sorted(map(tuple, exp_v.collect()))
    assert sorted(map(tuple, got_x.collect())) == sorted(map(tuple, exp_x.collect()))


def test_commit_point_reads_only_this_run(spark, suite, tmp_path):
    """Round-2 'what's wrong' #4: ledger entries must derive from THIS run's
    verdicts frame, not a re-read of the accumulated verdicts directory.
    Plant a foreign, schema-incompatible partition dir under verdicts/
    between runs — a commit point that rescans history would choke on (or
    absorb) it; the fixed one never touches it."""
    import os

    df = _mkdf(spark)
    out = str(tmp_path / "run")
    partial = df.filter(F.col("grp").isin(["p0", "p1"]))
    run_with_ledger(partial, suite, out, snapshot_id="s1", rule_version="r1")

    # foreign junk in the output tree (e.g. another tool's leftovers)
    junk_dir = os.path.join(out, "verdicts", "pt=__junk__")
    spark.createDataFrame([("bogus",)], "totally_different string").write.mode(
        "overwrite"
    ).parquet(junk_dir)

    s2 = run_with_ledger(df, suite, out, snapshot_id="s1", rule_version="r1")
    assert s2 == {"partitions_done_before": 2, "partitions_validated": 2}
    led = spark.read.parquet(os.path.join(out, "ledger"))
    parts = {r.partition for r in led.select("partition").distinct().collect()}
    assert parts == {"p0", "p1", "p2", "p3"}  # junk never entered the ledger


def test_new_rule_version_revalidates(spark, suite, tmp_path):
    df = _mkdf(spark)
    out = str(tmp_path / "run")
    run_with_ledger(df, suite, out, snapshot_id="s1", rule_version="r1")
    s = run_with_ledger(df, suite, out, snapshot_id="s1", rule_version="r2")
    assert s["partitions_done_before"] == 0
    assert s["partitions_validated"] == 4


def test_partial_partition_rewrite_is_idempotent(spark, suite, tmp_path):
    """A killed run that wrote parquet for a partition but died before the
    ledger append: the resume overwrites that partition's output (dynamic
    partition overwrite), never duplicates it."""
    df = _mkdf(spark)
    out = str(tmp_path / "run")
    partial = df.filter(F.col("grp") == "p0").limit(10)  # half-finished p0
    run_with_ledger(partial, suite, out, snapshot_id="s1", rule_version="r1")
    # wipe the ledger to simulate dying before the commit point
    import shutil

    shutil.rmtree(str(tmp_path / "run" / "ledger"))
    run_with_ledger(df, suite, out, snapshot_id="s1", rule_version="r1")
    got_v, _ = load_results(spark, out)
    fresh_out = str(tmp_path / "fresh")
    run_with_ledger(df, suite, fresh_out, snapshot_id="s1", rule_version="r1")
    exp_v, _ = load_results(spark, fresh_out)
    assert sorted(map(tuple, got_v.collect())) == sorted(map(tuple, exp_v.collect()))


def test_ledger_writes_mergeable_stats(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_validator_guard_spark.ledger import run_with_ledger
    from data_validator_guard_spark.operators.stats import (
        merge_column_stats,
        partial_column_stats,
    )
    from data_validator_guard_spark.rules import Rule, RuleSuite

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    suite = RuleSuite(
        "docs",
        [Rule("nb", "not_blank", ("text",))],
        partition_by="pmod(doc_id, 4)",
        key_cols=("doc_id",),
    )
    out = str(tmp_path / "out")
    run_with_ledger(df, suite, out, "snap1", "v1", stats_columns=["lang", "source"])
    stored = spark.read.parquet(out + "/stats").drop("pt")
    merged = {r.column: r.asDict() for r in merge_column_stats(stored).collect()}
    direct = {
        r.column: r.asDict()
        for r in merge_column_stats(
            partial_column_stats(df, ["lang", "source"])
        ).collect()
    }
    assert merged == direct
    assert merged["lang"]["n_rows"] == df.count()
