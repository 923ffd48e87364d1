"""Streaming validation: exactly-once per file via checkpoint (the streaming
analog of the batch ledger resume test)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_validator_guard_spark.rules import Rule, RuleSuite
from data_validator_guard_spark.streaming import validate_stream, windowed_event_counts

SCHEMA = "grp string, v int"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_validates_each_file_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    suite = RuleSuite("s", [Rule("v_not_null", "not_null", ("v",))], partition_by="grp")

    _write_batch(spark, inp, [("a", 1), ("a", None)])
    q = validate_stream(spark, inp, SCHEMA, suite, out)
    q.awaitTermination(120)

    v1 = spark.read.parquet(os.path.join(out, "verdicts"))
    assert v1.count() == 1
    assert v1.collect()[0].n_violations == 1

    # second file arrives; resume processes ONLY it
    _write_batch(spark, inp, [("b", 2), ("b", 3)])
    q = validate_stream(spark, inp, SCHEMA, suite, out)
    q.awaitTermination(120)

    v2 = spark.read.parquet(os.path.join(out, "verdicts"))
    got = {r.partition: (r.n_rows, r.n_violations) for r in v2.collect()}
    assert got == {"a": (2, 1), "b": (2, 0)}
    # batch ids differ -> file one was not reprocessed
    assert v2.select("batch_id").distinct().count() == 2


def test_windowed_counts_batch_parity(spark):
    df = spark.createDataFrame(
        [
            ("click", "2024-01-01 10:00:00"),
            ("click", "2024-01-01 23:00:00"),
            ("click", "2024-01-02 00:30:00"),
            ("view", "2024-01-01 05:00:00"),
        ],
        "event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r.event_type, str(r.day)): r.n for r in windowed_event_counts(df).collect()}
    assert got == {
        ("click", "2024-01-01"): 2,
        ("click", "2024-01-02"): 1,
        ("view", "2024-01-01"): 1,
    }


def test_running_verdicts_stateful(spark, tmp_path):
    """applyInPandasWithState: cumulative verdicts survive across batches and
    across a query restart (state store checkpoint)."""
    from pyspark.sql import functions as F

    from data_validator_guard_spark.streaming.incremental import running_verdicts_stream

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "partition string, is_violation int"

    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        out = running_verdicts_stream(stream)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # cumulative counters are monotone: the latest state per partition is
        # the row with max n_rows
        rows = spark.read.parquet(out_dir).collect()
        latest = {}
        for r in rows:
            cur = latest.get(r.partition)
            if cur is None or r.n_rows > cur[0]:
                latest[r.partition] = (r.n_rows, r.n_violations, r["pass"])
        return latest

    spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0)], schema
    ).write.mode("append").parquet(in_dir)
    got1 = run_once()
    assert got1["a"] == (2, 1, False)
    assert got1["b"] == (1, 0, True)

    # second batch arrives; restarted query resumes state from the checkpoint
    spark.createDataFrame([("a", 0), ("b", 1), ("b", 0)], schema).write.mode(
        "append"
    ).parquet(in_dir)
    got2 = run_once()
    assert got2["a"] == (3, 1, False)
    assert got2["b"] == (3, 1, False)
