"""End-to-end job smoke tests (the spark-submit surface run in-process)."""

from __future__ import annotations


def test_curate_pipeline_end_to_end(spark, tmp_path):
    """filter -> dedup -> split -> decontaminate -> chunk over sf0.001 docs:
    stage counts must be consistent and the train split free of eval
    fingerprints."""
    from pyspark.sql import functions as F

    from jobs.curate import curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "curated")
    stats = curate(spark, docs, out)

    assert stats["n_input"] == docs.count()
    assert stats["n_dropped"] + stats["n_deduped"] <= stats["n_input"]
    assert stats["n_train"] + stats["n_val"] + stats["n_test"] <= stats["n_deduped"]
    assert stats["n_train_chunks"] >= stats["n_train"]  # >=1 chunk per doc

    # decontamination invariant: no train chunk source doc shares a
    # fingerprint with val/test
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    val = spark.read.parquet(out + "/val").select(fp.alias("f"))
    test = spark.read.parquet(out + "/test").select(fp.alias("f"))
    train_ids = spark.read.parquet(out + "/train_chunks").select("id").distinct()
    train_docs = docs.join(train_ids, docs.doc_id == train_ids.id, "left_semi")
    leaked = train_docs.select(fp.alias("f")).join(
        val.unionByName(test).distinct(), "f", "left_semi"
    )
    assert leaked.count() == 0
