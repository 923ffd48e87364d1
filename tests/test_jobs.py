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


def _natural_text(stem: str, n: int = 100) -> str:
    """Synthetic doc that passes every quality screen: mostly-unique words
    (low repetition) with a stopword every 5th position (healthy stopword
    ratio), length well over the 64-char floor."""
    stop_cycle = ["the", "of", "and", "to", "in", "a"]
    words: list[str] = []
    for i in range(n):
        words.append(f"{stem}{i}")
        if i % 5 == 0:
            words.append(stop_cycle[(i // 5) % 6])
    return " ".join(words)


def test_curate_drops_planted_low_stopword_doc(spark, tmp_path):
    """Round-2 verdict regression: the job's stopword screen was a silent
    no-op (`< 0.0`). A long, stopword-free, non-repetitive doc MUST land in
    dropped/ with reason low_stopword; a clean natural-language doc must
    survive to a split."""
    from pyspark.sql import functions as F

    from jobs.curate import curate

    # ~120 distinct pseudo-words, zero stopwords → stopword ratio 0 < 0.01
    low_stop_text = " ".join(f"zq{i}xv" for i in range(120))
    clean_text = _natural_text("word")
    docs = spark.createDataFrame(
        [(1, low_stop_text), (2, clean_text)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "curated")
    stats = curate(spark, docs, out)

    assert stats["n_dropped"] == 1
    dropped = spark.read.parquet(out + "/dropped")
    row = dropped.filter(F.col("doc_id") == 1).collect()
    assert len(row) == 1 and "low_stopword" in row[0]["reasons"]
    assert stats["n_deduped"] == 1  # the clean doc survived the screen


def test_curation_disposition_labels(spark):
    """Every pipeline stage visible in one frame: planted dropped, duplicate,
    and contaminated docs get exactly their label."""
    from pyspark.sql import functions as F

    from data_validator_guard_spark.operators.quality import curation_disposition

    clean = _natural_text("alpha")
    other = _natural_text("beta")
    rows = [
        (1, clean),          # survivor of the {1, 7} duplicate group
        (7, clean + " "),    # same normalized fingerprint → duplicate
        (3, "short"),        # fails min_chars → dropped
        (4, other),
    ]
    disp = {
        r["doc_id"]: r["disposition"]
        for r in curation_disposition(
            spark.createDataFrame(rows, "doc_id bigint, text string")
        ).collect()
    }
    assert disp[3] == "dropped"
    assert disp[7] == "duplicate"
    assert disp[1] in ("train", "val", "test")
    assert disp[4] in ("train", "val", "test")

    # contamination requires an EXTERNAL benchmark corpus (exact dedup makes
    # internal-split contamination impossible): a train survivor whose
    # content matches a benchmark doc must flip to 'contaminated'.
    from data_validator_guard_spark.operators.quality import split_bucket

    probe = spark.range(0, 200).select(
        F.col("id"), split_bucket(F.col("id")).alias("b")
    )
    train_id = next(r["id"] for r in probe.collect() if r["b"] < 80)
    solo = spark.createDataFrame(
        [(int(train_id), clean)], "doc_id bigint, text string"
    )
    benchmark = spark.createDataFrame([(clean + "  ",)], "text string")
    with_eval = {
        r["doc_id"]: r["disposition"]
        for r in curation_disposition(solo, eval_docs=benchmark).collect()
    }
    assert with_eval[int(train_id)] == "contaminated"
    without_eval = {
        r["doc_id"]: r["disposition"] for r in curation_disposition(solo).collect()
    }
    assert without_eval[int(train_id)] == "train"
