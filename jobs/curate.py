"""spark-submit entry point: end-to-end training-data curation.

Chains the pipeline operators the way a real pretraining-data run does::

    raw documents
      → quality filter (length / stopword / repetition / PII screen)
      → exact dedup (keep min-id survivor per normalized fingerprint)
      → deterministic md5 train/val/test split
      → decontamination (drop TRAIN docs whose fingerprint appears in
        val/test — eval stays pristine, train loses the leaks)
      → chunking of the train split (overlapping char windows)

Outputs under --out: ``train_chunks/ val/ test/ dropped/`` (parquet) and a
one-line JSON summary on stdout. Every stage is the same oracle-tested
operator the query registry exposes; this file only sequences them.

Example::

    spark-submit --py-files dist/dvg.zip jobs/curate.py \
        --input /data/documents --out /data/curated \
        --chunk-size 512 --stride 384
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "data_validator_guard_spark")):
    sys.path.insert(0, _repo_root)


def curate(
    spark,
    docs,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 512,
    stride: int = 384,
) -> dict:
    from pyspark.sql import functions as F

    from data_validator_guard_spark.operators.dedup import exact_duplicates
    from data_validator_guard_spark.operators.text import chunk_documents
    from data_validator_guard_spark.operators.text import normalize_text  # noqa: F401

    t = F.col(text_col)
    tr = F.trim(t)
    n_chars = F.length(t)
    n_tokens = F.when(F.length(tr) == 0, F.lit(0)).otherwise(F.size(F.split(tr, r"\s+")))
    n_distinct = F.size(F.array_distinct(F.split(tr, r"\s+")))
    n_stop = F.regexp_count(t, F.lit(r"\b(the|a|of|and|to|in)\b"))
    n_email = F.regexp_count(
        t, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    )
    drop = (
        (n_chars < 8)
        | (n_chars > 100000)
        | ((n_tokens > 0) & (n_stop.cast("double") / n_tokens.cast("double") < 0.0))
        | ((n_tokens > 0) & (F.lit(1.0) - n_distinct.cast("double") / n_tokens.cast("double") > 0.9))
        | (n_email > 0)
    )
    flagged = docs.withColumn("__drop", drop)
    flagged.filter(F.col("__drop")).drop("__drop").write.mode("overwrite").parquet(
        os.path.join(out_dir, "dropped")
    )
    kept = flagged.filter(~F.col("__drop")).drop("__drop")

    # exact dedup: keep the min-id survivor per fingerprint
    keep_ids = exact_duplicates(kept, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    deduped = kept.join(keep_ids, id_col, "left_semi")

    # deterministic split
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 3), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    with_split = deduped.withColumn("split", split)

    # decontaminate TRAIN against val/test fingerprints (exact)
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")))
    eval_fps = (
        with_split.filter(F.col("split") != "train").select(fp.alias("__fp")).distinct()
    )
    train = with_split.filter(F.col("split") == "train").withColumn("__fp", fp)
    train_clean = train.join(eval_fps, "__fp", "left_anti").drop("__fp")

    for name in ("val", "test"):
        with_split.filter(F.col("split") == name).drop("split").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, name))
    chunks = chunk_documents(train_clean, text_col, id_col, chunk_size, stride)
    chunks.write.mode("overwrite").parquet(os.path.join(out_dir, "train_chunks"))

    stats = {
        "n_input": docs.count(),
        "n_dropped": spark.read.parquet(os.path.join(out_dir, "dropped")).count(),
        "n_deduped": deduped.count(),
        "n_train": train_clean.count(),
        "n_val": spark.read.parquet(os.path.join(out_dir, "val")).count(),
        "n_test": spark.read.parquet(os.path.join(out_dir, "test")).count(),
        "n_train_chunks": spark.read.parquet(
            os.path.join(out_dir, "train_chunks")
        ).count(),
    }
    return stats


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet dir with (doc_id, text, ...)")
    p.add_argument("--out", required=True)
    p.add_argument("--chunk-size", type=int, default=512)
    p.add_argument("--stride", type=int, default=384)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dvg-curate").getOrCreate()
    docs = spark.read.parquet(args.input)
    stats = curate(
        spark, docs, args.out, chunk_size=args.chunk_size, stride=args.stride
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
