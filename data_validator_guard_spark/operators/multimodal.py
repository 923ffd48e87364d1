"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata columns beside them. The Spark-side plumbing here is real and tested
— schema contract, Arrow-batched ``mapInPandas`` with a bounded batch shape,
deterministic partitioning — while the codec step is stubbed (the sandbox has
no image/audio libraries): ``decode_stub`` derives metadata arithmetically
from the bytes so results are deterministic and oracle-checkable; a real
deployment swaps ``_decode_batch``'s body for actual decoding.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha256 string, stub_width int, stub_height int"
)


def to_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Treat a text column as an opaque binary payload: ``doc_id, payload``."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder. Real deployments replace this body with e.g. PIL/ffmpeg
    decode of ``payload``; everything around it (batching, schema, shuffle
    shape) is production plumbing. The stub derives fake dimensions from the
    payload bytes deterministically."""
    payloads = pdf["payload"]
    n_bytes = payloads.map(len)
    sha = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes,
            "sha256": sha,
            "stub_width": (n_bytes % 640 + 1).astype("int32"),
            "stub_height": (n_bytes % 480 + 1).astype("int32"),
        }
    )


def decode_metadata(payloads: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched decode over ``(doc_id, payload)`` → DECODED_SCHEMA.

    ``mapInPandas`` streams record batches through Python; ``batch_size``
    bounds peak memory per batch (binary payloads can be MBs each — the
    config knob matters at scale, set via
    ``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """
    spark = payloads.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf)

    return payloads.mapInPandas(gen, DECODED_SCHEMA)


def decode_stub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """End-to-end: text → binary payload → batched stub decode."""
    return decode_metadata(to_binary_payload(df, text_col, id_col))


RESIZED_SCHEMA = "doc_id bigint, n_bytes bigint, width int, height int, resized_sha string"
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_sha string"


def resize_stub(
    payloads: DataFrame, width: int = 640, height: int = 480, batch_size: int = 256
) -> DataFrame:
    """STUB image resize over ``(doc_id, payload)`` → RESIZED_SCHEMA.

    Real deployments replace the hash with an actual decode+resize (PIL /
    libvips); the Arrow batch shape, schema contract and config knob are the
    production plumbing. The stub output is ``sha256(payload || "{w}x{h}")``
    — deterministic and oracle-checkable byte-for-byte.
    """
    spark = payloads.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    tag = f"{width}x{height}".encode()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            p = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": p.map(len),
                    "width": width,
                    "height": height,
                    "resized_sha": p.map(
                        lambda b: hashlib.sha256(bytes(b) + tag).hexdigest()
                    ),
                }
            )

    return payloads.mapInPandas(gen, RESIZED_SCHEMA)


def frame_sample_stub(
    payloads: DataFrame, n_frames: int = 4, batch_size: int = 64
) -> DataFrame:
    """STUB video frame sampling: one input row fans out to ``n_frames``
    output rows (the 1→N batch shape real frame extraction produces).
    frame_sha = sha256(payload || ':' || frame_idx)."""
    spark = payloads.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "frame_idx": [], "frame_sha": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_sha"].append(
                        hashlib.sha256(raw + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return payloads.mapInPandas(gen, FRAMES_SCHEMA)
