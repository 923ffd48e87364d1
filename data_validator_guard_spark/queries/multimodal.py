"""Multimodal plumbing: binary payload metadata decode/resize/frame
sample (codecs stubbed by declared sandbox necessity).

Split out of the original single-file registry (round-5 verdict item #7);
sections moved verbatim, registration order preserved per family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from data_validator_guard_spark.sources import read_table
from data_validator_guard_spark.queries._registry import query

# =====================================================================
# 17. Multimodal plumbing (operators/multimodal.py): binary payloads +
#     Arrow-batched stub decode; metadata oracle-checked byte-for-byte.
# =====================================================================
_MULTIMODAL_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS stub_width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS stub_height
FROM documents
"""


@query("multimodal_decode_stub", oracle=_MULTIMODAL_ORACLE)
def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.multimodal import decode_stub

    return decode_stub(read_table(spark, sf_dir, "documents"), "text", "doc_id")


# =====================================================================
# 26. Multimodal resize / frame-sample stubs (mapInPandas plumbing with
#     deterministic fake codecs; 1→1 and 1→N batch shapes).
# =====================================================================
@query(
    "multimodal_resize_stub",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(640 AS INT) AS width, CAST(480 AS INT) AS height,
       sha256(text || '640x480') AS resized_sha
FROM documents
""",
)
def q_multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.multimodal import resize_stub, to_binary_payload

    docs = read_table(spark, sf_dir, "documents")
    return resize_stub(to_binary_payload(docs, "text", "doc_id"), 640, 480)


@query(
    "multimodal_frame_sample",
    oracle="""
SELECT d.doc_id, CAST(f.i AS INT) AS frame_idx,
       sha256(d.text || ':' || CAST(f.i AS VARCHAR)) AS frame_sha
FROM documents d
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) f
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_validator_guard_spark.operators.multimodal import (
        frame_sample_stub,
        to_binary_payload,
    )

    docs = read_table(spark, sf_dir, "documents")
    return frame_sample_stub(to_binary_payload(docs, "text", "doc_id"), n_frames=4)
