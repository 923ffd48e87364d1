"""Incremental validation via Structured Streaming.

The reference has no streaming (SURVEY.md §2.9) and the north rule is
resumable *batch* (the ledger in :mod:`data_validator_guard_spark.ledger`).
This module is the continuous-arrival variant of the same contract: new files
landing in a directory are validated exactly once, with Spark's streaming
checkpoint playing the ledger's role (file-source offsets = lineage; a killed
job resumes from the last committed batch).
"""

from data_validator_guard_spark.streaming.incremental import (
    dedup_stream,
    minhash_signature_stream,
    near_duplicates_from_store,
    validate_stream,
    windowed_event_counts,
)

__all__ = [
    "dedup_stream",
    "minhash_signature_stream",
    "near_duplicates_from_store",
    "validate_stream",
    "windowed_event_counts",
]
