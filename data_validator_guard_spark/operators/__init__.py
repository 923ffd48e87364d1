"""Physical operators that go beyond single-expression rules.

Each module is a Spark-first implementation of a capability family:

- :mod:`stats` — fused per-column statistics suite (one aggregation pass).
- :mod:`drift` — distribution-drift (PSI / chi-square) via grouped pandas UDF.
- :mod:`dedup` — exact + near-duplicate detection (hash, MinHash-LSH, SimHash,
  n-gram Jaccard).
- :mod:`similarity` — embedding similarity search (brute-force + bucketed).
- :mod:`text` — language-ID, quality scoring, token counting, fingerprinting.
- :mod:`cleaning` — rulebook-driven corrections (delete/update/merge).
- :mod:`multimodal` — opaque-binary column plumbing with stubbed decoders.
"""
