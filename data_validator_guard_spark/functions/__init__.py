"""Column-expression helpers shared across the engine.

These are the vectorized equivalents of the reference's per-row Python lambdas
(`/root/reference/validation/maganamed_validation.py:108-263` uses
``df.apply(axis=1)`` for every one of these). Everything here stays JVM-side
inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_blank(c: Column | str) -> Column:
    """Null OR empty-after-strip — the reference's unified "missing" test
    (`maganamed_validation.py:197-198`, `general_id_cleaning.py:263`).

    Implemented as an anchored regex rather than ``trim(c) = ''``: both
    Spark's and ANSI ``trim`` strip only spaces, so a space-only regex is
    semantically identical — but it rejects a non-blank value at its first
    non-space byte instead of copying the whole string (on multi-KB content
    columns the trim form allocated a full copy per row per scan).

    Anchors are ``\\A``/``\\z`` (absolute input edges), NOT ``^``/``$``:
    Java's ``$`` also matches *before a final line terminator*, so ``" \\n"``
    would wrongly classify as blank under ``^ *$`` while ``trim`` semantics
    (and every SQL oracle) keep it non-blank."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNull() | col.cast("string").rlike(r"\A *\z")


def normalized(c: Column | str) -> Column:
    """Case/whitespace normalization used before duplicate detection
    (`general_validation.py:58`: ``.str.strip().str.upper()``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.upper(F.trim(col))


def suffix_normalized(c: Column | str, suffix_pattern: str = r"(?i)[_-]?v$") -> Column:
    """Strip a version suffix before duplicate detection
    (`maganamed_validation.py:136-155`)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.trim(col), suffix_pattern, "")


def content_sha256(c: Column | str) -> Column:
    """The per-row byte-identity invariant (BASELINE.json input_hint)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sha2(col.cast("string"), 256)


def salt(n_salts: int, *cols: Column | str) -> Column:
    """Deterministic salt in [0, n_salts) from xxhash64 of the key columns —
    used to defuse hot-key skew in two-phase aggregations (SURVEY.md §4.3)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*cs), F.lit(n_salts)).cast("int")
