"""Query-registry core: the dicts, the decorator, and shared constants.

The per-family query modules in this package register themselves here at
import time (see ``__init__.py``); external callers keep importing
``QUERIES`` / ``ORACLES`` from ``data_validator_guard_spark.queries``
exactly as before the split.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

ALLOWED_DOC_LANGS = ["de", "en", "es", "fr"]  # 'zh' deliberately excluded → planted FK violations
LANG_PATTERN = r"^[a-z]{2}$"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        # Registered names are FROZEN (the driver compares them across
        # rounds): a second registration under an existing name would
        # silently replace the original query and its oracle — exactly the
        # drift this registry exists to prevent — so it fails at import.
        if name in QUERIES:
            raise ValueError(
                f"query name already registered: {name!r} "
                f"(existing: {QUERIES[name].__module__}.{QUERIES[name].__qualname__}) "
                "— registry names are frozen; pick a new name"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
