"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship rule-suite validation over
``/root/testdata/sf0.001`` documents. ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 with DuckDB-checkable oracles
(see ``data_validator_guard_spark/queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_validator_guard_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rule-suite verdicts over sf0.001 documents."""
    return QUERIES["verdicts_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without an oracle get the
    driver's weaker rows-only check."""
    return dict(ORACLES)
