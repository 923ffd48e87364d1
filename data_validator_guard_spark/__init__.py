"""data_validator_guard_spark — a PySpark-native schema + constraint validation engine.

A from-scratch rebuild of the capabilities of ``immerse-eu/data-validator-guard``
(a single-process pandas + SQLite data-quality pipeline) as an idiomatic Spark
engine: a declarative rulebook is compiled into vectorized DataFrame plans that
emit per-partition pass/fail verdicts plus a violation-rows DataFrame, with
explicit partitioning / broadcast / salting decisions so the same plans hold at
10^12-row scale.

Nothing in here is a translation of the reference's code; reference files are
cited in docstrings only to establish *semantic* parity (what is computed, not
how).
"""

from data_validator_guard_spark.rules import Rule, RuleSuite
from data_validator_guard_spark.engine import validate
from data_validator_guard_spark.session import get_session

__all__ = ["Rule", "RuleSuite", "validate", "get_session"]
__version__ = "0.1.0"
