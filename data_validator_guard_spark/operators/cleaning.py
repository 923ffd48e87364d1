"""Rulebook-driven corrections — the reference's cleaning phase, distributed.

Semantics from `/root/reference/cleaning/general_id_cleaning.py`:
- the rulebook is a small table ``(key, correct_value, action, ...)`` whose
  ``action`` buckets rows into delete / update / merge / add / skip
  (`general_id_cleaning.py:90-149`);
- **delete** drops matching rows (`:169-183`) → broadcast left-anti join;
- **update**/**merge** rewrite the key to ``correct_value`` (`:185-251`) →
  broadcast left join + coalesce;
- **skip** / "check manually" / "use" leave rows untouched;
- extended update fills auxiliary columns from the rulebook when blank
  (`:254-317`) → left join + per-column ``when(is_blank, new).otherwise(old)``.

The reference walks the rulebook row-by-row building Python dicts and then
``df.apply``s them per row; here each action bucket is a DataFrame and every
application is one broadcast join — no per-row Python, no mutation.

Output keeps provenance: ``__action`` records what happened to each surviving
row, and the byte-identity invariant of untouched rows is checkable via
``sha2(content, 256)`` (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_guard_spark.functions import is_blank

DELETE_ACTIONS = ("delete",)
REWRITE_ACTIONS = ("update", "merge", "use")
NOOP_ACTIONS = ("skip", "check manually", "add")


def apply_rulebook(
    df: DataFrame,
    rulebook: DataFrame,
    key_col: str,
    correct_col: str = "correct_value",
    action_col: str = "action",
    fill_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply rulebook actions to ``df``; returns the cleaned table plus an
    ``__action`` provenance column ('kept' | 'rewritten' | 'filled' ...).

    ``rulebook`` columns: ``key_col`` (match key), ``correct_col``
    (replacement key for update/merge), ``action_col``, and optionally the
    ``fill_cols`` providing fill-when-blank values.
    """
    rb = rulebook.withColumn(action_col, F.lower(F.trim(F.col(action_col))))

    deletes = rb.filter(F.col(action_col).isin(*DELETE_ACTIONS)).select(key_col)
    rewrites = rb.filter(
        F.col(action_col).isin(*REWRITE_ACTIONS) & F.col(correct_col).isNotNull()
    ).select(key_col, F.col(correct_col).alias("__new_key"), *[
        F.col(c).alias(f"__fill_{c}") for c in fill_cols
    ])

    # delete: broadcast anti-join (reference: per-row set membership,
    # general_id_cleaning.py:169-183)
    cleaned = df.join(F.broadcast(deletes), key_col, "left_anti")

    # update/merge: broadcast left join + coalesce (reference: dict .get per
    # row, general_id_cleaning.py:185-251)
    cleaned = cleaned.join(F.broadcast(rewrites), key_col, "left")
    out_cols = []
    for c in df.columns:
        if c == key_col:
            out_cols.append(F.coalesce(F.col("__new_key"), F.col(key_col)).alias(key_col))
        elif c in fill_cols:
            out_cols.append(
                F.when(is_blank(c) & F.col(f"__fill_{c}").isNotNull(), F.col(f"__fill_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    action = (
        F.when(F.col("__new_key").isNotNull(), F.lit("rewritten"))
        .otherwise(F.lit("kept"))
        .alias("__action")
    )
    return cleaned.select(*out_cols, action)


def rulebook_from_rules(df: DataFrame, key_col: str) -> DataFrame:
    """Auto-generate a rulebook by key content — the reference's generator
    (`utils/rulebook.py:31-35,97-100`): 'delete' for blank/test keys,
    'update' for over-long keys, else 'check manually'."""
    k = F.col(key_col)
    action = (
        F.when(is_blank(k) | k.contains(" ") | F.upper(k).contains("TEST"), F.lit("delete"))
        .when(F.length(k) >= 10, F.lit("update"))
        .otherwise(F.lit("check manually"))
    )
    return (
        df.select(k.alias(key_col))
        .distinct()
        .select(
            key_col,
            F.lit(None).cast("string").alias("correct_value"),
            action.alias("action"),
        )
    )
