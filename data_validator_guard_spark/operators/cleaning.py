"""Rulebook-driven corrections — the reference's cleaning phase, distributed.

Semantics from `/root/reference/cleaning/general_id_cleaning.py`:
- the rulebook is a small table ``(key..., correct_value, action, ...)`` whose
  ``action`` buckets rows into delete / update / merge / add / skip
  (`general_id_cleaning.py:90-149`); rows match on a COMPOSITE key — the
  reference's ESM system keys on the 4-tuple (participant_identifier,
  participant_number, VisitCode, SiteCode) (`:96-101,185-251`);
- **delete** drops matching rows (`:169-183`) → broadcast left-anti join;
- **update**/**merge** rewrite the primary key column to ``correct_value``
  (`:185-251`) → broadcast left join + coalesce;
- **add** ALSO assigns the correct id to matching rows (`:114,196-214`) —
  it is a rewrite, not a no-op;
- **skip** / "check manually" / **use** leave rows untouched (the reference
  explicitly skips on "use", `:119`);
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
# "add" assigns the correct id to matching rows in the reference
# (general_id_cleaning.py:114,196-214) — a rewrite. "use" is explicitly
# skipped there (:119) — a no-op.
REWRITE_ACTIONS = ("update", "merge", "add")
NOOP_ACTIONS = ("skip", "check manually", "use")


def apply_rulebook(
    df: DataFrame,
    rulebook: DataFrame,
    key_col: str | tuple[str, ...] | list[str],
    correct_col: str = "correct_value",
    action_col: str = "action",
    fill_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply rulebook actions to ``df``; returns the cleaned table plus an
    ``__action`` provenance column ('kept' | 'rewritten' | 'filled' ...).

    ``key_col`` may be a single column or a composite key tuple — the
    reference's ESM rulebook matches on 4 columns (participant_identifier,
    participant_number, VisitCode, SiteCode; general_id_cleaning.py:96-101).
    Rewrites replace the FIRST key column (the participant id) with
    ``correct_col``, matching ``correct_participant_id`` semantics.

    ``rulebook`` columns: the key column(s), ``correct_col`` (replacement for
    update/merge/add), ``action_col``, and optionally ``fill_cols`` providing
    fill-when-blank values.
    """
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    primary = key_cols[0]
    rb = rulebook.withColumn(action_col, F.lower(F.trim(F.col(action_col))))

    deletes = rb.filter(F.col(action_col).isin(*DELETE_ACTIONS)).select(*key_cols)
    rewrites = rb.filter(
        F.col(action_col).isin(*REWRITE_ACTIONS) & F.col(correct_col).isNotNull()
    ).select(*key_cols, F.col(correct_col).alias("__new_key"), *[
        F.col(c).alias(f"__fill_{c}") for c in fill_cols
    ])

    # delete: broadcast anti-join on the full composite key (reference:
    # per-row set membership, general_id_cleaning.py:169-183)
    cleaned = df.join(F.broadcast(deletes), key_cols, "left_anti")

    # update/merge/add: broadcast left join + coalesce on the primary key
    # column (reference: dict .get per row, general_id_cleaning.py:185-251)
    cleaned = cleaned.join(F.broadcast(rewrites), key_cols, "left")
    out_cols = []
    for c in df.columns:
        if c == primary:
            out_cols.append(F.coalesce(F.col("__new_key"), F.col(primary)).alias(primary))
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
