"""Rule compiler + executor: rulebook → fused DataFrame plans → verdicts + violations.

Reference semantics being rebuilt (SURVEY.md §2.12, §3):
- verdict = "no issues collected" per check
  (`/root/reference/validation/general_validation.py:126-127`) — generalized to a
  **verdicts DataFrame** ``(rule_id, partition, pass, n_rows, n_violations)``.
- issues = violation rows collected per check and exported
  (`general_validation.py:110-125`) — generalized to a **violations DataFrame**
  ``(rule_id, partition, keys, detail)``.

Execution strategy (the part the reference could not have — SURVEY.md §4):

1. **One fused totals scan.** ``groupBy(partition).agg(n_rows, *table-level
   measures, *row-rule violation counters)`` — every row-level rule's
   violation count is a ``sum(when(cond,1))`` in the SAME aggregation as the
   table-level measures (the one good idea in the reference —
   `maganamed_validation.py:100-134` fuses two checks into one scan — applied
   universally), so verdicts for row+agg rules cost exactly one pass and
   Catalyst prunes the read to the union of rule-referenced columns.
2. **One violation scan, only when violations are sunk.** Row-level violation
   *rows* come from a separate fused pass: an array-of-structs
   ``filter``+``explode`` emits all violating (rule, row) pairs in one
   whole-stage-codegen stage. A caller that only materializes verdicts (the
   common case at 10^12 scale: per-partition pass/fail first, details on
   demand) never executes it.
3. **Plan-level rules contribute weighted fragments.** unique / foreign_key /
   group_consistency / drift each produce a *weighted* violations fragment
   (weight = offending-row count per emitted key); verdicts join per-(rule,
   partition) weight sums against the totals. Fragment outputs are small
   (aggregations / anti-joins — never row-level violation rows), so the
   union is persisted by default and shared between the two outputs.

Operator choices:
- **unique**: salted two-phase hash aggregation (north rule): phase 1 groups
  on (keys, salt) so a hot key's rows spread over many reducers, phase 2
  merges partial counts. Exact result, skew defused.
- **foreign_key**: broadcast left-anti join (`general_validation.py:94-108`
  was a Python set difference).
- **group_consistency**: exact distinct-count per group — an explicit,
  order-independent tightening of the reference's order-dependent
  ``x == x.iloc[0]`` (`maganamed_validation.py:231-232`; SURVEY.md §7 hard 4).
- **drift**: the engine's one pandas UDF (Arrow-batched, grouped) — see
  :mod:`data_validator_guard_spark.operators.drift`.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_validator_guard_spark.functions import is_blank, normalized
from data_validator_guard_spark.rules import (
    AGG_LEVEL_TYPES,
    ROW_LEVEL_TYPES,
    Rule,
    RuleSuite,
)

VERDICT_COLS = ("rule_id", "partition", "pass", "n_rows", "n_violations")
VIOLATION_COLS = ("rule_id", "partition", "keys", "detail")

DEFAULT_N_SALTS = 64


# ---------------------------------------------------------------- row level
def _row_violation(rule: Rule) -> tuple[Column, Column]:
    """Compile a row-level rule to (violation_condition, detail) columns."""
    p = rule.params
    t = rule.type
    if t == "not_null":
        c = F.col(rule.columns[0])
        return c.isNull(), F.lit(f"{rule.columns[0]} is null")
    if t == "not_blank":
        return is_blank(rule.columns[0]), F.lit(f"{rule.columns[0]} is blank")
    if t == "regex_match":
        c = F.col(rule.columns[0])
        cond = c.isNull() | ~c.rlike(p["pattern"])
        return cond, F.concat(
            F.lit(f"{rule.columns[0]} !~ {p['pattern']}: "),
            F.coalesce(c.cast("string"), F.lit("NULL")),
        )
    if t == "no_regex_match":
        c = F.col(rule.columns[0])
        return c.isNotNull() & c.rlike(p["pattern"]), F.concat(
            F.lit(f"{rule.columns[0]} ~ {p['pattern']}: "), c.cast("string")
        )
    if t == "allowed_values":
        c = F.col(rule.columns[0])
        norm = p.get("normalize", False)
        cn = normalized(c) if norm else c
        vals = [str(v).strip().upper() if norm else v for v in p["values"]]
        cond = c.isNull() | ~cn.isin(vals)
        return cond, F.concat(
            F.lit(f"{rule.columns[0]} not in allowed set: "),
            F.coalesce(c.cast("string"), F.lit("NULL")),
        )
    if t == "min_max":
        c = F.col(rule.columns[0])
        lo, hi = p.get("lo"), p.get("hi")
        cond = c.isNull()
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return cond, F.concat(
            F.lit(f"{rule.columns[0]} outside [{lo}, {hi}]: "),
            F.coalesce(c.cast("string"), F.lit("NULL")),
        )
    if t == "length_range":
        c = F.length(F.col(rule.columns[0]).cast("string"))
        lo, hi = p.get("lo"), p.get("hi")
        cond = F.col(rule.columns[0]).isNull()
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return cond, F.concat(
            F.lit(f"length({rule.columns[0]}) outside [{lo}, {hi}]: "),
            F.coalesce(F.col(rule.columns[0]).cast("string"), F.lit("NULL")),
        )
    if t == "cross_column":
        holds = F.expr(p["expr"])
        return ~F.coalesce(holds, F.lit(False)), F.lit(f"violated: {p['expr']}")
    if t == "range_tolerance":
        # rule 12: |value - expected| <= tol, NULL on either side violates
        # (maganamed_validation.py:283-296 skipped NULLs silently; the engine
        # reports them — blank dates are themselves a data defect).
        value, expected = F.expr(p["value"]), F.expr(p["expected"])
        tol = F.lit(float(p["tol"]))
        delta = F.abs(value - expected)
        cond = ~F.coalesce(delta <= tol, F.lit(False))
        return cond, F.concat(
            F.lit(f"|{p['value']} - {p['expected']}| > {p['tol']}: "),
            F.coalesce(delta.cast("string"), F.lit("NULL")),
        )
    if t == "derived_equality":
        # rule 14: metadata-derived value vs stored column
        # (movisensxs_validation.py:55-78 derives visit/site from filename).
        value, expected = F.expr(p["value"]), F.expr(p["expected"])
        cond = ~F.coalesce(value.eqNullSafe(expected), F.lit(False))
        return cond, F.concat(
            F.lit(f"{p['value']} != {p['expected']}: "),
            F.coalesce(value.cast("string"), F.lit("NULL")),
            F.lit(" vs "),
            F.coalesce(expected.cast("string"), F.lit("NULL")),
        )
    if t == "completeness":
        n = len(rule.columns)
        filled = sum((~is_blank(c)).cast("int") for c in rule.columns)
        frac = filled / F.lit(float(n))
        thr = float(p.get("threshold", 0.8))
        return frac < F.lit(thr), F.concat(
            F.lit(f"completeness < {thr}: "), F.round(frac, 4).cast("string")
        )
    raise ValueError(f"not a row-level rule: {t}")


def _agg_measures(rule: Rule) -> tuple[Column, Column]:
    """Compile a table-level rule to (n_violations_expr, pass_expr) aggregates
    evaluated inside the fused totals pass."""
    p = rule.params
    t = rule.type
    if t == "null_rate_max":
        blanks = F.sum(is_blank(rule.columns[0]).cast("bigint"))
        rate = blanks / F.count(F.lit(1))
        return blanks, rate <= F.lit(float(p["max_rate"]))
    if t == "min_rows":
        n = F.count(F.lit(1))
        ok = n >= F.lit(int(p["n"]))
        return F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("bigint"), ok
    if t == "cardinality_range":
        exact = p.get("exact", False)
        card = (
            F.count_distinct(F.col(rule.columns[0]))
            if exact
            else F.approx_count_distinct(F.col(rule.columns[0]), rsd=p.get("rsd", 0.01))
        )
        lo = int(p.get("lo", 0))
        hi = p.get("hi")
        ok = card >= F.lit(lo)
        if hi is not None:
            ok = ok & (card <= F.lit(int(hi)))
        return F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("bigint"), ok
    raise ValueError(f"not an agg-level rule: {t}")


# ---------------------------------------------------------------- plan level
# Each returns a *weighted* violations DataFrame:
#   rule_id, partition, keys, detail, weight  (weight = offending-row count)


def _unique_violations(df: DataFrame, rule: Rule, part: Column, n_salts: int) -> DataFrame:
    """Salted duplicate detection (SURVEY.md §4.3; north rule).
    weight = group size, matching the reference's ``duplicated(keep=False)``
    row count (`general_validation.py:19-27`).

    Default mode ``hash``: shuffle only (partition, xxhash64(keys), salt) —
    8-byte hashes instead of full key strings (at (repo, path, commit) width
    this cuts the exchange ~6x) — then broadcast the (assumed-few) duplicate
    hashes back and verify exactly on the matching rows, so hash collisions
    can only create candidates, never false violations. The salt (physical
    input split id) spreads a hot key's partial counts across reducers.

    Mode ``shuffle`` (``params={"mode": "shuffle"}``): classic salted
    two-phase aggregation on the full key — for pathological inputs where
    duplicates are a large fraction and the hash broadcast would be big.
    """
    norm = rule.type == "unique_normalized"
    keyexprs = [
        (normalized(c) if norm else F.col(c)).alias(f"__k{i}")
        for i, c in enumerate(rule.columns)
    ]
    keynames = [f"__k{i}" for i in range(len(rule.columns))]
    mode = rule.params.get("mode", "hash")

    if mode == "hash":
        hashed = df.select(part.alias("partition"), *keyexprs).select(
            "partition",
            *keynames,
            F.xxhash64(*[F.col(k) for k in keynames]).alias("__h"),
        )
        salted = hashed.select("partition", "__h").withColumn(
            "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
        )
        phase1 = salted.groupBy("partition", "__h", "__salt").agg(
            F.count(F.lit(1)).alias("__c")
        )
        dup_h = (
            phase1.groupBy("partition", "__h")
            .agg(F.sum("__c").alias("__n"))
            .filter(F.col("__n") > 1)
            .select("partition", "__h")
        )
        dup_keys = (
            hashed.join(F.broadcast(dup_h), ["partition", "__h"], "left_semi")
            .groupBy("partition", *keynames)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
    else:
        salted = df.select(part.alias("partition"), *keyexprs).withColumn(
            "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
        )
        phase1 = salted.groupBy("partition", *keynames, "__salt").agg(
            F.count(F.lit(1)).alias("__c")
        )
        dup_keys = (
            phase1.groupBy("partition", *keynames)
            .agg(F.sum("__c").alias("n"))
            .filter(F.col("n") > 1)
        )
    return dup_keys.select(
        F.lit(rule.rule_id).alias("rule_id"),
        F.col("partition"),
        F.concat_ws("|", *[F.col(k).cast("string") for k in keynames]).alias("keys"),
        F.concat(F.lit("duplicate key x"), F.col("n").cast("string")).alias("detail"),
        F.col("n").cast("bigint").alias("weight"),
    )


def _foreign_key_violations(df: DataFrame, rule: Rule, part: Column, keys: Column) -> DataFrame:
    """Broadcast left-anti referential check (`general_validation.py:94-108`)."""
    dim: DataFrame = rule.params["dim"]
    dim_cols = list(rule.params.get("dim_columns", rule.columns))
    sel = df.select(
        part.alias("partition"), keys.alias("keys"), *[F.col(c) for c in rule.columns]
    )
    cond = [sel[c] == dim[d] for c, d in zip(rule.columns, dim_cols)]
    missing = sel.join(F.broadcast(dim), cond, "left_anti")
    return missing.select(
        F.lit(rule.rule_id).alias("rule_id"),
        F.col("partition"),
        F.col("keys"),
        F.concat(
            F.lit("unknown value in reference: "),
            F.concat_ws(
                "|", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL")) for c in rule.columns]
            ),
        ).alias("detail"),
        F.lit(1).cast("bigint").alias("weight"),
    )


def _join_consistency_violations(
    df: DataFrame, rule: Rule, part: Column, keys: Column
) -> DataFrame:
    """Cross-table agreement (rule 13, `maganamed_validation.py:255-269`):
    left rows joined to ``params["other"]`` on ``params["on"]`` must satisfy
    ``params["expr"]`` (a boolean SQL expr over the joined row; the other
    table's columns are exposed under their own names).

    Join strategy: broadcast when ``params["broadcast"]`` (default True —
    rule-13 "other" tables are code→name dims); pass False for fact-to-fact
    consistency, which then shuffles on the join keys like any equi-join.
    With ``require_match=True`` (default) left rows with NO match are
    violations too (agreement cannot be established) — matching the
    reference, which reports missing join partners.
    """
    p = rule.params
    other: DataFrame = p["other"]
    on = list(p["on"])
    holds = F.expr(p["expr"])
    require_match = bool(p.get("require_match", True))

    # Contract hardening (round-2 advice): (a) a dim column sharing a name
    # with a left column that the expr references would be AMBIGUOUS at
    # analysis time — fail loudly at definition time instead; unreferenced
    # clashes are dropped from the dim (left columns win, so the expr keeps
    # meaning "left value"). (b) duplicate dim join keys would fan matched
    # rows out (n_violations could exceed n_rows) — collapse the dim to one
    # row per key and weave an assert_true on the pre-collapse count into
    # the join, so a non-unique dim fails the job instead of silently
    # multiplying verdicts.
    import re as _re

    # Tokenize only the code part of the expr: a dim column name inside a
    # string literal or comment ("category = 'status'") is NOT a reference
    # and must not trip the clash check. Strip '...' literals (with ''
    # escapes), "..." literals, -- line comments and /* */ blocks first.
    # (A clash column used as an ANSI double-quoted identifier is stripped
    # too — that case still fails loudly, at analysis time, as ambiguous.)
    _code = _re.sub(r"'(?:[^']|'')*'", " ", p["expr"])
    _code = _re.sub(r'"(?:[^"\\]|\\.)*"', " ", _code)
    _code = _re.sub(r"/\*.*?\*/", " ", _code, flags=_re.S)
    _code = _re.sub(r"--[^\n]*", " ", _code)
    expr_idents = set(_re.findall(r"[A-Za-z_][A-Za-z0-9_]*", _code))
    extra_cols = [c for c in other.columns if c not in on]
    clash = [c for c in extra_cols if c in df.columns]
    referenced_clash = [c for c in clash if c in expr_idents]
    if referenced_clash:
        raise ValueError(
            f"join_consistency rule {rule.rule_id!r}: column(s) "
            f"{referenced_clash} exist in BOTH the validated table and "
            "params['other'] and are referenced by params['expr'] — rename "
            "them on the dim (withColumnRenamed) so the expr is unambiguous"
        )
    keep_cols = [c for c in extra_cols if c not in clash]
    collapsed = other.groupBy(*[F.col(c) for c in on]).agg(
        *[F.first(F.col(c)).alias(c) for c in keep_cols],
        F.count(F.lit(1)).alias("__dim_n"),
    )
    right = F.broadcast(collapsed) if p.get("broadcast", True) else collapsed
    sel = df.select(
        part.alias("partition"), keys.alias("keys"), *[F.col(c) for c in df.columns]
    )
    joined = sel.join(right, on, "left")
    # marker survives the outer join iff the right side matched; the woven
    # assert_true fires on any matched row whose dim key had > 1 dim rows
    # (an unreferenced assert column would be pruned by Catalyst, so it is
    # fused into the marker every downstream predicate reads).
    dim_unique = F.coalesce(F.col("__dim_n") == 1, F.lit(True))
    joined = joined.withColumn(
        "__matched",
        # NULL when unmatched (downstream reads .isNull()), TRUE when matched
        F.when(
            F.assert_true(
                dim_unique,
                F.lit(
                    f"join_consistency rule {rule.rule_id!r}: params['other'] "
                    f"is not unique on join keys {on} — dedupe the dim or fix "
                    "the keys (duplicate keys would fan out matched rows and "
                    "inflate n_violations)"
                ),
            ).isNull()
            & F.col("__dim_n").isNotNull(),
            F.lit(True),
        ),
    )
    bad_expr = ~F.coalesce(holds, F.lit(False))
    if require_match:
        cond = F.when(F.col("__matched").isNull(), F.lit(True)).otherwise(bad_expr)
    else:
        cond = F.col("__matched").isNotNull() & bad_expr
    detail = F.when(
        F.col("__matched").isNull(), F.lit(f"no match in {p.get('other_name', 'other')}")
    ).otherwise(F.lit(f"violated: {p['expr']}"))
    return joined.filter(cond).select(
        F.lit(rule.rule_id).alias("rule_id"),
        F.col("partition"),
        F.col("keys"),
        detail.alias("detail"),
        F.lit(1).cast("bigint").alias("weight"),
    )


def _group_consistency_violations(df: DataFrame, rule: Rule, part: Column) -> DataFrame:
    """Within-group single-value check (rule 11, `maganamed_validation.py:216-248`).

    NULL semantics (round-4 verdict #5): by default ``count_distinct``
    ignores NULLs, so a group {X, NULL, NULL} PASSES — NULL is treated as
    "no statement", not a conflicting value. The reference deviates: its
    ``x == x.iloc[0]`` evaluates NaN comparisons False and flags such
    groups. ``params["count_nulls"]=True`` restores reference parity by
    counting NULL as one extra distinct value when the group has any NULL —
    one extra ``max(isNull)`` folded into the SAME aggregation (no second
    scan). A group of ONLY NULLs still passes under both settings (0 or 1
    "values"; nothing to disagree with)."""
    group_col = rule.params["group_by"]
    value_col = rule.columns[0]
    nd = F.count_distinct(F.col(value_col))
    if rule.params.get("count_nulls"):
        nd = nd + F.max(F.col(value_col).isNull().cast("int"))
    grouped = (
        df.groupBy(part.alias("partition"), F.col(group_col))
        .agg(nd.alias("__nd"))
        .filter(F.col("__nd") > 1)
    )
    return grouped.select(
        F.lit(rule.rule_id).alias("rule_id"),
        F.col("partition"),
        F.col(group_col).cast("string").alias("keys"),
        F.concat(
            F.lit(f"{value_col} has "),
            F.col("__nd").cast("string"),
            F.lit(" distinct values in group"),
        ).alias("detail"),
        F.lit(1).cast("bigint").alias("weight"),
    )


# ---------------------------------------------------------------- executor
def validate(
    df: DataFrame,
    suite: RuleSuite,
    n_salts: int = DEFAULT_N_SALTS,
    persist_violations: bool = True,
    violation_sample_ppm: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run every rule in ``suite`` over ``df``.

    Returns ``(verdicts, violations)``:
    - verdicts: ``rule_id, partition, pass, n_rows, n_violations`` — one row
      per (rule, partition value);
    - violations: ``rule_id, partition, keys, detail``.

    ``violation_sample_ppm`` bounds the EMITTED violation rows: at 10^12
    rows a 1%-defect rule would emit 10^10 rows, which no consumer reads in
    full — with a ppm set, each violation row is kept iff an exact integer
    threshold on md5(rule_id, partition, keys, detail) passes (the
    ``sampling.hash_sample`` construction: deterministic, reproducible,
    uniform per rule, zero extra shuffles — a pure filter fused into the
    emit plan). Verdict counts are NOT affected: ``n_violations`` comes from
    the fused counters / fragment sums, never from counting the returned
    frame, so the verdicts stay exact while the row emission is bounded.

    Both are lazy. Verdicts for row- and table-level rules come entirely from
    the single fused totals aggregation — materializing only verdicts never
    touches the violation-row scan. ``persist_violations=True`` (default)
    caches the plan-level fragment union (small: aggregation / anti-join /
    drift outputs — row-level violation rows are NOT in it) so sinking both
    outputs shares the unique/drift subplans instead of recomputing them;
    measured ~1.4x faster on the flagship suite at 8M rows. Pass False for
    verdict-only runs that should leave no cached state, and ``unpersist()``
    the cached frame in long-lived sessions.
    """
    spark = df.sparkSession
    # null-safe partition value: verdict/violation counts join on partition,
    # and NULL keys would silently drop rows in that join.
    part = F.coalesce(F.expr(suite.partition_by).cast("string"), F.lit("__null__"))
    keys = (
        F.concat_ws("|", *[F.col(k).cast("string") for k in suite.key_cols])
        if suite.key_cols
        else F.lit("")
    )

    row_rules = [r for r in suite.rules if r.type in ROW_LEVEL_TYPES]
    agg_rules = [r for r in suite.rules if r.type in AGG_LEVEL_TYPES]
    unique_rules = [r for r in suite.rules if r.type in ("unique", "unique_normalized")]
    all_fk = [r for r in suite.rules if r.type == "foreign_key"]
    # single-column FK rules marked ``inline=True`` collect the dim's values
    # (small by contract: every dim here is broadcastable) and compile to an
    # isin row-condition — the referential check then fuses into the totals
    # and violation scans instead of costing a separate table pass per rule.
    fk_inline = [r for r in all_fk if r.params.get("inline") and len(r.columns) == 1]
    fk_rules = [r for r in all_fk if r not in fk_inline]
    gc_rules = [r for r in suite.rules if r.type == "group_consistency"]
    jc_rules = [r for r in suite.rules if r.type == "join_consistency"]
    drift_rules = [r for r in suite.rules if r.type == "drift"]

    # ---- totals scan: n_rows + table-level measures + row-rule violation
    # counters, all in ONE aggregation pass per partition. Catalyst prunes the
    # read to the partition expr + the union of rule-referenced columns.
    def _guard(r: Rule, cond: Column) -> Column:
        # Conditional rules: params["where"] (boolean SQL expr) restricts the
        # check to matching rows — "if status='active' then email not null".
        # The reference expresses this as hard-coded pre-filters (e.g. the
        # clinician exclusion, auxiliar_functions.py:47-52); here it is a
        # first-class guard fused into the same scan. Non-applicable rows
        # (guard false or NULL) are never violations; n_rows stays the
        # partition's total.
        where = r.params.get("where")
        if where is None:
            return cond
        return F.coalesce(F.expr(where), F.lit(False)) & cond

    compiled_rows = []
    for r in row_rules:
        cond, detail = _row_violation(r)
        compiled_rows.append((r, _guard(r, cond), detail))
    for r in fk_inline:
        dim: DataFrame = r.params["dim"]
        dim_col = list(r.params.get("dim_columns", r.columns))[0]
        # Guarded driver-side collect: inline dims are small *by contract*;
        # enforce it so a miswired large dim fails fast instead of OOMing the
        # driver. limit(max+1) bounds the transferred rows even on violation.
        max_vals = int(r.params.get("max_inline_values", 100_000))
        rows = dim.select(dim_col).distinct().limit(max_vals + 1).collect()
        if len(rows) > max_vals:
            raise ValueError(
                f"inline foreign_key rule '{r.rule_id}': dim has more than "
                f"{max_vals} distinct values — drop inline=True to use the "
                "broadcast anti-join path (or raise max_inline_values)"
            )
        # NULL dim rows can never match the equi-join; keeping them would make
        # `c IN (..., NULL)` three-valued and silently swallow every violation
        # (~isin → NULL, counted as no-violation).
        vals = [row[0] for row in rows if row[0] is not None]
        c = F.col(r.columns[0])
        cond = c.isNull() | ~c.isin(vals)
        detail = F.concat(
            F.lit("unknown value in reference: "),
            F.coalesce(c.cast("string"), F.lit("NULL")),
        )
        compiled_rows.append((r, _guard(r, cond), detail))
    row_rules = row_rules + fk_inline

    # When exactly one drift rule is present (the north-rule shape), the
    # totals scan groups by (partition, drift group, length bucket) instead of
    # partition alone: the drift rule's *current histogram falls out of the
    # same pass* (no second scan of the heavy value column), and the totals
    # re-aggregate from the tiny fine-grained result. Requires every measure
    # to be decomposable — counters re-aggregate by SUM, cardinality switches
    # from approx_count_distinct to a mergeable HLL sketch
    # (hll_sketch_agg → hll_union_agg → hll_sketch_estimate). Rules with
    # exact cardinality fall back to the direct path.
    fuse_drift = len(drift_rules) == 1 and not any(
        r.type == "cardinality_range" and r.params.get("exact") for r in agg_rules
    )
    drift_cur: DataFrame | None = None
    if fuse_drift:
        from data_validator_guard_spark.operators.drift import bucketize

        dr = drift_rules[0]
        fine_aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
        final_aggs: list[Column] = [F.sum("__n").alias("__n_rows")]
        n_rows_final = F.sum("__n")
        for i, r in enumerate(agg_rules):
            p = r.params
            if r.type == "null_rate_max":
                fine_aggs.append(
                    F.sum(is_blank(r.columns[0]).cast("bigint")).alias(f"__f{i}")
                )
                blanks = F.sum(f"__f{i}")
                final_aggs.append(blanks.cast("bigint").alias(f"__v_{r.rule_id}"))
                final_aggs.append(
                    (blanks / n_rows_final <= F.lit(float(p["max_rate"]))).alias(
                        f"__p_{r.rule_id}"
                    )
                )
            elif r.type == "min_rows":
                ok = n_rows_final >= F.lit(int(p["n"]))
                final_aggs.append(
                    F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("bigint").alias(f"__v_{r.rule_id}")
                )
                final_aggs.append(ok.alias(f"__p_{r.rule_id}"))
            elif r.type == "cardinality_range":
                fine_aggs.append(F.hll_sketch_agg(F.col(r.columns[0])).alias(f"__f{i}"))
                card = F.hll_sketch_estimate(F.hll_union_agg(F.col(f"__f{i}")))
                lo, hi = int(p.get("lo", 0)), p.get("hi")
                ok = card >= F.lit(lo)
                if hi is not None:
                    ok = ok & (card <= F.lit(int(hi)))
                final_aggs.append(
                    F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("bigint").alias(f"__v_{r.rule_id}")
                )
                final_aggs.append(ok.alias(f"__p_{r.rule_id}"))
            else:  # pragma: no cover - AGG_LEVEL_TYPES is closed
                raise ValueError(f"not an agg-level rule: {r.type}")
        for r, cond, _detail in compiled_rows:
            fine_aggs.append(
                F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("bigint").alias(f"__fv_{r.rule_id}")
            )
            final_aggs.append(F.sum(f"__fv_{r.rule_id}").cast("bigint").alias(f"__v_{r.rule_id}"))
        fine = df.groupBy(
            part.alias("partition"),
            F.col(dr.params["group_by"]).alias("__grp"),
            bucketize(F.expr(dr.params["value"]), dr.params["edges"]).alias("__bucket"),
        ).agg(*fine_aggs)
        # the fine histogram feeds BOTH totals and the drift fragment; persist
        # it only when the caller wants shared/cached state (same contract as
        # the fragment union below) — verdict-only runs leave no cached RDDs.
        if persist_violations:
            fine = fine.persist(StorageLevel.MEMORY_AND_DISK)
        totals = fine.groupBy("partition").agg(*final_aggs)
        drift_cur = fine.select(
            "partition",
            F.col("__grp").alias("grp"),
            F.col("__bucket").alias("bucket"),
            F.col("__n").alias("n"),
        )
    else:
        aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
        for r in agg_rules:
            n_viol, ok = _agg_measures(r)
            aggs.append(n_viol.alias(f"__v_{r.rule_id}"))
            aggs.append(ok.alias(f"__p_{r.rule_id}"))
        for r, cond, _detail in compiled_rows:
            aggs.append(
                F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("bigint").alias(f"__v_{r.rule_id}")
            )
        totals = df.groupBy(part.alias("partition")).agg(*aggs)

    # ---- violations: one fused scan for all row-level rules (executed only
    # when the violations output is sunk), plus one fragment per plan-level
    # rule, all weighted.
    fragments: list[DataFrame] = []
    if compiled_rows:
        entries = [
            F.when(
                cond,
                F.struct(
                    F.lit(r.rule_id).alias("rule_id"), detail.cast("string").alias("detail")
                ),
            )
            for r, cond, detail in compiled_rows
        ]
        arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
        row_fragment = (
            df.select(part.alias("partition"), keys.alias("keys"), F.explode(arr).alias("v"))
            .select(
                "v.rule_id",
                "partition",
                "keys",
                "v.detail",
                F.lit(1).cast("bigint").alias("weight"),
            )
        )
    else:
        row_fragment = None
    for r in unique_rules:
        fragments.append(_unique_violations(df, r, part, n_salts))
    for r in fk_rules:
        fragments.append(_foreign_key_violations(df, r, part, keys))
    for r in gc_rules:
        fragments.append(_group_consistency_violations(df, r, part))
    for r in jc_rules:
        fragments.append(_join_consistency_violations(df, r, part, keys))
    for r in drift_rules:
        from data_validator_guard_spark.operators.drift import drift_violations

        fragments.append(drift_violations(df, r, part, cur=drift_cur))

    empty_w = spark.createDataFrame(
        [], "rule_id string, partition string, keys string, detail string, weight bigint"
    )
    plan_weighted = _union_all(fragments, empty_w)
    if persist_violations and fragments:
        plan_weighted = plan_weighted.persist(StorageLevel.MEMORY_AND_DISK)
    weighted = (
        row_fragment.select(*empty_w.columns).unionByName(plan_weighted)
        if row_fragment is not None
        else plan_weighted
    )

    violations = weighted.select(*VIOLATION_COLS)

    # ---- verdicts: ONE execution of the totals subplan for ALL rules — the
    # per-partition totals row is unpivoted into one verdict row per rule via
    # a single explode(array(structs)). (A per-rule ``totals.select`` union
    # would make Catalyst re-execute the whole totals aggregation — scan
    # included — once per rule; measured 8 scans for an 8-rule suite.)
    # Plan-level rules ride the same explode with NULL placeholders and take
    # their counts from a broadcast left join against the fragment sums.
    counted_rules = unique_rules + fk_rules + gc_rules + jc_rules + drift_rules
    entries: list[Column] = []
    for r in agg_rules:
        entries.append(
            F.struct(
                F.lit(r.rule_id).alias("rule_id"),
                F.col(f"__p_{r.rule_id}").alias("pass"),
                F.col(f"__v_{r.rule_id}").cast("bigint").alias("nv"),
            )
        )
    for r in row_rules:
        nv = F.coalesce(F.col(f"__v_{r.rule_id}"), F.lit(0)).cast("bigint")
        entries.append(
            F.struct(F.lit(r.rule_id).alias("rule_id"), (nv == 0).alias("pass"), nv.alias("nv"))
        )
    for r in counted_rules:
        entries.append(
            F.struct(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit(None).cast("boolean").alias("pass"),
                F.lit(None).cast("bigint").alias("nv"),
            )
        )

    empty_verdicts = spark.createDataFrame(
        [], "rule_id string, partition string, pass boolean, n_rows bigint, n_violations bigint"
    )
    if not entries:
        return empty_verdicts, violations

    exploded = totals.select(
        "partition", F.col("__n_rows").alias("n_rows"), F.explode(F.array(*entries)).alias("e")
    ).select("e.rule_id", "partition", "e.pass", "n_rows", "e.nv")
    if counted_rules:
        counts = plan_weighted.groupBy("rule_id", "partition").agg(
            F.sum("weight").alias("__w")
        )
        exploded = exploded.join(F.broadcast(counts), ["rule_id", "partition"], "left")
    else:
        exploded = exploded.withColumn("__w", F.lit(None).cast("bigint"))
    verdicts = exploded.select(
        "rule_id",
        "partition",
        F.coalesce(F.col("pass"), F.coalesce(F.col("__w"), F.lit(0)) == 0).alias("pass"),
        "n_rows",
        F.coalesce(F.col("nv"), F.col("__w"), F.lit(0)).cast("bigint").alias("n_violations"),
    )

    # ---- gated execution (depends_on): per partition, a rule whose
    # (transitive) dependency FAILED is skipped — verdict keeps n_rows but
    # reports pass=NULL / n_violations=NULL, and its violation rows are
    # anti-joined away. Mirrors the reference's skip of rule 1 when general
    # validation fails (maganamed.py:107-109). Suites without depends_on take
    # none of this: schema and plan are byte-identical to before. The skip set
    # derives from the PRE-gating verdicts (so a chain A→B→C resolves via the
    # closure, not iteration) and costs one extra execution of the totals
    # subplan — paid only by dependency-declaring suites.
    closure = suite.dependency_closure()
    if closure:
        dep_ids = sorted({d for deps in closure.values() for d in deps})
        failed = verdicts.filter(
            F.col("rule_id").isin(dep_ids) & ~F.col("pass")
        ).select(F.col("rule_id").alias("__dep"), "partition")
        edges = spark.createDataFrame(
            [(rid, d) for rid, deps in closure.items() for d in sorted(deps)],
            "rule_id string, __dep string",
        )
        skipped = (
            F.broadcast(edges)
            .join(failed, "__dep")
            .select("rule_id", "partition")
            .distinct()
            .withColumn("__skip", F.lit(True))
        )
        verdicts = (
            verdicts.join(F.broadcast(skipped), ["rule_id", "partition"], "left")
            .select(
                "rule_id",
                "partition",
                F.when(F.col("__skip"), F.lit(None).cast("boolean"))
                .otherwise(F.col("pass"))
                .alias("pass"),
                "n_rows",
                F.when(F.col("__skip"), F.lit(None).cast("bigint"))
                .otherwise(F.col("n_violations"))
                .alias("n_violations"),
            )
        )
        violations = violations.join(
            F.broadcast(skipped.drop("__skip")), ["rule_id", "partition"], "left_anti"
        )
    if violation_sample_ppm is not None:
        # applied LAST, on the returned frame only: every verdict count above
        # derives from counters/fragment sums, so sampling here can never
        # skew n_violations — it only bounds what is materialized.
        from data_validator_guard_spark.operators.sampling import (
            HASH_SPACE,
            PPM,
            _hash_position,
        )

        if not (0 <= violation_sample_ppm <= PPM):
            raise ValueError(
                f"violation_sample_ppm must be in [0, {PPM}], got {violation_sample_ppm}"
            )
        pos = _hash_position(
            F.concat_ws("\x1f", "rule_id", "partition", "keys", "detail")
        ).cast("decimal(38,0)")
        violations = violations.filter(
            pos * F.lit(PPM).cast("decimal(38,0)")
            < F.lit(violation_sample_ppm).cast("decimal(38,0)")
            * F.lit(HASH_SPACE).cast("decimal(38,0)")
        )
    return verdicts, violations


def _union_all(parts: Iterable[DataFrame], empty: DataFrame) -> DataFrame:
    out = empty
    for p in parts:
        out = out.unionByName(p.select(*empty.columns))
    return out


def report(verdicts: DataFrame, violations: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Canonically ordered small-report form (the reference sorts its issue
    export by (issue_type, id), `general_validation.py:119`). Only for final
    small outputs — never applied on the large path."""
    return (
        verdicts.orderBy("rule_id", "partition"),
        violations.orderBy("rule_id", "partition", "keys", "detail"),
    )


def validate_many(
    suites: "dict[str, tuple[DataFrame, RuleSuite]]",
    n_salts: int = DEFAULT_N_SALTS,
) -> tuple[DataFrame, DataFrame]:
    """Validate several tables in one run — the reference's ``main()`` walks
    every configured table through its per-table checks
    (`/root/reference/main.py:136-150`, `maganamed.py:102-150`); here each
    table's verdicts/violations union with a ``table`` provenance column.
    Each table keeps its own fused plans; the union is plan-level (no
    cross-table shuffle)."""
    all_v: DataFrame | None = None
    all_x: DataFrame | None = None
    for tname, (df, suite) in suites.items():
        v, x = validate(df, suite, n_salts=n_salts)
        v = v.select(F.lit(tname).alias("table"), *VERDICT_COLS)
        x = x.select(F.lit(tname).alias("table"), *VIOLATION_COLS)
        all_v = v if all_v is None else all_v.unionByName(v)
        all_x = x if all_x is None else all_x.unionByName(x)
    if all_v is None:
        raise ValueError("validate_many requires at least one suite")
    return all_v, all_x
