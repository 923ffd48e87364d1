"""Property-based checks (hypothesis): engine counters vs naive Python oracles
on small random inputs — the salted/hashed fast paths must be invisible."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_validator_guard_spark.engine import validate
from data_validator_guard_spark.rules import Rule, RuleSuite

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "hot", "hot", "hot"]),  # skewed keys
        st.integers(min_value=0, max_value=5),
        st.one_of(st.none(), st.text(alphabet="xy ", min_size=0, max_size=3)),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_unique_and_notblank_counts_match_python(spark, rows):
    df = spark.createDataFrame(rows, "k string, v int, s string")
    suite = RuleSuite(
        "p",
        [
            Rule("kv_unique", "unique", ("k", "v")),
            Rule("s_not_blank", "not_blank", ("s",)),
        ],
        key_cols=("k",),
    )
    verdicts, _ = validate(df, suite)
    got = {r.rule_id: r.n_violations for r in verdicts.collect()}

    counts = Counter((k, v) for k, v, _ in rows)
    expected_dups = sum(c for c in counts.values() if c > 1)
    expected_blank = sum(1 for _, _, s in rows if s is None or s.strip() == "")
    assert got["kv_unique"] == expected_dups
    assert got["s_not_blank"] == expected_blank


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_range_and_derived_counts_match_python(spark, rows):
    df = spark.createDataFrame(rows, "k string, v int, s string")
    suite = RuleSuite(
        "p2",
        [
            Rule("v_near_2", "range_tolerance", ("v",), {"value": "v", "expected": "2", "tol": 1.0}),
            Rule("k_is_hot", "derived_equality", ("k",), {"value": "k", "expected": "'hot'"}),
        ],
        key_cols=("k",),
    )
    verdicts, violations = validate(df, suite)
    got = {r.rule_id: r.n_violations for r in verdicts.collect()}
    expected_range = sum(1 for _, v, _ in rows if not (abs(v - 2) <= 1))
    expected_derived = sum(1 for k, _, _ in rows if k != "hot")
    assert got["v_near_2"] == expected_range
    assert got["k_is_hot"] == expected_derived
    # violation rows agree with the counters (row-level rules: weight 1 each)
    vc = Counter(r.rule_id for r in violations.collect())
    assert vc.get("v_near_2", 0) == expected_range
    assert vc.get("k_is_hot", 0) == expected_derived


asof_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(min_value=0, max_value=20)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_rows, right=asof_rows)
def test_asof_join_matches_python_oracle(spark, left, right):
    from data_validator_guard_spark.operators.temporal import asof_join

    # right side must have unique (key, ts) — the operator's documented
    # contract (callers dedupe); value = ts*10 keeps it checkable.
    rmap = {}
    for k, t in right:
        rmap[(k, t)] = float(t * 10)
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rmap.items()], "k string, t long, val double"
    )
    got = {
        r.lid: r.val_asof
        for r in asof_join(ldf, rdf, "k", "t", "t", ["val"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cand = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt <= t]
        want = max(cand)[1] if cand else None
        assert got[i] == want, (i, k, t, got[i], want)


# --- connected components vs union-find -----------------------------------
_cc_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_cc_edges)
def test_connected_components_matches_union_find(spark, edges):
    from data_validator_guard_spark.operators.dedup import connected_components

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}

    ids = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "id1 bigint, id2 bigint",
    )
    got = {r.id: r.cluster for r in connected_components(ids, pairs).collect()}
    assert got == expected


# --- hamming distance properties ------------------------------------------
_bits = st.lists(st.sampled_from("01"), min_size=1, max_size=64).map("".join)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=_bits, b=_bits)
def test_hamming_symmetric_and_matches_python(spark, a, b):
    from pyspark.sql import functions as F

    from data_validator_guard_spark.operators.dedup import hamming_distance

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    expected = sum(x != y for x, y in zip(a, b))
    row = (
        spark.range(1)
        .select(
            hamming_distance(F.lit(a), F.lit(b)).alias("ab"),
            hamming_distance(F.lit(b), F.lit(a)).alias("ba"),
        )
        .collect()[0]
    )
    assert row.ab == row.ba == expected


# --- composite rulebook vs row-wise simulation ----------------------------
_rb_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.sampled_from(["1", "2"]),
        st.text(alphabet="pq", min_size=1, max_size=2),
    ),
    min_size=1,
    max_size=30,
)
_rb_rules = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.sampled_from(["1", "2"]),
        st.sampled_from(["delete", "update", "merge", "add", "use", "skip"]),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_rb_rows, rules=_rb_rules)
def test_apply_rulebook_matches_rowwise_simulation(spark, rows, rules):
    """Reference semantics simulated per row: delete on full-key match;
    update/merge/add rewrite the primary key; use/skip leave it alone."""
    from data_validator_guard_spark.operators.cleaning import apply_rulebook

    rb_map = {(k, n): act for k, n, act in rules}
    expected = Counter()
    for k, n_, payload in rows:
        act = rb_map.get((k, n_))
        if act == "delete":
            continue
        new_key = f"{k}9" if act in ("update", "merge", "add") else k
        expected[(new_key, n_, payload)] += 1

    df = spark.createDataFrame(rows, "pid string, num string, payload string")
    rb = spark.createDataFrame(
        [(k, n_, f"{k}9" if act in ("update", "merge", "add") else None, act)
         for k, n_, act in rules] or [("Z", "9", None, "skip")],
        "pid string, num string, correct_value string, action string",
    )
    out = apply_rulebook(df, rb, key_col=("pid", "num"))
    got = Counter((r.pid, r.num, r.payload) for r in out.collect())
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True
    ),
    ppm_a=st.integers(min_value=0, max_value=1_000_000),
    ppm_b=st.integers(min_value=0, max_value=1_000_000),
)
def test_hash_sample_nesting_property(spark, ids, ppm_a, ppm_b):
    """For ANY two fractions a <= b, the a-sample is a subset of the
    b-sample, and membership is a pure per-row function (subset stability
    under arbitrary corpus composition comes free from the same fact)."""
    from data_validator_guard_spark.operators.sampling import hash_sample

    lo, hi = sorted((ppm_a, ppm_b))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    s_lo = {r.doc_id for r in hash_sample(df, "doc_id", lo).collect()}
    s_hi = {r.doc_id for r in hash_sample(df, "doc_id", hi).collect()}
    assert s_lo <= s_hi
    # ppm=0 is empty, ppm=10^6 is everything — the boundary contract
    if lo == 0:
        assert s_lo == set()
    if hi == 1_000_000:
        assert s_hi == set(ids)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["p", "q"]),
            st.one_of(st.none(), st.text(alphabet="ab\x1f\x1e|", max_size=4)),
        ),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_partition_fingerprint_order_insensitive_and_change_sensitive(
    spark, rows, seed
):
    """Fingerprints ignore row order (any permutation fingerprints equal)
    but never ignore a multiset change (dropping one row flips its
    partition) — even for values containing the separator/sentinel bytes,
    because the md5 runs over the per-row image, not a corpus concat."""
    import random

    from data_validator_guard_spark.operators.snapshot_diff import (
        changed_partitions,
        partition_fingerprints,
    )

    df = spark.createDataFrame(rows, "grp string, x string")
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "grp string, x string").repartition(3)
    assert (
        changed_partitions(
            partition_fingerprints(df, "grp", ["x"]),
            partition_fingerprints(df2, "grp", ["x"]),
        )
        == []
    )
    dropped_grp = rows[0][0]
    df3 = spark.createDataFrame(rows[1:], "grp string, x string") if len(rows) > 1 else spark.createDataFrame([], "grp string, x string")
    chg = changed_partitions(
        partition_fingerprints(df, "grp", ["x"]),
        partition_fingerprints(df3, "grp", ["x"]),
    )
    assert dropped_grp in chg
    # partitions whose row multiset is untouched must NOT be flagged
    remaining = Counter(r for r in rows[1:])
    original = Counter(r for r in rows)
    for grp in {g for g, _ in rows}:
        g_orig = Counter((g, x) for g, x in original.elements() if g == grp)
        g_rem = Counter((g, x) for g, x in remaining.elements() if g == grp)
        if g_orig == g_rem:
            assert grp not in chg
