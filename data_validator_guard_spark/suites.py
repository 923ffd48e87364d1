"""Canonical rule suites.

``source_code_suite`` is the north-rule flagship: the full check family the
reference runs per table (`/root/reference/main.py:35-74` — dupes, normalized
dupes, referential, regex) re-expressed over the
``(repo, path, commit, lang, content)`` table, plus the scale-era additions
(column stats thresholds, drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_validator_guard_spark.rules import Rule, RuleSuite
from data_validator_guard_spark.synth import allowed_langs_dim

COMMIT_PATTERN = r"^[0-9a-f]{40}$"
PATH_PATTERN = r"^(?!.*\.\.)[A-Za-z0-9_\-./]+\.[A-Za-z0-9]+$"
LENGTH_EDGES = [0.0, 64.0, 128.0, 256.0, 512.0, 1024.0, 2048.0, 4096.0]


def source_code_suite(
    spark: SparkSession,
    baseline_hist: DataFrame | None = None,
    partition_by: str = "pmod(xxhash64(repo), 16)",
) -> RuleSuite:
    """Verdicts partitioned by repo-hash bucket (explicit repartitioning key
    per the north rule); keys are the natural (repo, path, commit) identity."""
    rules = [
        Rule("path_not_blank", "not_blank", ("path",)),
        Rule("path_pattern", "regex_match", ("path",), {"pattern": PATH_PATTERN}),
        Rule("commit_pattern", "regex_match", ("commit",), {"pattern": COMMIT_PATTERN}),
        Rule("content_not_blank", "not_blank", ("content",)),
        Rule("lang_null_rate", "null_rate_max", ("lang",), {"max_rate": 0.02}),
        Rule("lang_cardinality", "cardinality_range", ("lang",), {"lo": 1, "hi": 64}),
        Rule("file_identity_unique", "unique", ("repo", "path", "commit")),
        Rule(
            "lang_in_dim",
            "foreign_key",
            ("lang",),
            # inline: the ~40-value dim collapses to an isin fused into the
            # totals + violation scans — no separate referential table pass.
            {"dim": allowed_langs_dim(spark), "inline": True},
        ),
    ]
    if baseline_hist is not None:
        rules.append(
            Rule(
                "content_length_drift",
                "drift",
                ("content",),
                {
                    "group_by": "lang",
                    "value": "length(content)",
                    "edges": LENGTH_EDGES,
                    "baseline": baseline_hist,
                    "threshold": 0.2,
                },
            )
        )
    return RuleSuite(
        name="source_code",
        rules=rules,
        partition_by=partition_by,
        key_cols=("repo", "path", "commit"),
    )
