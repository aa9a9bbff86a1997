"""Row-level data-quality validation + quarantine — the expectations
layer every production ingestion pipeline runs before anything
downstream trusts the rows (the public pattern of Amazon Deequ's
checks and Delta Live Tables' expectations, re-expressed as plain
DataFrame expressions with no framework dependency).

Semantics: a RULE is ``(name, boolean condition over the row)``; a row
VIOLATES a rule when the condition is false **or NULL** — fail-closed,
because a NULL check result means the fields the rule needed were
themselves missing, which is exactly what a quality gate exists to
catch (the ``etl_job`` lenient-cast lesson from the reference surface:
unparseable is a counted outcome, never a silent pass). Every row gets
the FULL list of its violations in rule order — auditable, not just a
boolean — and the quarantine split routes rows whole, so nothing is
dropped silently (the resolve_near_duplicates annotate-don't-delete
discipline).

Scale shape: validation is a single projection of JVM expressions —
no shuffle, no Python, fully pushdown-friendly; the rule summary is
one map-side-combining aggregate over booleans (one row per rule).
At 100 TB the gate costs one scan it shares with whatever reads the
data next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_condition(cond: "Column | str") -> Column:
    return F.expr(cond) if isinstance(cond, str) else cond


def validate_rows(
    df: DataFrame,
    rules: "list[tuple[str, Column | str]]",
    violations_col: str = "violations",
    valid_col: str = "valid",
) -> DataFrame:
    """Append ``violations array<string>`` (names of failed rules, in
    rule order) and ``valid boolean`` to every row. Conditions may be
    Columns or SQL strings; a NULL condition counts as a violation
    (fail-closed — module docstring). Rule names must be unique and
    non-empty."""
    if not rules:
        raise ValueError("validate_rows: needs at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names) or any(not n for n in names):
        raise ValueError(
            f"validate_rows: rule names must be unique and non-empty, "
            f"got {names!r}"
        )
    for reserved in (violations_col, valid_col):
        if reserved in df.columns:
            raise ValueError(
                f"validate_rows reserves column name {reserved!r}; "
                "rename it on the input frame first"
            )
    checks = [
        F.when(
            ~F.coalesce(_as_condition(cond), F.lit(False)), F.lit(name)
        )
        for name, cond in rules
    ]
    violations = F.filter(F.array(*checks), lambda x: x.isNotNull())
    return df.select(
        "*",
        violations.alias(violations_col),
    ).withColumn(valid_col, F.size(F.col(violations_col)) == 0)


def quarantine_split(
    validated: DataFrame, valid_col: str = "valid"
) -> "tuple[DataFrame, DataFrame]":
    """Split a :func:`validate_rows` output into ``(valid, quarantine)``
    — two filters over one lineage, rows routed whole (quarantined rows
    keep their violation list for triage/replay)."""
    return (
        validated.where(F.col(valid_col)),
        validated.where(~F.col(valid_col)),
    )


def rule_summary(
    validated: DataFrame,
    rules: "list[tuple[str, Column | str]]",
    violations_col: str = "violations",
) -> DataFrame:
    """Per-rule violation counts + rates over a validated frame — the
    one-row-per-rule health report a pipeline alerts on. One map-side-
    combining aggregate (booleans summed as ints); the output is
    rule-list-sized."""
    aggs = [
        F.coalesce(
            F.sum(
                F.array_contains(F.col(violations_col), name).cast("long")
            ),
            F.lit(0),
        ).alias(f"__v_{i}")
        for i, (name, _) in enumerate(rules)
    ]
    row = validated.agg(F.count(F.lit(1)).alias("__n"), *aggs).collect()[0]
    n = row["__n"]
    spark = validated.sparkSession
    from etl_prometheus2clickhouse_spark.localframe import local_df

    return local_df(
        spark,
        [
            (
                name,
                int(row[f"__v_{i}"]),
                int(n),
                round(row[f"__v_{i}"] / n, 6) if n else 0.0,
            )
            for i, (name, _) in enumerate(rules)
        ],
        "rule string, n_violations long, n_rows long, violation_rate double",
    )
