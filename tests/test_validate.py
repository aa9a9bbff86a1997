"""Row-level validation + quarantine (operators/validate.py):
fail-closed NULL semantics, ordered violation lists, whole-row
routing, rule summary counts, and the pure-JVM/no-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.validate import (
    quarantine_split,
    rule_summary,
    validate_rows,
)

def _rules():
    # built lazily: Column expressions need an active SparkContext,
    # which doesn't exist at collection time
    return [
        ("id_positive", F.col("id") > 0),
        ("name_present", "length(trim(name)) > 0"),
        ("score_in_range", F.col("score").between(0.0, 1.0)),
    ]


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 0.5),     # clean
            (-2, "bob", 0.9),      # id_positive
            (3, "  ", 0.1),        # name_present
            (4, "carol", 1.5),     # score_in_range
            (5, None, None),       # name NULL + score NULL: fail-closed
            (-6, "", 2.0),         # all three
        ],
        "id long, name string, score double",
    )


def test_violations_ordered_and_fail_closed(spark, frame):
    got = {r.id: (list(r.violations), r.valid)
           for r in validate_rows(frame, _rules()).collect()}
    assert got[1] == ([], True)
    assert got[-2] == (["id_positive"], False)
    assert got[3] == (["name_present"], False)
    assert got[4] == (["score_in_range"], False)
    # NULL name / NULL score → violations, not silent passes
    assert got[5] == (["name_present", "score_in_range"], False)
    # rule order preserved in the list
    assert got[-6] == (
        ["id_positive", "name_present", "score_in_range"], False
    )


def test_quarantine_split_routes_rows_whole(spark, frame):
    v = validate_rows(frame, _rules())
    ok, bad = quarantine_split(v)
    assert {r.id for r in ok.collect()} == {1}
    bad_rows = {r.id: r for r in bad.collect()}
    assert set(bad_rows) == {-2, 3, 4, 5, -6}
    # quarantined rows keep their original columns AND the audit list
    assert bad_rows[4].name == "carol" and bad_rows[4].violations


def test_rule_summary_counts(spark, frame):
    v = validate_rows(frame, _rules())
    s = {r.rule: r for r in rule_summary(v, _rules()).collect()}
    assert s["id_positive"].n_violations == 2
    assert s["name_present"].n_violations == 3
    assert s["score_in_range"].n_violations == 3
    assert all(r.n_rows == 6 for r in s.values())
    assert s["id_positive"].violation_rate == round(2 / 6, 6)


def test_guards(spark, frame):
    with pytest.raises(ValueError, match="at least one rule"):
        validate_rows(frame, [])
    with pytest.raises(ValueError, match="unique"):
        validate_rows(frame, [("a", "id > 0"), ("a", "id < 9")])
    with pytest.raises(ValueError, match="reserves column"):
        validate_rows(
            frame.withColumn("valid", F.lit(True)), _rules()
        )


def test_plan_pure_jvm_no_shuffle(spark, frame):
    import re

    out = validate_rows(frame, _rules())
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "PythonUDF" not in plan and "EvalPython" not in plan
    assert not re.search(r"\bExchange ", plan), plan


def test_rule_summary_empty_frame(spark, frame):
    """Zero validated rows → zero-count summary rows, not a TypeError
    from int(None): the F.sum aggregates are NULL on an empty frame and
    must be coalesced."""
    v = validate_rows(frame, _rules()).where(F.lit(False))
    s = {r.rule: r for r in rule_summary(v, _rules()).collect()}
    assert set(s) == {"id_positive", "name_present", "score_in_range"}
    assert all(
        r.n_violations == 0 and r.n_rows == 0 and r.violation_rate == 0.0
        for r in s.values()
    )
