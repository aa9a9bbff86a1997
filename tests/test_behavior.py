"""Semantics pins for operators/behavior.py (the ClickHouse
analytics-function tier): hand-built event logs where every funnel /
retention / cohort edge case has a known answer."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.behavior import (
    cohort_retention,
    retention,
    window_funnel,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h, m), t) for u, d, h, m, t in rows],
        "user_id long, ts timestamp_ntz, event_type string",
    )


def _steps():
    # built lazily: Column construction needs an active SparkContext
    return [F.col("event_type") == t for t in ("a", "b", "c")]


def _levels(df):
    return {
        r["user_id"]: (r["level"], r["anchor_sec"]) for r in df.collect()
    }


def test_funnel_full_chain_and_level_zero(spark):
    ev = _ev(
        spark,
        [
            (1, 1, 0, 0, "a"),
            (1, 1, 1, 0, "b"),
            (1, 1, 2, 0, "c"),
            (2, 1, 0, 0, "x"),  # never satisfies step 1 → level 0
        ],
    )
    out = _levels(window_funnel(ev, ["user_id"], _steps(), window_seconds=86400))
    assert out[1] == (3, int(datetime(2024, 1, 1).timestamp()))
    assert out[2] == (0, None)


def test_funnel_order_matters(spark):
    # b before a: chain can't use it — level stops at 1
    ev = _ev(spark, [(1, 1, 1, 0, "b"), (1, 1, 2, 0, "a")])
    out = _levels(window_funnel(ev, ["user_id"], _steps(), window_seconds=86400))
    assert out[1][0] == 1


def test_funnel_window_anchored_at_step_one(spark):
    # b inside the window, c one minute past anchor+window → level 2;
    # with no window bound the same log reaches level 3
    ev = _ev(
        spark,
        [(1, 1, 0, 0, "a"), (1, 1, 12, 0, "b"), (1, 2, 0, 1, "c")],
    )
    bounded = _levels(
        window_funnel(ev, ["user_id"], _steps(), window_seconds=86400)
    )
    unbounded = _levels(
        window_funnel(ev, ["user_id"], _steps(), window_seconds=None)
    )
    assert bounded[1][0] == 2
    assert unbounded[1][0] == 3


def test_funnel_strictly_after_previous_step(spark):
    # b at the exact anchor microsecond does not count (strict >)
    ev = _ev(spark, [(1, 1, 0, 0, "a"), (1, 1, 0, 0, "b")])
    out = _levels(window_funnel(ev, ["user_id"], _steps(), window_seconds=3600))
    assert out[1][0] == 1


def test_funnel_earliest_anchor_is_used(spark):
    # two step-1 events: the anchor is the EARLIEST one, so the
    # window that matters starts at 00:00, and a c at 23:00 relative
    # to a second a at 22:00 is still in (earliest) window via b=1:00
    ev = _ev(
        spark,
        [
            (1, 1, 0, 0, "a"),
            (1, 1, 22, 0, "a"),
            (1, 1, 1, 0, "b"),
            (1, 1, 23, 0, "c"),
        ],
    )
    out = _levels(window_funnel(ev, ["user_id"], _steps(), window_seconds=86400))
    assert out[1] == (3, int(datetime(2024, 1, 1).timestamp()))


def test_funnel_requires_two_steps(spark):
    ev = _ev(spark, [(1, 1, 0, 0, "a")])
    with pytest.raises(ValueError):
        window_funnel(ev, ["user_id"], _steps()[:1])


def test_retention_gates_on_first_condition(spark):
    ev = _ev(
        spark,
        [
            (1, 1, 0, 0, "a"),
            (1, 5, 0, 0, "c"),
            (2, 5, 0, 0, "c"),  # c fired but no a → all flags 0
        ],
    )
    conds = [
        F.col("event_type") == "a",
        F.col("event_type") == "b",
        F.col("event_type") == "c",
    ]
    out = {
        r["user_id"]: (r["r1"], r["r2"], r["r3"])
        for r in retention(ev, ["user_id"], conds).collect()
    }
    assert out[1] == (1, 0, 1)
    assert out[2] == (0, 0, 0)


def test_cohort_retention_integer_week_arithmetic(spark):
    # user 1 first active day 1 → cohort floor(19723/7); active again
    # day 9 (offset 1) and day 16 (offset 2); user 2 first active
    # day 9 → next cohort, offset 0 only
    ev = _ev(
        spark,
        [
            (1, 1, 0, 0, "a"),
            (1, 9, 0, 0, "a"),
            (1, 9, 5, 0, "a"),  # same period — distinct collapses it
            (1, 16, 0, 0, "a"),
            (2, 9, 0, 0, "a"),
        ],
    )
    out = {
        (r["cohort_period"], r["period_offset"]): r["n_active"]
        for r in cohort_retention(ev, ["user_id"], period_days=7).collect()
    }
    day1 = int(datetime(2024, 1, 1).timestamp()) // 86400
    day9 = day1 + 8
    assert out[(day1 // 7, 0)] == 1
    assert out[(day1 // 7, 1)] == 1
    assert out[(day1 // 7, 2)] == 1
    assert out[(day9 // 7, 0)] == 1
    assert len(out) == 4
