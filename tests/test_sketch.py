"""KMV distinct sketch (operators/sketch.py): exactness below k,
estimate accuracy above k, determinism under repartitioning, and the
WindowGroupLimit plan shape that makes the bottom-k scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.sketch import (
    kmv_distinct,
    uniform_hash32,
)


def test_hash_is_md5_prefix(spark):
    df = spark.range(1).select(uniform_hash32(F.lit(42)).alias("h"))
    # md5('42') = a1d0c6e8... → 0xa1d0c6e8 = 2714814184
    assert df.collect()[0].h == 2714814184


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(1000)], "g string, v int"
    )
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row.n_k == 10
    assert row.est_distinct == 10.0


def test_estimate_accuracy_above_k(spark):
    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    row = kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert row.n_k == 256
    # bottom-k relative error concentrates around 1/sqrt(k) ≈ 6%
    assert abs(row.est_distinct - n) / n < 0.25


def test_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i * 7919 % 500) for i in range(4000)],
        "g string, v int",
    )
    a = sorted(map(tuple, kmv_distinct(df, ["g"], "v", k=32).collect()))
    b = sorted(
        map(tuple, kmv_distinct(df.repartition(13, "v"), ["g"], "v", k=32).collect())
    )
    assert a == b


def test_k_must_be_at_least_two(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=1)


def test_bottom_k_uses_window_group_limit(spark):
    """The rank filter must push a per-group k-limit below the shuffle
    (WindowGroupLimit) so map tasks never emit a full distinct set."""
    df = spark.createDataFrame(
        [("a", i) for i in range(100)], "g string, v int"
    )
    plan = (
        kmv_distinct(df, ["g"], "v", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
