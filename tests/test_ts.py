"""functions/ts.py — timezone-proof epoch dispatch over every
timestamp flavor (the round-4 breaker: unix_micros rejects
TIMESTAMP_NTZ in Spark 4, and the testdata has shipped ts as NTZ, LTZ,
and epoch-nanos BIGINT across generations)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_prometheus2clickhouse_spark.functions.ts import (
    epoch_micros,
    epoch_seconds,
    to_instant,
    to_ntz,
)

US = 1_704_067_798_778_549  # 2024-01-01 00:09:58.778549 UTC


def _frames(spark):
    """The same instant in every supported column flavor."""
    ntz = spark.sql(
        f"SELECT timestamp_micros({US}) AS ts"
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    ltz = spark.sql(f"SELECT timestamp_micros({US}) AS ts")
    nanos = spark.createDataFrame([(US * 1000,)], "ts bigint")
    secs = spark.createDataFrame([(US / 1_000_000,)], "ts double")
    return {"ntz": ntz, "ltz": ltz, "nanos": nanos, "secs": secs}


def test_epoch_micros_agrees_across_flavors(spark):
    for name, df in _frames(spark).items():
        got = df.select(epoch_micros(df, "ts").alias("us")).first().us
        assert got == US, (name, got)


def test_epoch_seconds_agrees_across_flavors(spark):
    for name, df in _frames(spark).items():
        got = df.select(epoch_seconds(df, "ts").alias("s")).first().s
        assert abs(got - US / 1_000_000) < 1e-6, (name, got)


def test_to_ntz_normalizes_and_is_idempotent(spark):
    for name, df in _frames(spark).items():
        out = to_ntz(df, "ts")
        assert dict(out.dtypes)["ts"] == "timestamp_ntz", name
        # idempotent: a second pass returns the same plan object
        assert to_ntz(out, "ts") is out
        # round-trip preserves the instant exactly
        got = out.select(epoch_micros(out, "ts").alias("us")).first().us
        assert got == US, name


def test_to_instant_produces_watermarkable_type(spark):
    for name, df in _frames(spark).items():
        out = to_instant(df, "ts")
        assert dict(out.dtypes)["ts"] == "timestamp", name
        got = out.select(F.unix_micros("ts").alias("us")).first().us
        assert got == US, name


def test_nested_window_field_dispatch(spark):
    """epoch_micros must resolve dtypes of nested refs like "w.start"
    — window structs inherit the grouped column's flavor, and NTZ
    window starts broke unix_micros in round 4."""
    df = _frames(spark)["ntz"]
    agged = df.groupBy(F.window("ts", "1 hour").alias("w")).count()
    got = agged.select(epoch_micros(agged, "w.start").alias("us")).first().us
    assert got == (US // 3_600_000_000) * 3_600_000_000


def test_ntz_results_ignore_session_timezone(spark):
    """The whole point: wall time reads as UTC no matter who built the
    session. Flip the session timezone and the epoch must not move."""
    df = _frames(spark)["ntz"]
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        got = df.select(epoch_micros(df, "ts").alias("us")).first().us
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert got == US
