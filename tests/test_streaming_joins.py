"""Stream-stream interval join (streaming/joins.py): boundary
semantics and state-bounding watermarks, driven as a real file stream.
The sf0.01 oracle sweep covers the catalog face; this pins the exact
inclusion rules on a hand-built corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.streaming.joins import (
    interval_join_streams,
)


@pytest.fixture(scope="module")
def joined_rows(spark, tmp_path_factory):
    base = 1_700_000_000
    rows = [
        # (user, kind, offset_sec)
        (1, "signup", 0),
        (1, "purchase", -1),          # before signup: excluded
        (1, "purchase", 0),           # same instant: included
        (1, "purchase", 3600),        # exactly +1h: included
        (1, "purchase", 3601),        # past the bound: excluded
        (2, "signup", 100),
        (2, "purchase", 200),         # included
        (3, "purchase", 50),          # no signup for user 3
    ]
    d = tmp_path_factory.mktemp("sj")
    spark.createDataFrame(
        [(u, k, base + off) for u, k, off in rows],
        "user_id bigint, event_type string, epoch bigint",
    ).select(
        "user_id", "event_type", F.timestamp_seconds("epoch").alias("ts")
    ).write.mode("overwrite").parquet(str(d / "ev.parquet"))
    batch = spark.read.parquet(str(d / "ev.parquet"))

    def _src():
        return (
            spark.readStream.schema(batch.schema)
            .parquet(str(d / "ev.parquet"))
        )

    signups = _src().where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts")
    )
    purchases = _src().where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    out = interval_join_streams(
        signups, purchases, "user_id", "s_ts", "p_ts", "1 hour", "10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("sj_sink").collect()


def test_interval_bounds_inclusive_start_and_end(joined_rows):
    got = sorted(
        (r.user_id, int(r.p_ts.timestamp()) - int(r.s_ts.timestamp()))
        for r in joined_rows
    )
    assert got == [(1, 0), (1, 3600), (2, 100)]


def test_no_match_without_left_row(joined_rows):
    assert all(r.user_id != 3 for r in joined_rows)


def test_interval_join_validates_inputs(spark):
    df = spark.readStream.format("rate").load()
    l = df.selectExpr("value as k", "timestamp as l_ts")
    r = df.selectExpr("value as k", "timestamp as r_ts")
    with pytest.raises(ValueError, match="not a simple interval"):
        interval_join_streams(l, r, "k", "l_ts", "r_ts", max_delay="1 hour; DROP")
    with pytest.raises(ValueError, match="distinct column names"):
        interval_join_streams(l, l, "k", "l_ts", "l_ts")
    with pytest.raises(ValueError, match="backtick"):
        interval_join_streams(
            l.withColumnRenamed("l_ts", "l`ts"), r, "k", "l`ts", "r_ts"
        )


def test_interval_join_accepts_compound_delay(spark):
    """Compound interval strings ('1 hour 30 minutes') are valid Spark
    syntax and must pass validation — the regex guard may not narrow
    the accepted surface."""
    df = spark.readStream.format("rate").load()
    l = df.selectExpr("value as k", "timestamp as l_ts")
    r = df.selectExpr("value as k", "timestamp as r_ts")
    joined = interval_join_streams(
        l, r, "k", "l_ts", "r_ts", max_delay="1 hour 30 minutes"
    )
    assert joined.isStreaming
