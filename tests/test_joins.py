"""Backward as-of join semantics: inclusive matching, no-predecessor
NULLs, per-key isolation, tolerance voiding (operators/joins.py)."""

from __future__ import annotations

from datetime import datetime, timezone

from etl_prometheus2clickhouse_spark.operators.joins import asof_join


def _ts(sec: int):
    return datetime.fromtimestamp(sec, tz=timezone.utc)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts(50), 1),   # before any right row → NULL
            ("a", _ts(100), 2),  # equal ts → inclusive match
            ("a", _ts(150), 3),  # between updates → first config
            ("a", _ts(250), 4),  # after second update
            ("b", _ts(300), 5),  # other key: no right rows at all
        ],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [("a", _ts(100), 10.0), ("a", _ts(200), 20.0)],
        "k string, ts timestamp, cfg double",
    )
    got = {r.eid: r.cfg for r in asof_join(left, right, ["k"]).collect()}
    assert got == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: None}


def test_asof_join_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame(
        [("a", _ts(1000), 1), ("a", _ts(5000), 2)],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [("a", _ts(900), 7.0)], "k string, ts timestamp, cfg double"
    )
    got = {
        r.eid: r.cfg
        for r in asof_join(
            left, right, ["k"], tolerance_seconds=500
        ).collect()
    }
    assert got == {1: 7.0, 2: None}  # 4100 s stale > 500 s tolerance


def test_asof_join_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [("a", _ts(i), i) for i in range(100)],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [("a", _ts(50), 1.0)], "k string, ts timestamp, cfg double"
    )
    out = asof_join(left, right, ["k"])
    assert out.count() == 100  # never fans out or drops left rows
    assert out.columns == ["k", "ts", "eid", "cfg"]


def test_asof_join_forward_inclusive(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts(50), 1),   # before first config → matches it
            ("a", _ts(100), 2),  # equal ts → inclusive match
            ("a", _ts(150), 3),  # between updates → NEXT config
            ("a", _ts(250), 4),  # after last config → NULL
            ("b", _ts(300), 5),  # other key: no right rows at all
        ],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [("a", _ts(100), 10.0), ("a", _ts(200), 20.0)],
        "k string, ts timestamp, cfg double",
    )
    got = {
        r.eid: r.cfg
        for r in asof_join(left, right, ["k"], direction="forward").collect()
    }
    assert got == {1: 10.0, 2: 10.0, 3: 20.0, 4: None, 5: None}


def test_asof_join_forward_tolerance(spark):
    left = spark.createDataFrame(
        [("a", _ts(1000), 1), ("a", _ts(100), 2)],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [("a", _ts(1100), 7.0)], "k string, ts timestamp, cfg double"
    )
    got = {
        r.eid: r.cfg
        for r in asof_join(
            left, right, ["k"], tolerance_seconds=500, direction="forward"
        ).collect()
    }
    assert got == {1: 7.0, 2: None}  # 1000 s ahead > 500 s tolerance


def test_asof_join_rejects_unknown_direction(spark):
    import pytest

    df = spark.createDataFrame([("a", _ts(1), 1)], "k string, ts timestamp, eid int")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, ["k"], direction="nearest")


# ---------------------------------------------------------------------------
# skew tooling
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

from etl_prometheus2clickhouse_spark.operators.joins import (  # noqa: E402
    key_skew_stats,
    salted_join,
)


def test_key_skew_stats_ranks_heaviest_first(spark):
    rows = [("hot", i) for i in range(70)] + [
        ("warm", i) for i in range(20)
    ] + [("cold", 0)] + [("cool", i) for i in range(9)]
    df = spark.createDataFrame(rows, "k string, v bigint")
    out = key_skew_stats(df, ["k"], top=3).collect()
    assert [r.k for r in out] == ["hot", "warm", "cool"]
    assert out[0].n_rows == 70 and out[0].rank == 1
    assert out[0].share == 0.7
    assert out[2].share == 0.09


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i, "hot" if i % 10 else "rare", i * 2) for i in range(200)],
        "row_id bigint, k string, payload bigint",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("rare", 2), ("absent", 3)],
        "k string, rv bigint",
    )
    plain = left.join(right, "k", "inner")
    salted = salted_join(left, right, ["k"], salt_col="row_id", n_salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # left join keeps unmatched left rows exactly once too
    left2 = left.union(
        spark.createDataFrame([(999, "nomatch", 0)], left.schema)
    )
    pl = left2.join(right, "k", "left")
    sl = salted_join(left2, right, ["k"], salt_col="row_id", n_salts=8, how="left")
    assert sorted(map(tuple, sl.collect())) == sorted(map(tuple, pl.collect()))


def test_salted_join_spreads_hot_key_across_salts(spark):
    left = spark.createDataFrame(
        [(i, "hot") for i in range(500)], "row_id bigint, k string"
    )
    from pyspark.sql import functions as F
    n = (
        left.withColumn(
            "s", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8))
        )
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(n) == 8  # every salt bucket receives work
    assert max(r["count"] for r in n) < 500 * 0.3


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.createDataFrame([(1, "a")], "row_id bigint, k string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], salt_col="row_id", how="anti")


def test_bloom_filtered_join_matches_plain_join(spark):
    from etl_prometheus2clickhouse_spark.operators.joins import (
        bloom_filtered_join,
    )

    left = spark.createDataFrame(
        [(i, i % 100) for i in range(2000)], "row_id bigint, key bigint"
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 100, 7)], "key bigint, name string"
    )
    plain = left.join(right, "key", "inner")
    filtered = bloom_filtered_join(left, right, "key", m_bits=4096)
    assert sorted(map(tuple, filtered.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # selectivity: the bloom pre-filter must actually cut the left side
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    sk = bloom_build(right.select("key"), "key", 4096, 4)
    kept = (
        bloom_probe(left, "key", sk, 4096, 4)
        .where("bloom_hit")
        .count()
    )
    assert kept < 2000 * 0.5  # 15/100 keys match; fp rate tiny at 4096 bits


def test_fuzzy_token_join_edit1_classes(spark):
    """Every edit-distance-1 class must match through the deletion
    neighborhood: equality, deletion, insertion, substitution — and
    distance-2 pairs must not."""
    from etl_prometheus2clickhouse_spark.operators.joins import (
        fuzzy_token_join,
    )

    left = spark.createDataFrame(
        [("spark",), ("sprk",), ("spork",), ("sparkk",), ("xxyyz",)],
        "token string",
    )
    right = spark.createDataFrame([("spark",), ("stork",)], "token string")
    got = {
        (r.left_token, r.right_token): r.distance
        for r in fuzzy_token_join(left, right).collect()
    }
    assert got[("spark", "spark")] == 0
    assert got[("sprk", "spark")] == 1   # insertion into left
    assert got[("spork", "spark")] == 1  # substitution
    assert got[("sparkk", "spark")] == 1  # deletion from left
    assert got[("spork", "stork")] == 1
    # distance 2: no row
    assert ("xxyyz", "spark") not in got
    assert ("sprk", "stork") not in got
