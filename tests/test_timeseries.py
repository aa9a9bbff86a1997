"""Time-series operators: counter-reset rate semantics and gap
sessionization (operators/timeseries.py)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.timeseries import (
    counter_rate,
    counter_rate_bucketed,
    session_stats,
    sessionize,
    sessionize_bucketed,
)


def _ts(sec: float):
    return datetime.fromtimestamp(sec, tz=timezone.utc)


def _series(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(t), v) for k, t, v in rows],
        "series string, ts timestamp, value double",
    )


def test_counter_rate_monotonic_series(spark):
    df = _series(spark, [("a", 0, 10.0), ("a", 10, 25.0), ("a", 20, 25.0)])
    got = {
        r.ts_sec: (r.increase, r.rate)
        for r in counter_rate(df, ["series"]).collect()
    }
    assert got[0.0] == (None, None)  # first sample: no interval
    assert got[10.0] == (15.0, 1.5)
    assert got[20.0] == (0.0, 0.0)


def test_counter_rate_reset_counts_new_value(spark):
    # 100 → 2: the counter restarted; increase is 2, not −98
    df = _series(spark, [("a", 0, 100.0), ("a", 50, 2.0), ("a", 100, 52.0)])
    got = {
        r.ts_sec: (r.increase, r.rate)
        for r in counter_rate(df, ["series"]).collect()
    }
    assert got[50.0] == (2.0, 2.0 / 50)
    assert got[100.0] == (50.0, 1.0)


def test_counter_rate_series_are_independent(spark):
    df = _series(spark, [("a", 0, 5.0), ("b", 10, 7.0)])
    rows = counter_rate(df, ["series"]).collect()
    # each series' first sample has no predecessor — no cross-series lag
    assert all(r.increase is None and r.rate is None for r in rows)


def test_sessionize_gap_boundaries(spark):
    df = _series(
        spark,
        [
            ("u1", 0, 0.0),
            ("u1", 100, 0.0),     # same session (gap 100 ≤ 1800)
            ("u1", 2000, 0.0),    # new session (gap 1900 > 1800)
            ("u1", 2100, 0.0),
            ("u2", 0, 0.0),       # separate key → own session numbering
        ],
    )
    got = {
        (r.series, r.ts_sec): r.session_id
        for r in sessionize(df, ["series"]).collect()
    }
    assert got[("u1", 0.0)] == 1
    assert got[("u1", 100.0)] == 1
    assert got[("u1", 2000.0)] == 2
    assert got[("u1", 2100.0)] == 2
    assert got[("u2", 0.0)] == 1


def test_session_stats_aggregates(spark):
    df = _series(
        spark,
        [("u1", 0, 0.0), ("u1", 100, 0.0), ("u1", 5000, 0.0)],
    )
    got = {
        (r.series, r.session_id): (r.n_events, r.start_sec, r.end_sec, r.duration_sec)
        for r in session_stats(df, ["series"]).collect()
    }
    assert got[("u1", 1)] == (2, 0.0, 100.0, 100.0)
    assert got[("u1", 2)] == (1, 5000.0, 5000.0, 0.0)


def test_bucketed_rate_equals_plain_across_boundaries(spark):
    # samples span 3 day-buckets with a counter RESET exactly on a
    # bucket boundary — the stitch must hand the previous bucket's last
    # sample to the next bucket's first row, including reset handling
    day = 86_400
    rows = [
        ("a", 10, 5.0),
        ("a", day - 10, 100.0),      # last of bucket 0
        ("a", day + 10, 2.0),        # first of bucket 1: RESET vs 100
        ("a", day + 500, 42.0),
        ("a", 2 * day + 5, 50.0),    # first of bucket 2
        ("b", day + 7, 1.0),         # other series: independent
    ]
    df = _series(spark, rows)
    plain = {
        (r.series, r.ts_sec): (r.increase, r.rate)
        for r in counter_rate(df, ["series"]).collect()
    }
    bucketed = {
        (r.series, r.ts_sec): (r.increase, r.rate)
        for r in counter_rate_bucketed(df, ["series"], bucket="day").collect()
    }
    assert bucketed == plain
    # spot-check the boundary reset itself
    assert bucketed[("a", float(day + 10))] == (2.0, 2.0 / 20)
    # and every series' very first sample is still unrated
    assert bucketed[("a", 10.0)] == (None, None)
    assert bucketed[("b", float(day + 7))] == (None, None)


def test_bucketed_sessionize_equals_plain(spark):
    # sessions that continue across a bucket boundary, break exactly at
    # one, and multiple sessions inside one bucket — ids must match the
    # single-window operator everywhere
    day = 86_400
    gap = 1800
    rows = [
        ("u", 100, 0.0),
        ("u", day - 60, 0.0),          # same? gap > 1800 → new session
        ("u", day + 60, 0.0),          # continues across the boundary (120s gap)
        ("u", day + 60 + gap + 1, 0.0),  # new session inside bucket 1
        ("u", 3 * day, 0.0),           # far later → new session, skipped bucket
        ("v", day + 5, 0.0),
    ]
    df = _series(spark, rows)
    plain = {
        (r.series, r.ts_sec): r.session_id
        for r in sessionize(df, ["series"], gap_seconds=gap).collect()
    }
    bucketed = {
        (r.series, r.ts_sec): r.session_id
        for r in sessionize_bucketed(
            df, ["series"], gap_seconds=gap, bucket="day"
        ).collect()
    }
    assert bucketed == plain
    assert bucketed[("u", float(day + 60))] == bucketed[("u", float(day - 60))]
    assert bucketed[("u", float(3 * day))] == bucketed[("u", float(day + 60))] + 2


def test_counter_rate_single_window_plan(spark):
    # one Exchange + one Sort: every derived column rides the same
    # keyed window; a second sort/shuffle means the plan regressed
    df = _series(spark, [("a", 0, 1.0)])
    p = spark._jvm.PythonSQLUtils.explainString(
        counter_rate(df, ["series"])._jdf.queryExecution(), "simple"
    )
    assert p.count("Exchange") == 1
    assert p.count("Sort") == 1


def test_quantile_sketch_tracks_exact_percentiles(spark, sf_dir):
    """The raw GK sketch values (the 100 TB path) must agree with the
    exact percentiles within the rank-error bound on real data. The
    catalog entry now emits the rank-guarantee face (within_bound),
    checked separately below; this pins the underlying VALUES against
    an independent exact computation."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    acc = 10_000
    sketch = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, acc).alias("p50"),
            F.percentile_approx("value", 0.95, acc).alias("p95"),
            F.percentile_approx("value", 0.99, acc).alias("p99"),
        )
        .collect()
    }
    # rank-based bound, not value-based: in a sparse heavy tail the
    # values of neighboring order statistics sit far apart, so the
    # right contract is "the sketch's answer is an order statistic
    # within ±1% rank of the target" (GK's own error at acc=1e4 is
    # far smaller; the 1% absorbs sample sparsity at tiny SFs)
    slack = 0.01
    bounds = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.percentile("value", max(q - slack, 0.0)).alias(f"lo{i}")
                for i, q in enumerate((0.5, 0.95, 0.99))
            ],
            *[
                F.percentile("value", min(q + slack, 1.0)).alias(f"hi{i}")
                for i, q in enumerate((0.5, 0.95, 0.99))
            ],
        )
        .collect()
    }
    assert bounds.keys() == sketch.keys()
    for t in sketch:
        for i, q in enumerate(("p50", "p95", "p99")):
            s = getattr(sketch[t], q)
            lo = getattr(bounds[t], f"lo{i}")
            hi = getattr(bounds[t], f"hi{i}")
            assert lo - 1e-9 <= s <= hi + 1e-9, (t, q, lo, s, hi)


def test_quantile_sketch_rank_guarantee_face(spark, sf_dir):
    """The catalog entry's hash-checkable face: within_bound must be
    TRUE for every (event_type, quantile) — the same claim its oracle
    states literally, verified here on the test corpus."""
    from etl_prometheus2clickhouse_spark.plans.catalog import (
        q_events_quantiles_sketch,
    )

    rows = q_events_quantiles_sketch(spark, sf_dir).collect()
    assert len(rows) > 0 and len(rows) % 3 == 0
    assert all(r.within_bound for r in rows), [
        (r.event_type, r.quantile) for r in rows if not r.within_bound
    ]


def test_detect_gaps_bounds_and_threshold(spark):
    from etl_prometheus2clickhouse_spark.operators.timeseries import (
        detect_gaps,
    )

    rows = [
        ("a", "2024-01-01 00:00:00"),
        ("a", "2024-01-01 00:30:00"),
        ("a", "2024-01-01 03:00:00"),  # 150-min gap
        ("a", "2024-01-01 03:10:00"),
        ("b", "2024-01-01 00:00:00"),
        ("b", "2024-01-02 00:00:00"),  # 24h gap
    ]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        (r.k, r.gap_sec)
        for r in detect_gaps(df, ["k"], "ts", min_gap_seconds=3600).collect()
    }
    assert got == {("a", 9000.0), ("b", 86400.0)}
    g = detect_gaps(df, ["k"], "ts", min_gap_seconds=3600).where(
        F.col("k") == "a"
    ).first()
    assert str(g.gap_start_ts).startswith("2024-01-01 00:30")
    assert str(g.gap_end_ts).startswith("2024-01-01 03:00")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_gap_seconds"):
        detect_gaps(df, ["k"], "ts", min_gap_seconds=0)


def test_ewma_recursion_and_tie_order(spark):
    from etl_prometheus2clickhouse_spark.operators.timeseries import ewma

    rows = [
        ("a", "2024-01-01 00:00:02", 1.0),
        ("a", "2024-01-01 00:00:01", 5.0),
        ("a", "2024-01-01 00:00:03", 2.0),
        # duplicate timestamp: (ts, value) order folds 1.0 before 4.0
        ("b", "2024-01-01 00:00:01", 4.0),
        ("b", "2024-01-01 00:00:01", 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    got = {r.k: r for r in ewma(df, ["k"], alpha=0.3).collect()}
    # a: s1=5 -> 0.3*1+0.7*5=3.8 -> 0.3*2+0.7*3.8=3.26
    assert got["a"].ewma == 3.26
    assert got["a"].n_samples == 3
    # b: s1=1 (lower value first on the tie) -> 0.3*4+0.7*1=1.9
    assert got["b"].ewma == 1.9


def test_linear_trend_exact_line_and_degenerate(spark):
    from etl_prometheus2clickhouse_spark.operators.timeseries import (
        linear_trend,
    )

    rows = [
        # perfect line: +2.5 per day
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-02 00:00:00", 12.5),
        ("a", "2024-01-03 00:00:00", 15.0),
        # no time variance -> NULL slope
        ("b", "2024-01-01 00:00:00", 1.0),
        ("b", "2024-01-01 00:00:00", 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    got = {r.k: r for r in linear_trend(df, ["k"]).collect()}
    assert got["a"].slope_per_day == 2.5
    assert got["a"].intercept == 10.0  # value at the series' first ts
    assert got["b"].slope_per_day is None


def test_seasonal_anomalies_flags_only_outliers(spark):
    from etl_prometheus2clickhouse_spark.operators.timeseries import (
        seasonal_anomalies,
    )

    # hour slot 0 of series a: values 10,10,10,10,100 — only the 100
    # exceeds 2.5 sigma; a constant slot (zero std) never flags
    rows = [
        ("a", "2024-01-01 00:01:00", 10.0),
        ("a", "2024-01-02 00:02:00", 10.0),
        ("a", "2024-01-03 00:03:00", 10.0),
        ("a", "2024-01-04 00:04:00", 10.0),
        ("a", "2024-01-05 00:05:00", 100.0),
        ("b", "2024-01-01 05:00:00", 7.0),
        ("b", "2024-01-02 05:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = seasonal_anomalies(df, ["k"], n_sigma=1.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.k, r.hod, r.value) == ("a", 0, 100.0)
    assert r.zscore > 1.5

    import pytest as _pytest

    with _pytest.raises(ValueError):
        seasonal_anomalies(df, ["k"], n_sigma=0)


def test_ewma_bucketed_equals_plain_across_boundaries(spark):
    """Segment-stitch EWMA (affine composition per day bucket) must
    reproduce the plain fold on multi-day series — including a series
    entirely inside one bucket, one spanning several, single-sample
    buckets, and duplicate-timestamp ties at a bucket boundary."""
    from etl_prometheus2clickhouse_spark.operators.timeseries import (
        ewma,
        ewma_bucketed,
    )

    rows = [
        ("one_bucket", "2024-01-01 05:00:00", 1.0),
        ("one_bucket", "2024-01-01 06:00:00", 9.0),
        ("span", "2024-01-01 23:59:59", 4.0),
        ("span", "2024-01-02 00:00:00", 8.0),
        ("span", "2024-01-02 00:00:00", 2.0),  # tie: value order
        ("span", "2024-01-04 12:00:00", 6.0),  # empty day between
        ("single", "2024-02-01 00:00:00", 7.5),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, value double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    plain = {r.k: (r.n_samples, r.last_sec, r.ewma)
             for r in ewma(df, ["k"], alpha=0.3).collect()}
    buck = {r.k: (r.n_samples, r.last_sec, r.ewma)
            for r in ewma_bucketed(df, ["k"], alpha=0.3).collect()}
    assert buck == plain
    # hand value for span: s=4 -> .3*2+.7*4=3.4 (tie folds 2 before 8)
    # -> .3*8+.7*3.4=4.78 -> .3*6+.7*4.78=5.146
    assert plain["span"][2] == 5.146


def test_ewma_bucketed_equals_plain_on_events(spark, sf_dir):
    from etl_prometheus2clickhouse_spark.operators.timeseries import (
        ewma,
        ewma_bucketed,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = {(r.event_type, r.user_id): (r.n_samples, r.last_sec, r.ewma)
             for r in ewma(ev, ["event_type", "user_id"]).collect()}
    buck = {(r.event_type, r.user_id): (r.n_samples, r.last_sec, r.ewma)
            for r in ewma_bucketed(ev, ["event_type", "user_id"]).collect()}
    assert buck == plain and len(plain) > 50


def test_ewma_rounding_is_explicit_floor_arithmetic(spark):
    """Regression pin for the sf0.1 boundary case: a fold landing on
    the shortest-repr value 66.0275995 (binary double slightly BELOW
    the .5 boundary) must round DOWN — Spark's own round() would give
    66.0276 (HALF_UP on the shortest decimal repr) while DuckDB gives
    66.027599; the explicit floor(x*1e6+0.5)/1e6 makes both engines
    compute 66.027599 on the identical double."""
    from etl_prometheus2clickhouse_spark.operators.timeseries import (
        ewma,
        ewma_bucketed,
    )

    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 66.0275995)],
        "k string, ts string, value double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    assert ewma(df, ["k"]).collect()[0].ewma == 66.027599
    assert ewma_bucketed(df, ["k"]).collect()[0].ewma == 66.027599
