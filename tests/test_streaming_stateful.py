"""Stateful streaming counter rate: per-series state survives across
micro-batches, counter resets count the new value, replayed/stale rows
are flagged not rated (streaming/stateful.py)."""

from __future__ import annotations

from datetime import datetime, timezone

from etl_prometheus2clickhouse_spark.streaming.stateful import (
    streaming_counter_rate,
)

BASE = 1_700_000_000


def _write_batch(spark, path, rows, n):
    df = spark.createDataFrame(
        [
            (k, datetime.fromtimestamp(t, tz=timezone.utc), float(v))
            for k, t, v in rows
        ],
        "series string, ts timestamp, value double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/b{n}")


def test_state_crosses_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "series string, ts timestamp, value double"

    # batch 0: two samples of series a, one of b
    _write_batch(
        spark,
        src,
        [("a", BASE, 10.0), ("a", BASE + 10, 40.0), ("b", BASE, 5.0)],
        0,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    out = streaming_counter_rate(stream)
    qname = "stateful_rate_sink"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1: continuation of a (rate must use state from batch 0),
        # a counter RESET on b, and a replay of a's first sample
        _write_batch(
            spark,
            src,
            [
                ("a", BASE + 20, 100.0),  # inc 60 over 10 s → rate 6
                ("b", BASE + 100, 3.0),   # 5 → 3: reset → inc 3
                ("a", BASE, 10.0),        # stale replay → flagged late
            ],
            1,
        )
        q.processAllAvailable()
        all_rows = spark.sql(f"SELECT * FROM {qname}").collect()
        got = {
            (r.series, r.ts_sec, r.late): (r.increase, r.rate)
            for r in all_rows
        }
        # batch-0 facts
        assert got[("a", float(BASE), False)] == (None, None)
        assert got[("a", float(BASE + 10), False)] == (30.0, 3.0)
        assert got[("b", float(BASE), False)] == (None, None)
        # cross-batch continuation: state remembered (40.0 @ BASE+10)
        assert got[("a", float(BASE + 20), False)] == (60.0, 6.0)
        # counter reset: increase = new value
        assert got[("b", float(BASE + 100), False)] == (3.0, 3.0 / 100)
        # the replay of a's first sample is a SEPARATE row, flagged
        # late and unrated — and it did not corrupt state (the
        # continuation row above rated against the true last sample)
        assert got[("a", float(BASE), True)] == (None, None)
        assert len(all_rows) == 6
    finally:
        q.stop()


def test_duplicate_timestamp_ties_are_deterministic(spark, tmp_path):
    """Duplicate (series, ts) samples in one batch: the kernel sorts by
    (ts, value), so the LOWEST-valued sample of the tie group is the
    accepted one and every other tie row is flagged late — regardless
    of arrival order. Pins the contract ORACLE_STREAM_RATE mirrors."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "series string, ts timestamp, value double"
    # arrival order deliberately puts the higher value first
    _write_batch(
        spark,
        src,
        [
            ("a", BASE, 10.0),
            ("a", BASE + 10, 99.0),  # tie, higher value → late
            ("a", BASE + 10, 40.0),  # tie, lowest value → accepted
            ("a", BASE + 20, 70.0),  # rates against 40, not 99
        ],
        0,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    out = streaming_counter_rate(stream)
    qname = "stateful_tie_sink"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {qname}").collect()
        got = {
            (r.series, r.ts_sec, r.late): (r.increase, r.rate)
            for r in rows
        }
        assert got[("a", float(BASE + 10), False)] == (30.0, 3.0)
        assert got[("a", float(BASE + 10), True)] == (None, None)
        assert got[("a", float(BASE + 20), False)] == (30.0, 3.0)
        assert len(rows) == 4
    finally:
        q.stop()


def test_streaming_funnel_state_carries_across_batches(spark, tmp_path):
    """The funnel chain must advance across micro-batches through the
    three-scalar state: signup lands in batch 0, view+click in batch
    1, purchase in batch 2 but OUTSIDE the window — final level 3.
    Out-of-order events older than the chain's progress are ignored."""
    from datetime import datetime, timezone

    from etl_prometheus2clickhouse_spark.streaming.stateful import (
        streaming_window_funnel,
    )

    src = str(tmp_path / "fsrc")
    ckpt = str(tmp_path / "fckpt")
    t0 = 1_700_000_000
    schema = "ts timestamp, user_id long, event_type string"

    def _write(rows, n):
        df = spark.createDataFrame(
            [
                (datetime.fromtimestamp(t, tz=timezone.utc), u, e)
                for t, u, e in rows
            ],
            schema,
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{n}")

    _write([(t0, 1, "signup"), (t0 + 10, 1, "view")], 0)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    out = streaming_window_funnel(
        stream,
        steps=["signup", "view", "click", "purchase"],
        window_seconds=3600,
        watermark_delay="10 minutes",
    )
    qname = "stream_funnel_sink"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1: a click after the view (in window), plus a stale
        # pre-anchor view that must NOT re-anchor anything
        _write([(t0 + 100, 1, "click"), (t0 - 50, 1, "view")], 1)
        q.processAllAvailable()
        # batch 2: purchase past anchor+window -> chain stays at 3
        _write([(t0 + 3700, 1, "purchase")], 2)
        q.processAllAvailable()
        rows = [
            (r.level, r.anchor_sec)
            for r in spark.sql(
                f"SELECT * FROM {qname} ORDER BY level"
            ).collect()
        ]
        # one emission per batch: level 2 after b0, 3 after b1, 3 after b2
        assert rows == [(2, t0), (3, t0), (3, t0)]
    finally:
        q.stop()


def test_streaming_ewma_carries_level_and_matches_batch(spark, tmp_path):
    """The streaming EWMA's final emission on an in-order multi-batch
    stream must equal the batch operator (incl. the explicit floor
    rounding); a late straggler is dropped and counted, never folded."""
    from etl_prometheus2clickhouse_spark.operators.timeseries import ewma
    from etl_prometheus2clickhouse_spark.streaming.stateful import (
        streaming_ewma,
    )

    src = str(tmp_path / "esrc")
    ckpt = str(tmp_path / "eckpt")
    in_order = [
        ("a", BASE, 5.0),
        ("a", BASE + 10, 1.0),
        ("a", BASE + 10, 4.0),  # tie: value order folds 1 then 4
        ("a", BASE + 20, 2.0),
        ("b", BASE, 7.5),
    ]
    # the BASE+10 tie stays WITHIN batch 0: a tie member arriving in a
    # LATER batch is ts <= last accepted and drops by the documented
    # staleness rule (the batch operator would fold it)
    _write_batch(spark, src, in_order[:3], 0)
    stream = (
        spark.readStream.schema("series string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    out = streaming_ewma(stream, watermark_delay="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_sink")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1: the rest in order, plus one late replay of (a, BASE)
        _write_batch(spark, src, in_order[3:] + [("a", BASE, 99.0)], 1)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ewma_sink").collect()
    finally:
        q.stop()
    final = {}
    for r in rows:
        if final.get(r.series) is None or r.n_samples >= final[r.series].n_samples:
            final[r.series] = r
    batch_df = spark.createDataFrame(
        [
            (k, __import__("datetime").datetime.fromtimestamp(
                t, tz=__import__("datetime").timezone.utc), v)
            for k, t, v in in_order
        ],
        "series string, ts timestamp, value double",
    )
    want = {r.series: r for r in ewma(batch_df, ["series"]).collect()}
    for k in ("a", "b"):
        assert (
            final[k].n_samples, final[k].last_sec, final[k].ewma
        ) == (want[k].n_samples, want[k].last_sec, want[k].ewma)
    # the late replay was dropped and counted on a's batch-1 emission
    late_total = sum(r.n_late for r in rows if r.series == "a")
    assert late_total == 1
