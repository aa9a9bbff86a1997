"""Watermarked streaming windowed aggregation: late events inside the
watermark merge into their window; windows finalize (append mode) only
once the watermark passes, and the final row includes the late data
(streaming/windowed.py)."""

from __future__ import annotations

import time
from datetime import datetime, timezone

from etl_prometheus2clickhouse_spark.streaming.windowed import (
    windowed_event_counts,
)

BASE = 1_700_000_000  # window [BASE, BASE+3600) boundary-aligned? not needed


def _write_batch(spark, path, rows, n):
    df = spark.createDataFrame(
        [
            (datetime.fromtimestamp(t, tz=timezone.utc), k, float(v))
            for t, k, v in rows
        ],
        "ts timestamp, event_type string, value double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/b{n}")


def test_late_event_within_watermark_lands_in_final_window(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    hour0 = BASE - (BASE % 3600)  # aligned window start

    schema = "ts timestamp, event_type string, value double"
    _write_batch(
        spark,
        src,
        [
            (hour0 + 60, "click", 1.0),
            (hour0 + 120, "click", 2.0),
        ],
        0,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    agg = windowed_event_counts(
        stream, window_duration="1 hour", watermark_delay="30 minutes"
    )
    qname = "windowed_counts_sink"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing finalized yet: watermark is behind the window end
        assert spark.sql(f"SELECT * FROM {qname}").count() == 0

        # a LATE event (event time before the current max) still within
        # the 30-min watermark → must merge into the open window;
        # plus a far-future event that pushes the watermark past the
        # window end so it finalizes
        _write_batch(
            spark,
            src,
            [
                (hour0 + 30, "click", 4.0),        # late, admissible
                (hour0 + 3 * 3600, "other", 9.0),  # advances watermark
            ],
            1,
        )
        q.processAllAvailable()
        # watermark advances at batch end; the emission happens on a
        # subsequent trigger — feed one more file to fire it
        _write_batch(spark, src, [(hour0 + 3 * 3600 + 60, "other", 1.0)], 2)
        q.processAllAvailable()

        rows = {
            (r.hour_ts, r.event_type): (r.n_events, r.sum_value_c)
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
        # the finalized click window contains ALL THREE events,
        # including the late one (1.0 + 2.0 + 4.0 = 700 cents)
        assert rows[(hour0, "click")] == (3, 700)
    finally:
        q.stop()


def test_session_windows_merge_across_batches(spark, tmp_path):
    """The session_window state machine's distinctive behavior: a LATE
    event arriving in a later micro-batch lands BETWEEN two open
    sessions and fuses them into one merged session — something
    tumbling windows can never do. Also pins the boundary rule:
    an event at EXACTLY gap distance still merges (inclusive
    boundary, same as the batch sessionize ``> gap`` rule)."""
    from etl_prometheus2clickhouse_spark.streaming.windowed import (
        session_window_stats,
    )

    src = str(tmp_path / "ssrc")
    ckpt = str(tmp_path / "sckpt")
    t0 = BASE
    schema = "ts timestamp, user_id long, value double"

    def _write(rows, n):
        df = spark.createDataFrame(
            [
                (datetime.fromtimestamp(t, tz=timezone.utc), u, 0.0)
                for t, u in rows
            ],
            schema,
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{n}")

    # batch 0: two clusters 40 min apart — with a 30-min gap these are
    # two OPEN sessions; user 2 pins the exact-gap boundary (1800 s
    # apart -> ONE session: the boundary is inclusive)
    _write([(t0, 1), (t0 + 2400, 1), (t0 + 4000, 2), (t0 + 5800, 2)], 0)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    out = session_window_stats(
        stream, ts_col="ts", key_col="user_id", gap="30 minutes",
        watermark_delay="2 hours",
    )
    qname = "session_windows_sink"
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r.user_id, r.start_sec): (r.end_sec, r.n_events)
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
        # user 1: two separate sessions (2400 s apart > 1800 s gap)
        assert rows[(1, t0)] == (t0 + 1800, 1)
        assert rows[(1, t0 + 2400)] == (t0 + 2400 + 1800, 1)
        # user 2: exactly 1800 s apart -> ONE merged session
        assert rows[(2, t0 + 4000)] == (t0 + 5800 + 1800, 2)
        assert (2, t0 + 5800) not in rows

        # batch 1: a late bridging event at t0+1200 for user 1 — its
        # window [1200, 3000) overlaps both open sessions -> the state
        # store must MERGE them into one [t0, t0+2400+1800) session
        _write([(t0 + 1200, 1)], 1)
        q.processAllAvailable()
        rows = {
            (r.user_id, r.start_sec): (r.end_sec, r.n_events)
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
        assert rows[(1, t0)] == (t0 + 2400 + 1800, 3)
        assert (1, t0 + 2400) not in rows
    finally:
        q.stop()
