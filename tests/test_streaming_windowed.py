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
