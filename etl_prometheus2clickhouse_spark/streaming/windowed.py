"""Streaming windowed aggregation with event-time watermarks — the
streaming face of the catalog's ``events_hourly`` batch query.

``windowed_event_counts`` is a plain streaming plan (no foreachBatch):
tumbling event-time windows, keyed by event type, with a watermark that
(a) admits late events up to the configured delay — they merge into
their window's still-open state — and (b) bounds that state: windows
older than the watermark finalize, emit (append mode), and evict.
This is the Structured Streaming-native replacement for the
reference's single fixed pipeline when the workload is aggregation
rather than row shipping: state is bounded by ``watermark_delay`` ×
active keys, independent of stream length, which is what makes the
operator viable on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.functions.ts import epoch_micros


def session_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation on a stream via Spark's native
    ``session_window`` — the stateful MERGING-window operator (unlike
    tumbling windows, a late event can fuse two open sessions into
    one, which the state store handles by merging their partial
    aggregates). The streaming twin of the batch
    ``timeseries.sessionize`` lag→flag→cumsum plan; at 100 TB/day the
    watermark bounds state to (active keys × open sessions), and
    closed sessions finalize and evict exactly like closed tumbling
    windows.

    Output (one final row per closed session): key, ``start_sec`` /
    ``end_sec`` (session bounds, epoch seconds — ``end`` is
    last-event + gap by session_window's definition), ``n_events``.
    """
    agged = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return agged.select(
        F.col(key_col),
        F.floor(epoch_micros(agged, "w.start") / 1_000_000)
        .cast("long")
        .alias("start_sec"),
        F.floor(epoch_micros(agged, "w.end") / 1_000_000)
        .cast("long")
        .alias("end_sec"),
        "n_events",
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per key over an event-time stream.

    Output (append mode emits one final row per closed window):
    ``hour_ts`` (window start, epoch seconds), key, ``n_events``,
    ``sum_value_c`` (cents BIGINT — catalog output discipline).
    """
    agged = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
            ).alias("sum_value_c"),
        )
    )
    # window struct inherits ts_col's flavor (NTZ in → NTZ out);
    # epoch_micros dispatches on the nested field's actual dtype
    return agged.select(
        F.floor(epoch_micros(agged, "w.start") / 1_000_000)
        .cast("long")
        .alias("hour_ts"),
        key_col,
        "n_events",
        "sum_value_c",
    )
