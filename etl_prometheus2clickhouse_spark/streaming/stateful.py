"""Custom stateful streaming operator: per-series counter rate via
``applyInPandasWithState``.

The batch :func:`operators.timeseries.counter_rate` is a keyed window —
fine when the whole series is in the frame. On an unbounded stream the
previous sample of each series must be *remembered across
micro-batches*; that is exactly the GroupState contract:

- state per series key = (last event-time µs, last value) — two
  scalars, so state size is O(active series), independent of stream
  length;
- each micro-batch's rows for a key arrive as pandas DataFrames; rows
  are processed in event-time order WITHIN the batch (sorted here —
  Spark only groups, it does not order);
- an event-time timeout (watermark-driven) evicts series that have
  gone silent, bounding state exactly like the windowed aggregation's
  watermark does.

Late rows older than the remembered state are dropped (counted per
batch in the output's ``late`` flag) rather than producing negative
intervals — the streaming analog of Prometheus staleness handling.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "series string, ts_sec double, increase double, rate double, late boolean"
)
STATE_SCHEMA = "last_us long, last_value double"


def _rate_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key kernel: fold this batch's samples over the remembered
    (last_us, last_value), emitting one row per sample."""
    if state.hasTimedOut:
        state.remove()
        return
    last_us, last_value = (
        state.get if state.exists else (None, None)
    )
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_us")
        for ts_us, value in zip(pdf["ts_us"], pdf["value"]):
            ts_us = int(ts_us)
            value = float(value)
            if last_us is not None and ts_us <= last_us:
                # older than (or equal to) the remembered sample: a
                # replay or out-of-order straggler — flag, don't rate
                out.append((key[0], ts_us / 1e6, None, None, True))
                continue
            if last_us is None:
                out.append((key[0], ts_us / 1e6, None, None, False))
            else:
                delta = value - last_value
                inc = value if delta < 0 else delta  # counter reset
                dt = (ts_us - last_us) / 1e6
                out.append((key[0], ts_us / 1e6, inc, inc / dt, False))
            last_us, last_value = ts_us, value
    if last_us is not None:
        state.update((last_us, last_value))
        # evict series silent for > 1h of event time (watermark-driven)
        state.setTimeoutTimestamp(last_us // 1000 + 3_600_000)
    yield pd.DataFrame(
        out, columns=["series", "ts_sec", "increase", "rate", "late"]
    )


def streaming_counter_rate(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "series",
    value_col: str = "value",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Continuous per-series increase/rate over an event-time stream.

    Same reset semantics as the batch operator; state is two scalars
    per active series with event-time timeout eviction.
    """
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.functions.ts import epoch_micros

    prepared = (
        events.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(key_col).alias("series"),
            epoch_micros(events, ts_col).alias("ts_us"),
            F.col(value_col).cast("double").alias("value"),
            F.col(ts_col),
        )
    )
    return prepared.groupBy("series").applyInPandasWithState(
        _rate_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
