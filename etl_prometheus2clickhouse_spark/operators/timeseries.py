"""Time-series analytics over the events/metrics fact model.

Operators the reference's fixed pipeline cannot express but its data
model invites (engine extension; both are pure window-function plans —
single shuffle on the series key, no Python):

- :func:`counter_rate` — PromQL-style per-series rate/increase with
  counter-reset handling: a decrease means the counter restarted, so
  the increase since the previous sample is the new value itself, not
  the (negative) difference.
- :func:`sessionize` — gap-based sessionization (the classic behavior
  /training-data pipeline op): a new session starts when the gap to
  the previous event of the same key exceeds ``gap_seconds``; session
  ids are a cumulative sum of the boundary flags.

Scale shape: one ``Window.partitionBy(keys).orderBy(ts)`` each — the
shuffle is on the series/user key (high cardinality, uniform), and
every derived column rides the same sort, so Catalyst plans exactly
one Exchange + one Sort per operator. At 100 TB this is the canonical
partitioned-window job; skewed keys (one enormous series) are the
failure mode to watch, same as any keyed window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def counter_rate(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-series increase and per-second rate with counter resets.

    For each row (ordered by ``ts_col`` within ``keys``):

    - ``increase`` = value − prev_value, unless the value decreased
      (counter reset — Prometheus semantics: the counter restarted at
      0, so the whole new value counts), in which case ``increase`` =
      value;
    - ``rate`` = increase / seconds since the previous sample;
    - first sample of a series → NULLs (no interval to rate over).

    Output: input keys + ``ts_sec``, ``increase``, ``rate``.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    ts_sec = F.unix_micros(F.col(ts_col)) / 1_000_000.0
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_sec).over(w)
    delta = F.col(value_col) - prev_v
    increase = F.when(delta < 0, F.col(value_col)).otherwise(delta)
    dt = ts_sec - prev_t
    return df.select(
        *keys,
        ts_sec.alias("ts_sec"),
        F.when(prev_v.isNotNull(), increase).alias("increase"),
        F.when(prev_v.isNotNull() & (dt > 0), increase / dt).alias("rate"),
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids per key.

    A session boundary is an event whose gap to the previous event of
    the same key exceeds ``gap_seconds`` (the first event of a key is
    always a boundary). ``session_id`` is the running count of
    boundaries within the key — 1-based, stable, and reproducible in
    plain SQL (the DuckDB oracle uses the identical
    lag → flag → cumulative-sum formulation).

    Output: input keys + ``ts_sec``, ``session_id``.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    ts_sec = F.unix_micros(F.col(ts_col)) / 1_000_000.0
    prev_t = F.lag(ts_sec).over(w)
    new_session = (
        prev_t.isNull() | ((ts_sec - prev_t) > gap_seconds)
    ).cast("long")
    running = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(
        *keys,
        ts_sec.alias("ts_sec"),
        F.sum(new_session).over(running).alias("session_id"),
    )


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Aggregate sessionized events to one row per (keys, session_id):
    event count, start/end seconds, duration. Partial aggregation
    collapses each session map-side before the (keys, session_id)
    exchange, so the second shuffle moves one row per session, not per
    event."""
    s = sessionize(df, keys, ts_col, gap_seconds)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_sec").alias("start_sec"),
        F.max("ts_sec").alias("end_sec"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("duration_sec"),
    ]
    return s.groupBy(*keys, "session_id").agg(*aggs)
