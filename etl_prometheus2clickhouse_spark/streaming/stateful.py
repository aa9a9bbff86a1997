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
    """Per-key kernel, vectorized: the whole batch's samples are
    sorted once and the increase/rate math runs as numpy array ops —
    only the two boundary scalars cross micro-batches through state.
    (A per-sample Python fold here scales linearly with data volume;
    at 100 TB the per-row interpreter cost dominates the operator.)

    Sort key is ``(ts_us, value)``, so duplicate-timestamp samples are
    handled deterministically: the lowest-valued sample of a tie group
    is the accepted one, the rest are flagged late — the oracle can
    (and does) mirror that exactly.

    Late semantics are unchanged: a sample at or before the last
    ACCEPTED sample's timestamp (remembered or in-batch) is a replay /
    out-of-order straggler — flagged, never rated, never advancing
    state. In a sorted batch that is precisely ``ts <= carried-last``
    or ``ts == previous row's ts``.
    """
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        return
    last_us, last_value = (
        state.get if state.exists else (None, None)
    )
    # groups are often tiny (one series' samples per micro-batch), so
    # the per-call constant matters as much as the asymptotics: stay
    # on numpy arrays end to end — pandas sort_values alone costs
    # ~40× a lexsort at n≈10 — and touch pandas only for the one
    # output frame the API requires
    chunks = [c for c in pdfs if len(c)]
    n = sum(len(c) for c in chunks)
    if n:
        if len(chunks) == 1:
            ts_us = chunks[0]["ts_us"].to_numpy(dtype=np.int64)
            value = chunks[0]["value"].to_numpy(dtype=np.float64)
        else:
            ts_us = np.concatenate(
                [c["ts_us"].to_numpy(dtype=np.int64) for c in chunks]
            )
            value = np.concatenate(
                [c["value"].to_numpy(dtype=np.float64) for c in chunks]
            )
        order = np.lexsort((value, ts_us))
        ts_us = ts_us[order]
        value = value[order]

        tie = np.zeros(n, dtype=bool)
        tie[1:] = ts_us[1:] == ts_us[:-1]
        late = tie if last_us is None else tie | (ts_us <= last_us)

        acc_ts = ts_us[~late]
        acc_val = value[~late]
        increase = np.full(n, None, dtype=object)
        rate = np.full(n, None, dtype=object)
        if len(acc_ts):
            # previous accepted sample per accepted row: the carried
            # state scalar for row 0, the prior accepted row after
            prev_ts = np.concatenate(([acc_ts[0]], acc_ts[:-1]))
            prev_val = np.concatenate(([0.0], acc_val[:-1]))
            has_prev = np.ones(len(acc_ts), dtype=bool)
            if last_us is None:
                has_prev[0] = False
            else:
                prev_ts[0] = last_us
                prev_val[0] = last_value
            delta = acc_val - prev_val
            inc = np.where(delta < 0.0, acc_val, delta)  # counter reset
            dt = (acc_ts - prev_ts) / 1e6  # exact µs diff, one divide
            with np.errstate(invalid="ignore", divide="ignore"):
                rt = inc / dt
            acc_idx = np.flatnonzero(~late)
            rated = acc_idx[has_prev]
            increase[rated] = inc[has_prev]
            rate[rated] = rt[has_prev]
            last_us = int(acc_ts[-1])
            last_value = float(acc_val[-1])
        out = pd.DataFrame(
            {
                "series": np.repeat(key[0], n),
                "ts_sec": ts_us / 1e6,
                "increase": increase,
                "rate": rate,
                "late": late,
            },
            copy=False,
        )
    else:
        out = pd.DataFrame(
            columns=["series", "ts_sec", "increase", "rate", "late"]
        )
    if last_us is not None:
        state.update((last_us, last_value))
        # evict series silent for > 1h of event time (watermark-driven)
        state.setTimeoutTimestamp(last_us // 1000 + 3_600_000)
    yield out


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


FUNNEL_OUTPUT_SCHEMA = "user_id long, level int, anchor_sec long"
FUNNEL_STATE_SCHEMA = "anchor_us long, prev_us long, level int"


def streaming_window_funnel(
    events: DataFrame,
    steps: "list[str]",
    ts_col: str = "ts",
    key_col: str = "user_id",
    step_col: str = "event_type",
    window_seconds: int | None = None,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """The streaming face of ``operators.behavior.window_funnel``
    (earliest-chain semantics) as a second custom stateful operator:
    per-key state is THREE scalars — the chain's anchor, the last
    matched step's timestamp, and the level — so state is O(active
    keys) regardless of stream length, with watermark-driven
    event-time eviction like the rate operator above.

    Per micro-batch the kernel sorts the key's rows once and advances
    the chain with at most ``len(steps)`` VECTORIZED first-match
    searches (one ``argmax`` per still-open level) — never a
    per-event Python loop. Each batch emits the key's current
    ``(level, anchor_sec)``; on an in-order stream (or the bounded
    single-batch harness face) the final emission equals the batch
    operator exactly, which is what the shared catalog oracle checks.
    Out-of-order events older than the chain's progress cannot
    retroactively re-anchor it (the same staleness stance as the
    rate operator's late handling).
    """
    if len(steps) < 2:
        raise ValueError("streaming_window_funnel needs >= 2 steps")
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.functions.ts import epoch_micros

    n_steps = len(steps)
    window_us = (
        None if window_seconds is None else int(window_seconds) * 1_000_000
    )

    def _funnel_fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        anchor, prev, level = (
            state.get if state.exists else (None, None, 0)
        )
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            if len(chunks) == 1:
                ts = chunks[0]["ts_us"].to_numpy(dtype=np.int64)
                et = chunks[0]["step_val"].to_numpy()
            else:
                ts = np.concatenate(
                    [c["ts_us"].to_numpy(dtype=np.int64) for c in chunks]
                )
                et = np.concatenate(
                    [c["step_val"].to_numpy() for c in chunks]
                )
            order = np.argsort(ts, kind="stable")
            ts, et = ts[order], et[order]
            max_ts = int(ts[-1])
            while level < n_steps:
                mask = et == steps[level]
                if level == 0:
                    pass  # anchor search: any step-1 event
                else:
                    mask &= ts > prev
                    if window_us is not None:
                        mask &= ts <= anchor + window_us
                hits = np.flatnonzero(mask)
                if len(hits) == 0:
                    break
                t = int(ts[hits[0]])
                if level == 0:
                    anchor = t
                prev = t
                level += 1
            state.update((anchor, prev, level))
            # evict keys silent for > 7 days of event time
            state.setTimeoutTimestamp(
                max_ts // 1000 + 7 * 24 * 3_600_000
            )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "level": [level],
                "anchor_sec": [
                    None if anchor is None else anchor // 1_000_000
                ],
            }
        )

    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).alias("user_id"),
        epoch_micros(events, ts_col).alias("ts_us"),
        F.col(step_col).alias("step_val"),
        F.col(ts_col),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


EWMA_OUTPUT_SCHEMA = (
    "series string, n_samples long, last_sec long, ewma double, "
    "n_late long"
)
EWMA_STATE_SCHEMA = "s double, n long, last_us long"


def streaming_ewma(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "series",
    value_col: str = "value",
    alpha: float = 0.3,
    round_digits: int = 6,
    watermark_delay: str = "30 minutes",
    state_ttl_hours: float = 7 * 24,
) -> DataFrame:
    """The streaming face of ``operators.timeseries.ewma`` — the
    stated escape hatch for genuinely unbounded series: per-series
    state is THREE scalars (current level, sample count, last accepted
    event-time µs), so a series of any length costs O(1) memory and
    the fold never re-reads history (the batch faces — ``ewma`` and
    the skew-proof ``ewma_bucketed`` — own bulk backfill).

    Per batch the key's rows sort by ``(ts, value)`` (the batch
    operator's tie order) and fold sequentially from the carried
    level; each batch emits the key's running ``(n_samples, last_sec,
    ewma)``, so on an in-order stream the FINAL emission equals the
    batch operator exactly (pinned by pytest, incl. the explicit
    ``floor(x·10^d + 0.5)/10^d`` rounding). Late rows at or before the
    last accepted timestamp are DROPPED and counted in ``n_late`` —
    the recursion is order-defined and history cannot be re-folded;
    same staleness stance as the rate operator above and the funnel's
    tested matrix.

    The fold is a per-row loop over ONE micro-batch's samples for one
    key — bounded by the batch, not the stream; the recursion is
    inherently sequential (each step needs the previous level), which
    is exactly why the state face exists instead of a window.

    ``state_ttl_hours`` is the event-time eviction horizon: a series
    silent for that long (by watermark) drops its level — size it to
    the data's cadence, not wall time (a 1-hour TTL under 6-day
    micro-batch spans silently restarts every slow series, which is a
    WRONG ANSWER, not a memory optimization; found by the stream_ewma
    oracle)."""
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.functions.ts import epoch_micros

    scale = float(10 ** round_digits)
    ttl_ms = int(state_ttl_hours * 3_600_000)

    def _ewma_fn(key, pdfs, state):
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        s, n, last_us = state.get if state.exists else (None, 0, None)
        chunks = [c for c in pdfs if len(c)]
        n_late = 0
        if chunks:
            if len(chunks) == 1:
                ts = chunks[0]["ts_us"].to_numpy(dtype=np.int64)
                val = chunks[0]["value"].to_numpy(dtype=np.float64)
            else:
                ts = np.concatenate(
                    [c["ts_us"].to_numpy(dtype=np.int64) for c in chunks]
                )
                val = np.concatenate(
                    [c["value"].to_numpy(dtype=np.float64) for c in chunks]
                )
            order = np.lexsort((val, ts))
            ts, val = ts[order], val[order]
            if last_us is not None:
                fresh = ts > last_us
                n_late = int((~fresh).sum())
                ts, val = ts[fresh], val[fresh]
            for x in val:
                s = x if s is None else alpha * x + (1.0 - alpha) * s
            n += len(val)
            if len(ts):
                last_us = int(ts[-1])
        if last_us is not None:
            state.update((float(s), int(n), int(last_us)))
            state.setTimeoutTimestamp(last_us // 1000 + ttl_ms)
        yield pd.DataFrame(
            {
                "series": [key[0]],
                "n_samples": [int(n)],
                "last_sec": [
                    None if last_us is None else last_us // 1_000_000
                ],
                "ewma": [
                    None
                    if s is None
                    else float(np.floor(s * scale + 0.5) / scale)
                ],
                "n_late": [n_late],
            }
        )

    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).alias("series"),
        epoch_micros(events, ts_col).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
        F.col(ts_col),
    )
    return prepared.groupBy("series").applyInPandasWithState(
        _ewma_fn,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
