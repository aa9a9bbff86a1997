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

from etl_prometheus2clickhouse_spark.functions.ts import (
    epoch_micros,
    epoch_seconds,
)


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
    ts_sec = epoch_seconds(df, ts_col)
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


def counter_rate_bucketed(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "day",
) -> DataFrame:
    """Skew-proof :func:`counter_rate`: identical output, but the
    window partitions on ``(keys, time-bucket)`` instead of the bare
    series key, so one enormous series no longer lands in one task.

    The price of splitting a series is that each bucket's FIRST sample
    has its predecessor in the previous bucket. That gap is stitched
    with a *slim* per-bucket frame — one row per (series, bucket)
    carrying the bucket's last sample — which flows through its own
    tiny window (ordered by bucket) and joins back onto only the
    boundary rows. Data volume: full rows shuffle once by
    (keys, bucket); the stitch frame is O(series × buckets).

    This is the general recipe for any lag/lead-style window at 100 TB
    with skewed keys: bucket the order column, window within buckets,
    stitch boundaries through the aggregated bucket frame.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("__b")
    ts_sec = epoch_seconds(df, ts_col)
    rows = df.select(*keys, b, ts_sec.alias("__t"), F.col(value_col).alias("__v"))

    w = Window.partitionBy(*keys, "__b").orderBy("__t")
    in_bucket = rows.select(
        *keys,
        "__b",
        "__t",
        "__v",
        F.lag("__v").over(w).alias("__pv"),
        F.lag("__t").over(w).alias("__pt"),
    )

    # slim stitch frame: last sample of each (series, bucket), shifted
    # one bucket forward so it is the predecessor of the next bucket's
    # first row
    per_bucket = rows.groupBy(*keys, "__b").agg(
        F.max_by(F.struct(F.col("__t"), F.col("__v")), F.col("__t")).alias("__last")
    )
    wb = Window.partitionBy(*keys).orderBy("__b")
    stitch = per_bucket.select(
        *keys,
        "__b",
        F.lag("__last").over(wb).alias("__prev_last"),
    )

    joined = in_bucket.join(stitch, [*keys, "__b"], "left")
    pv = F.coalesce(F.col("__pv"), F.col("__prev_last.__v"))
    pt = F.coalesce(F.col("__pt"), F.col("__prev_last.__t"))
    delta = F.col("__v") - pv
    increase = F.when(delta < 0, F.col("__v")).otherwise(delta)
    dt = F.col("__t") - pt
    return joined.select(
        *keys,
        F.col("__t").alias("ts_sec"),
        F.when(pv.isNotNull(), increase).alias("increase"),
        F.when(pv.isNotNull() & (dt > 0), increase / dt).alias("rate"),
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
    ts_sec = epoch_seconds(df, ts_col)
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


def sessionize_bucketed(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    bucket: str = "day",
) -> DataFrame:
    """Skew-proof :func:`sessionize`: identical session ids, windows
    partitioned on ``(keys, time-bucket)``.

    Two stitches are needed (vs one for :func:`counter_rate_bucketed`):

    1. each bucket's FIRST row decides its boundary flag against the
       previous bucket's LAST timestamp (slim frame, as for rate);
    2. session ids are global running counts, so each bucket adds the
       TOTAL boundary count of all earlier buckets as an offset —
       a cumulative sum over the same slim frame.

    Full rows shuffle once by (keys, bucket); everything else moves
    O(series × buckets) rows.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("__b")
    ts_sec = epoch_seconds(df, ts_col)
    rows = df.select(*keys, b, ts_sec.alias("__t"))

    w = Window.partitionBy(*keys, "__b").orderBy("__t")
    flagged = rows.select(
        *keys,
        "__b",
        "__t",
        # mid-bucket boundary flags; the bucket's first row stays NULL
        # until the stitch decides it
        F.when(
            F.lag("__t").over(w).isNotNull(),
            ((F.col("__t") - F.lag("__t").over(w)) > gap_seconds).cast("long"),
        ).alias("__mid_flag"),
    )

    per_bucket = flagged.groupBy(*keys, "__b").agg(
        F.min("__t").alias("__first_t"),
        F.max("__t").alias("__last_t"),
        F.coalesce(F.sum("__mid_flag"), F.lit(0)).alias("__n_mid"),
    )
    wb = Window.partitionBy(*keys).orderBy("__b")
    first_flag = F.when(
        F.lag("__last_t").over(wb).isNull()
        | ((F.col("__first_t") - F.lag("__last_t").over(wb)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stitch = per_bucket.select(
        *keys,
        "__b",
        first_flag.alias("__first_flag"),
        (
            F.sum(first_flag + F.col("__n_mid")).over(run)
            - (first_flag + F.col("__n_mid"))
        ).alias("__offset"),
    )

    joined = flagged.join(stitch, [*keys, "__b"])
    flag = F.coalesce(F.col("__mid_flag"), F.col("__first_flag"))
    running = Window.partitionBy(*keys, "__b").orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        *keys,
        F.col("__t").alias("ts_sec"),
        (F.col("__offset") + F.sum(flag).over(running)).alias("session_id"),
    )


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = None,
    bucket: str | None = None,
) -> DataFrame:
    """Aggregate sessionized events to one row per (keys, session_id):
    event count, start/end seconds, duration. Partial aggregation
    collapses each session map-side before the (keys, session_id)
    exchange, so the second shuffle moves one row per session, not per
    event. ``bucket`` (e.g. "day") switches to the skew-proof
    :func:`sessionize_bucketed` — identical ids, bounded task size."""
    if bucket is None:
        s = sessionize(df, keys, ts_col, gap_seconds)
    else:
        s = sessionize_bucketed(df, keys, ts_col, gap_seconds, bucket)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_sec").alias("start_sec"),
        F.max("ts_sec").alias("end_sec"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("duration_sec"),
    ]
    return s.groupBy(*keys, "session_id").agg(*aggs)


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    round_digits: int = 6,
) -> DataFrame:
    """Exponentially weighted moving average per series — the final
    smoothed level ``s₁ = x₁; sᵢ = α·xᵢ + (1−α)·sᵢ₋₁`` (the classic
    recursive smoother a metrics pipeline runs for alerting baselines).

    The recursion is inherently sequential in event order, which SQL
    windows cannot express directly; instead of a Python loop, each
    series' values are collected into ONE ordered array and folded
    JVM-side with ``F.aggregate`` — a single map-side-combining
    ``collect_list`` shuffle, then an O(n) fold inside whole-stage
    codegen, no Python anywhere. Contract (documented, like the
    broadcast-model text operators): a single series must fit in one
    executor's memory — series here are bounded per key; an unbounded
    series wants the streaming face (stateful carry) instead.

    Order ties: elements sort by (ts, value), so duplicate timestamps
    fold in a deterministic order both engines agree on. The fold
    expression ``α·x + (1−α)·s`` is evaluated with the same IEEE
    doubles in the same sequence as the DuckDB oracle's
    ``list_reduce``, so results match bit-for-bit before the final
    defensive rounding — which is EXPLICIT ``floor(x·10^d + 0.5)/10^d``
    arithmetic, not engine ``round()``: a raw fold result landing
    exactly on a shortest-decimal-representation ``…5`` boundary
    (observed once in 7,500 series at sf0.1) rounds UP under Spark's
    HALF_UP-on-shortest-repr but DOWN under DuckDB's
    round-the-binary-value; the explicit form computes identically on
    identical doubles in both engines.

    Output: ``keys`` + ``n_samples`` + ``last_sec`` + ``ewma``.
    """
    ts_us = epoch_micros(df, ts_col)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                ts_us.alias("__t"),
                F.col(value_col).cast("double").alias("__v"),
            )
        )
    )
    g = df.groupBy(*keys).agg(arr.alias("__arr"))
    vals = F.transform(F.col("__arr"), lambda s: s["__v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    scale = F.lit(float(10 ** round_digits))
    return g.select(
        *keys,
        F.size(F.col("__arr")).cast("long").alias("n_samples"),
        F.floor(F.element_at(F.col("__arr"), -1)["__t"] / 1_000_000)
        .cast("long")
        .alias("last_sec"),
        (F.floor(folded * scale + 0.5) / scale).alias("ewma"),
    )


def ewma_bucketed(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    round_digits: int = 6,
    bucket: str = "day",
) -> DataFrame:
    """Skew-proof :func:`ewma`: same output columns, but NO
    one-array-per-series contract — the recursion is segmented by time
    bucket and stitched, so the per-task state is bounded by the
    LARGEST BUCKET of a series, not the series (the
    ``sessionize_bucketed`` recipe applied to a recursive fold).

    The smoothing step ``s ← α·x + (1−α)·s`` is AFFINE in ``s``, and
    affine maps compose: a whole segment of values collapses to one
    pair ``(m, o)`` with ``s_out = m·s_in + o`` — ``m`` by iterated
    ``(1−α)`` multiplication, ``o`` by the same fold seeded at 0. Each
    (series, bucket) group folds its ordered values once (map-side-
    combining agg on the (keys, bucket) grid); the stitch then folds
    the O(buckets) per-series segment summaries in bucket order —
    first segment contributes its self-seeded value (``s₁ = x₁``
    semantics, same as :func:`ewma`), each later segment applies its
    ``(m, o)``.

    Numerics: the composed result equals the plain fold EXACTLY in
    real arithmetic and to ~1 ulp in IEEE doubles (multiplication
    distributed over the segment boundary) — measured: identical
    rounded values on 8,324/8,325 series across sf0.001-0.1, the one
    exception a 1-ulp drift straddling the 6-digit rounding boundary.
    The final rounding is therefore EXPLICIT arithmetic —
    ``floor(x·10^d + 0.5)/10^d`` — not engine ``round()``: Spark
    rounds the double's SHORTEST decimal representation HALF_UP while
    DuckDB rounds the binary value, and a raw result landing exactly
    on a shortest-repr ``…5`` boundary (bitwise identical in both
    engines, observed at sf0.1) rounds differently under the two —
    the explicit form computes identically on identical doubles.
    Per-segment folds use the identical expression sequence as
    :func:`ewma`'s kernel.

    Output: ``keys`` + ``n_samples`` + ``last_sec`` + ``ewma``.
    """
    ts_us = epoch_micros(df, ts_col)
    a, om = F.lit(alpha), F.lit(1.0 - alpha)
    rows = df.select(
        *keys,
        F.date_trunc(bucket, F.col(ts_col)).alias("__b"),
        ts_us.alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("__t").alias("__t"),
                                F.col("__v").alias("__v")))
    )
    g = rows.groupBy(*keys, "__b").agg(arr.alias("__arr"))
    vals = F.transform(F.col("__arr"), lambda s: s["__v"])
    m = F.aggregate(vals, F.lit(1.0), lambda acc, x: om * acc)
    o = F.aggregate(vals, F.lit(0.0), lambda acc, x: a * x + om * acc)
    seeded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: a * x + om * acc,
    )
    seg = g.select(
        *keys,
        F.struct(
            F.col("__b").alias("b"),
            m.alias("m"),
            o.alias("o"),
            seeded.alias("s"),
        ).alias("__seg"),
        F.size(F.col("__arr")).cast("long").alias("__n"),
        F.element_at(F.col("__arr"), -1)["__t"].alias("__last"),
    )
    segs = F.array_sort(F.collect_list("__seg"))
    k = seg.groupBy(*keys).agg(
        segs.alias("__segs"),
        F.sum("__n").alias("n_samples"),
        F.max("__last").alias("__last_us"),
    )
    stitched = F.aggregate(
        F.slice(
            F.col("__segs"),
            2,
            F.greatest(F.size(F.col("__segs")) - 1, F.lit(0)),
        ),
        F.element_at(F.col("__segs"), 1),
        lambda acc, x: F.struct(
            x["b"].alias("b"),
            x["m"].alias("m"),
            x["o"].alias("o"),
            (x["m"] * acc["s"] + x["o"]).alias("s"),
        ),
    )
    scale = F.lit(float(10 ** round_digits))
    return k.select(
        *keys,
        "n_samples",
        F.floor(F.col("__last_us") / 1_000_000).cast("long").alias(
            "last_sec"
        ),
        (F.floor(stitched["s"] * scale + 0.5) / scale).alias("ewma"),
    )


def linear_trend(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Per-series least-squares trend (slope per day + intercept) via
    closed-form sums — the "is this metric drifting" question.

    Exactness across engines: the five sufficient statistics (n, Σx,
    Σy, Σxy, Σx²) are summed in DECIMAL, which is associative, so
    shuffle order cannot perturb them; x is centered on the series'
    min timestamp first (slim min-agg + co-partitioned join back), so
    at a 3-year span and 10¹² rows Σx² ≤ ~10³⁷ still fits
    decimal(38). Only after aggregation do the (now identical) sums
    cast to double for the slope/intercept arithmetic — identical
    inputs, identical expression, identical IEEE results.

    Output: ``keys`` + ``n_samples`` + ``slope_per_day`` +
    ``intercept`` (intercept at the series' first timestamp; NULL
    slope when the series has no time variance).
    """
    ts_us = epoch_micros(df, ts_col)
    base = df.select(
        *keys, ts_us.alias("__x"), F.col(value_col).alias("__y")
    )
    mins = base.groupBy(*keys).agg(F.min("__x").alias("__x0"))
    j = base.join(mins, list(keys))
    xd = (F.col("__x") - F.col("__x0")).cast("decimal(16,0)")
    yd = F.col("__y").cast("decimal(12,6)")
    agg = j.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * yd).alias("__sxy"),
        F.sum(xd * xd).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom  # per microsecond
    return agg.select(
        *keys,
        F.col("__n").alias("n_samples"),
        F.round(
            F.when(denom != 0.0, slope * F.lit(86_400_000_000.0)),
            round_digits,
        ).alias("slope_per_day"),
        F.round(
            F.when(denom != 0.0, (sy - slope * sx) / n), round_digits
        ).alias("intercept"),
    )


def seasonal_anomalies(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    n_sigma: float = 2.5,
    round_digits: int = 6,
) -> DataFrame:
    """Seasonal z-score anomaly flagging — the alerting query a
    metrics warehouse runs: build a per-(series, hour-of-day)
    baseline (mean, sample std) over the corpus, then emit every
    sample more than ``n_sigma`` deviations from its own seasonal
    slot.

    Cross-engine exactness: the baseline moments come from
    DECIMAL-exact Σy and Σy² (associative, shuffle-order-proof), cast
    to double only for the mean/variance expressions; hour-of-day is
    integer µs arithmetic (``(ts_us // 3600e6) % 24``), no timezone
    or date-function convention involved.

    Plan: one map-side-combining aggregation to the slim
    (keys × 24)-row baseline, one equi-join back (baseline is dim-
    sized — broadcastable), a filter. No window, no sort.

    Output: ``keys`` + ``hod``, ``ts_sec``, ``value``, ``zscore``.
    """
    if n_sigma <= 0:
        raise ValueError("n_sigma must be positive")
    keys = list(keys)
    ts_us = epoch_micros(df, ts_col)
    base = df.select(
        *keys,
        F.floor(ts_us / 3_600_000_000).cast("long").alias("__h"),
        ts_us.alias("__ts"),
        F.col(value_col).cast("double").alias("__y"),
    ).withColumn("hod", (F.col("__h") % 24).cast("int"))
    yd = F.col("__y").cast("decimal(19,6)")
    stats = base.groupBy(*keys, "hod").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(yd).alias("__sy"),
        F.sum(yd * yd).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    sy = F.col("__sy").cast("double")
    syy = F.col("__syy").cast("double")
    mean = sy / n
    var = (n * syy - sy * sy) / (n * (n - F.lit(1.0)))
    sd = F.sqrt(var)
    baseline = stats.select(
        *keys,
        "hod",
        mean.alias("__mean"),
        sd.alias("__sd"),
        F.col("__n").alias("__cnt"),
    )
    z = (F.col("__y") - F.col("__mean")) / F.col("__sd")
    return (
        base.join(baseline, [*keys, "hod"])
        .where(
            (F.col("__cnt") > 1)
            & (F.col("__sd") > 0.0)
            & (F.abs(z) > F.lit(float(n_sigma)))
        )
        .select(
            *keys,
            "hod",
            F.floor(F.col("__ts") / 1_000_000).cast("long").alias("ts_sec"),
            F.col("__y").alias("value"),
            F.round(z, round_digits).alias("zscore"),
        )
    )


def detect_gaps(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    min_gap_seconds: float = 3600.0,
) -> DataFrame:
    """Per-series gap detection — the monitoring question the
    reference's data model invites ("where did this scrape target go
    silent?"): emit one row per pair of consecutive events of the same
    key whose spacing exceeds ``min_gap_seconds``, with the gap's
    bounds and width. The missing-data report a metrics pipeline runs
    against its own output, and the scrape-coverage audit for a
    training-data ingest.

    Plan shape: identical to :func:`counter_rate` — one
    ``Window.partitionBy(keys).orderBy(ts)`` (single Exchange + Sort,
    no Python); the lag rides the same sort. Skewed keys take the
    same bucket-window-stitch recipe as :func:`counter_rate_bucketed`.
    Epoch math, so results are session-timezone-independent."""
    if min_gap_seconds <= 0:
        raise ValueError("min_gap_seconds must be > 0")
    w = Window.partitionBy(*keys).orderBy(ts_col)
    ep = epoch_seconds(df, ts_col)
    prev_ep = F.lag(ep).over(w)
    return (
        df.select(
            *keys,
            F.lag(F.col(ts_col)).over(w).alias("gap_start_ts"),
            F.col(ts_col).alias("gap_end_ts"),
            (ep - prev_ep).alias("gap_sec"),
        )
        .where(F.col("gap_sec") > F.lit(float(min_gap_seconds)))
    )
