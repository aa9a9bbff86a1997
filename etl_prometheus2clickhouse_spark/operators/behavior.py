"""Behavior analytics over the events fact model — the ClickHouse
analytics-function tier re-expressed Spark-first.

The reference pipeline's whole purpose is landing metrics in
ClickHouse, where users then reach for ClickHouse's signature
behavioral aggregates (``windowFunnel``, ``retention``, cohort
queries). These operators give the same questions native Spark
answers, so a user of the reference stack can run their downstream
analytics on the lake copy without a round-trip through the warehouse:

- :func:`window_funnel` — ClickHouse ``windowFunnel(window)(ts, c1,
  c2, …)``-style staged funnel: how far down an ordered chain of
  conditions each key progressed, with the chain constrained to a
  time window anchored at the first step. ``window_seconds=None``
  degenerates to ``sequenceMatch('(?1).*(?2)…')`` — ordered
  subsequence existence with no time bound.
- :func:`retention` — ClickHouse ``retention(c1, c2, …)``: per key,
  flag k is 1 iff condition 1 fired AND condition k fired.
- :func:`cohort_retention` — the classic cohort matrix (cohort week ×
  weeks-since-first-event → distinct active keys) built on exact
  integer day arithmetic so both engines agree bit-for-bit with no
  week-start-convention dependence.

Funnel semantics (deterministic "earliest chain"): the anchor is the
EARLIEST event satisfying step 1; step k's timestamp is the earliest
event satisfying condition k that is strictly after step k−1 and at
most ``window_seconds`` after the anchor. ClickHouse's
``windowFunnel`` maximizes the level over all candidate anchors; the
earliest-chain rule is the deterministic, join-expressible core
(identical whenever, as in monotone funnels, an earlier anchor never
hurts) and is what the oracle replicates exactly.

Scale shape: every stage is filter → map-side-combining ``min`` agg →
equi-join on the key. Each stage frame is one row per key that
reached that step (monotonically shrinking), so after the first
aggregation every subsequent join moves slim frames only; with AQE
the shrinking stage frames become broadcast joins automatically. No
windows over the full fact table, no per-event state — at 100 TB the
only full-data operations are the pushed-down per-step filters and
one partial-agg shuffle per step.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.functions.ts import epoch_micros

_US_PER_DAY = 86_400_000_000


def window_funnel(
    df: DataFrame,
    keys: Sequence[str],
    steps: Sequence[Column],
    ts_col: str = "ts",
    window_seconds: int | None = None,
) -> DataFrame:
    """Staged funnel level per key (earliest-chain semantics).

    Output: ``keys`` + ``level`` (0..len(steps); 0 = key never
    satisfied step 1) + ``anchor_sec`` (epoch second of the step-1
    anchor event; NULL at level 0). Every distinct key of ``df``
    appears exactly once.

    Ties: two qualifying events at the same microsecond collapse
    through ``min`` — both engines take the minimum timestamp, so the
    chain is deterministic without a secondary sort key.
    """
    if len(steps) < 2:
        raise ValueError("window_funnel needs at least 2 steps")
    keys = list(keys)
    ts_us = epoch_micros(df, ts_col).alias("__ts")
    base = df.select(*keys, ts_us, *[
        s.cast("boolean").alias(f"__c{i}") for i, s in enumerate(steps)
    ])

    # stage 1: anchor = earliest step-1 event per key
    stage = (
        base.where(F.col("__c0"))
        .groupBy(*keys)
        .agg(F.min("__ts").alias("__anchor"))
        .withColumn("__t_prev", F.col("__anchor"))
    )
    frames = [stage.select(*keys, "__anchor")]
    for k in range(1, len(steps)):
        cand = base.where(F.col(f"__c{k}")).select(*keys, "__ts")
        cond = F.col("__ts") > F.col("__t_prev")
        if window_seconds is not None:
            cond = cond & (
                F.col("__ts")
                <= F.col("__anchor") + F.lit(int(window_seconds) * 1_000_000)
            )
        stage = (
            cand.join(stage, keys)
            .where(cond)
            # __anchor is functionally dependent on the key (one row
            # per key in `stage`), so grouping by it keeps the frame
            # one-row-per-key while carrying the anchor forward
            .groupBy(*keys, "__anchor")
            .agg(F.min("__ts").alias("__t_prev"))
        )
        frames.append(stage.select(*keys, F.col("__t_prev").alias(f"__t{k}")))

    out = df.select(*keys).distinct()
    level = F.lit(0)
    for i, fr in enumerate(frames):
        out = out.join(fr, keys, "left")
        marker = "__anchor" if i == 0 else f"__t{i}"
        level = level + F.col(marker).isNotNull().cast("int")
    return out.select(
        *keys,
        level.alias("level"),
        F.floor(F.col("__anchor") / 1_000_000).cast("long").alias("anchor_sec"),
    )


def retention(
    df: DataFrame,
    keys: Sequence[str],
    conds: Sequence[Column],
) -> DataFrame:
    """ClickHouse ``retention``: per key, ``r1 = cond1 fired`` and
    ``rk = cond1 fired AND condk fired`` (k ≥ 2), as 0/1 ints.

    One map-side-combining aggregation over the fact table — each
    condition contributes a conditional ``max`` that partials collapse
    before the key exchange. Output: ``keys`` + ``r1..rn``.
    """
    if len(conds) < 1:
        raise ValueError("retention needs at least 1 condition")
    keys = list(keys)
    aggs = [
        F.max(c.cast("int")).alias(f"__raw{i}") for i, c in enumerate(conds)
    ]
    g = df.groupBy(*keys).agg(*aggs)
    cols = [F.col("__raw0").alias("r1")]
    for i in range(1, len(conds)):
        cols.append((F.col("__raw0") * F.col(f"__raw{i}")).alias(f"r{i + 1}"))
    return g.select(*keys, *cols)


def cohort_retention(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort matrix: (cohort period of a key's first event) ×
    (periods since first event) → distinct active keys.

    All time arithmetic is exact integer division on epoch days
    (``cohort_period = first_day // period_days``, ``period_offset =
    (day − first_day) // period_days``), so there is no week-start or
    timezone convention to disagree on across engines.

    Plan: per-key ``min`` (slim, map-side combined) → key equi-join
    back (co-partitioned with the previous shuffle's key) → distinct
    on the slim (cohort, offset, key) triple → count. The only
    full-width shuffle is the first per-key min; everything after
    moves O(keys × active periods) rows.
    """
    keys = list(keys)
    day = F.floor(epoch_micros(df, ts_col) / _US_PER_DAY).alias("__day")
    days = df.select(*keys, day)
    firsts = days.groupBy(*keys).agg(F.min("__day").alias("__first_day"))
    joined = days.join(firsts, keys)
    return (
        joined.select(
            *keys,
            F.floor(F.col("__first_day") / period_days)
            .cast("long")
            .alias("cohort_period"),
            F.floor((F.col("__day") - F.col("__first_day")) / period_days)
            .cast("long")
            .alias("period_offset"),
        )
        .distinct()
        .groupBy("cohort_period", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
