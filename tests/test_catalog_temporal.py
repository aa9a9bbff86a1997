"""Non-vacuity guards for the temporal-join oracle entries.

Round 3 shipped a green `events_range_join` that proved nothing: promo
intervals derived from 1995-2001 orders could never contain a 2024
event, so both engines emitted 0 rows and the driver's hash compared
two empty sets (VERDICT round 3, "What's wrong" #1). These tests pin
the round-4 fix — both temporal catalog queries must keep producing
*populated* results that exercise the hard part of each operator —
so the regression cannot silently reappear behind a green oracle row.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_prometheus2clickhouse_spark.plans.catalog import (
    q_events_asof,
    q_events_range_join,
)


def test_asof_oracle_is_non_vacuous(spark, sf_dir):
    """The as-of output must exercise carry-forward (many configs per
    type), the mid-stream switch (>1 distinct matched config per
    type), and the no-predecessor NULL path — not just a terminal
    match against one config."""
    out = q_events_asof(spark, sf_dir).cache()
    try:
        total = out.count()
        assert total > 0

        nulls = out.where(F.col("threshold_c").isNull()).count()
        matched = out.where(F.col("threshold_c").isNotNull())
        assert nulls > 0, "no-predecessor NULL path never exercised"
        assert matched.count() > 0, "no event ever matched a config"

        per_type = (
            matched.groupBy("event_type")
            .agg(F.countDistinct("threshold_c").alias("n_cfg"))
            .collect()
        )
        assert per_type, "no event_type produced matches"
        assert all(r.n_cfg > 1 for r in per_type), (
            "some event_type matched a single config for every event — "
            "the mid-stream carry-forward transition is not exercised: "
            f"{[(r.event_type, r.n_cfg) for r in per_type]}"
        )
    finally:
        out.unpersist()


def test_range_join_oracle_is_non_vacuous(spark, sf_dir):
    """Every event type must have matched (event, promo) pairs, with
    real fan-out (pairs > distinct events covered overall would only
    hold with overlap; assert the weaker but sufficient n_pairs>0 and
    coverage>0 per type)."""
    rows = q_events_range_join(spark, sf_dir).collect()
    ev_types = {
        r.event_type
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .distinct()
        .collect()
    }
    got = {r.event_type: r for r in rows}
    assert set(got) == ev_types, f"unmatched event types: {ev_types - set(got)}"
    for t, r in got.items():
        assert r.n_pairs > 0 and r.n_events_covered > 0, (t, r)
