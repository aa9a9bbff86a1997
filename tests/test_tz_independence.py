"""Session-timezone independence of the temporal catalog entries.

The engine's contract (functions/ts.py): results never depend on the
session timezone of whoever created the SparkSession — the driver's
verification session is not ours and need not be UTC. Round 6 caught
`events_range_join` violating this: `F.date_trunc` is typed for LTZ,
so its NTZ input was implicitly cast through the session zone and the
promo anchors (hence the matched pairs) moved with the zone, with a
DST-mix making the shift non-uniform. This module pins the class of
bug: every timestamp-touching batch entry must produce identical
values under UTC and a DST-observing non-UTC session timezone.
"""

from __future__ import annotations

from collections import Counter

import pytest

from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.plans.catalog import (
    ALL_QUERIES as QUERIES,
)

# Batch entries whose plans touch the ts column (streaming faces are
# covered by their own oracle runs; they are epoch-based end to end
# but too slow to run twice here).
TEMPORAL = [
    "events_hourly",
    "events_rate",
    "user_sessions",
    "events_session_window",
    "events_moving_avg",
    "events_multires",
    "events_asof",
    "events_range_join",
    "prom_parse",
    "tsv_lines",
]


def _rows(spark, sf_dir, name):
    with cached_scope():
        return Counter(
            tuple(str(v) for v in r) for r in QUERIES[name](spark, sf_dir).collect()
        )


@pytest.mark.parametrize("name", TEMPORAL)
def test_result_is_session_tz_independent(spark, sf_dir, name):
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = _rows(spark, sf_dir, name)
        # DST-observing zone with a half-year offset mix (-4/-5): any
        # implicit NTZ->LTZ coercion shifts values non-uniformly
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert utc == ny
