"""Prometheus query_range response → metrics fact rows.

The reference does this with a single-threaded ijson event pump and a
per-series state machine (etl_job.py:545-738). Here the same semantics are
a declarative Catalyst plan:

    json doc → from_json(explicit schema) → explode(data.result)
             → explode(values) → pair state machine (higher-order fns)
             → lenient cast + label restructure → fact rows

Bounded memory comes from partitioned execution instead of event
streaming; the per-series invariant hoisting the reference hand-codes
(etl_job.py:616-624) falls out of Catalyst subexpression elimination.

Exact-parity notes (corpus: FIXTURES.md §F1):

- pair handling replicates the reference's "append parsed element /
  clear pair on unparseable string" machine (etl_job.py:642-737) with
  ``F.aggregate``: a row is emitted iff exactly 2 elements survive;
- ``skipped`` counts unparseable *strings* only — after from_json maps
  every scalar to its literal text, those are exactly the non-null
  elements whose lenient parse fails (raw JSON numbers always parse);
- JSON ``null`` elements are ignored entirely: dropped rowlessly, not
  counted (tests/test_etl_job_full_coverage.py:101-118);
- known divergence (JVM json path only): a *numeric* label value, e.g.
  ``{"code": 200}``, is kept as the string ``"200"`` whereas the
  reference drops non-string labels (tests/test_etl_job_full_coverage.py:81-98).
  The Python DataSource path (sources/prometheus.py) applies the exact
  drop rule while it still sees JSON types.
- known divergence (JVM json path only): after from_json a JSON boolean
  and the JSON *string* ``"true"``/``"false"`` are indistinguishable;
  both are treated as the reference treats booleans (ignored by the pair
  machine, not counted), whereas the reference counts the string form as
  skipped. The Python DataSource path distinguishes them exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.functions import (
    content_hash,
    label_keys_sorted,
    label_values_sorted,
    labels_without_name,
    lenient_double,
    metric_name,
)
from etl_prometheus2clickhouse_spark.schemas import PROM_RESPONSE_SCHEMA

_EMPTY_STR_ARRAY = "CAST(array() AS array<string>)"


def parse_response_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Raw JSON documents → one row per series ``(metric, values)``.

    Uses the explicit response schema (no inference); malformed documents
    yield null ``data`` and hence zero series, matching the reference's
    ignore-unknown-structure behavior (etl_job.py:590-737).
    """
    parsed = df.select(
        F.from_json(F.col(json_col), PROM_RESPONSE_SCHEMA).alias("resp")
    )
    return parsed.select(
        F.explode_outer("resp.data.result").alias("series")
    ).select(
        F.col("series.metric").alias("metric"),
        F.col("series.values").alias("values"),
    ).where(F.col("metric").isNotNull() | F.col("values").isNotNull())


def _surviving_pair(pair: Column) -> Column:
    """Replay the reference's pair state machine on one ``array<string>``.

    Elements are processed in order: JSON nulls are ignored (never
    appended), a parseable element is appended, an unparseable string
    clears the accumulator (etl_job.py:684-717). The surviving elements
    are returned; callers emit a row iff exactly 2 survive
    (etl_job.py:719-736 — this also drops 1-element and 3+-element pairs
    silently, matching tests/test_etl_job.py:1829-1872).
    """
    surviving = F.filter(pair, _participates)
    return F.aggregate(
        surviving,
        F.expr(_EMPTY_STR_ARRAY),
        lambda acc, e: F.when(
            lenient_double(e).isNull(), F.expr(_EMPTY_STR_ARRAY)
        ).otherwise(F.array_append(acc, e)),
    )


def _participates(e: Column) -> Column:
    """JSON nulls AND booleans never reach the pair state machine: the
    reference's ijson pump has no handler for boolean events
    (etl_job.py:642-717), so ``true``/``false`` neither append nor clear
    the pair. After from_json both render as the strings "true"/"false" —
    filtered here (see the known-divergence note in the module docstring
    for the string-typed "true" corner)."""
    return e.isNotNull() & ~F.lower(e).isin("true", "false")


def _skipped_in_pair(pair: Column) -> Column:
    """Unparseable-string count for one pair (etl_job.py:684-717)."""
    return F.size(
        F.filter(pair, lambda e: _participates(e) & lenient_double(e).isNull())
    )


@dataclass
class ParsedBatch:
    """Fact rows plus single-pass counters.

    ``observation`` yields ``{"rows_count", "skipped_count"}`` after the
    first action on ``rows`` — the Spark equivalent of the reference's
    incremental counters (etl_job.py:568-570,716,732) with no second scan.
    ``series_observation`` yields ``{"series_count"}``.
    """

    rows: DataFrame
    observation: Observation
    series_observation: Observation


def _pair_stage(series_df: DataFrame) -> DataFrame:
    """Shared explode + pair-machine stage (pre-filter, pre-observe)."""
    exploded = series_df.select(
        metric_name("metric").alias("name"),
        labels_without_name("metric").alias("labels"),
        F.explode_outer("values").alias("pair"),
    )
    return exploded.select(
        "name",
        "labels",
        _surviving_pair(F.col("pair")).alias("kept"),
        F.coalesce(_skipped_in_pair(F.col("pair")), F.lit(0)).alias("pair_skipped"),
    )


def _kept_to_rows(staged: DataFrame) -> DataFrame:
    return staged.where(F.size("kept") == 2).select(
        F.timestamp_seconds(lenient_double(F.col("kept")[0])).alias("timestamp"),
        "name",
        "labels",
        lenient_double(F.col("kept")[1]).alias("value"),
    )


def series_to_rows(series_df: DataFrame) -> ParsedBatch:
    """Series rows → fact rows ``(timestamp, name, labels, value)``.

    One explode over ``values``; every per-pair expression is a
    higher-order array function, so the whole stage is JVM codegen with
    zero Python in the hot path.
    """
    series_obs = Observation()
    with_series = series_df.observe(
        series_obs, F.count(F.lit(1)).alias("series_count")
    )
    staged = _pair_stage(with_series)

    obs = Observation()
    observed = staged.observe(
        obs,
        F.coalesce(
            F.sum(F.when(F.size("kept") == 2, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("rows_count"),
        F.coalesce(F.sum("pair_skipped"), F.lit(0)).alias("skipped_count"),
    )
    return ParsedBatch(
        rows=_kept_to_rows(observed),
        observation=obs,
        series_observation=series_obs,
    )


def series_to_rows_plan(series_df: DataFrame) -> DataFrame:
    """Observation-free variant of :func:`series_to_rows` — same fact
    rows, no counters. Required when the transform must live INSIDE a
    streaming plan (upstream of stateful operators like
    ``dropDuplicatesWithinWatermark``): ``Observation`` objects are
    batch-only, and streaming metrics flow through query progress
    instead."""
    return _kept_to_rows(_pair_stage(series_df))


def parse_response(df: DataFrame, json_col: str = "value") -> ParsedBatch:
    """Full pipeline: raw JSON documents → fact rows + counters."""
    return series_to_rows(parse_response_json(df, json_col))


def rows_to_sink_shape(rows: DataFrame) -> DataFrame:
    """Fact rows → sink shape with key-sorted parallel label arrays and
    the content-hash id (reference etl_job.py:617-624, README.md:119-143).
    """
    return rows.select(
        "timestamp",
        "name",
        label_keys_sorted("labels").alias("labels_key"),
        label_values_sorted("labels").alias("labels_value"),
        "value",
        content_hash().alias("id"),
    )
