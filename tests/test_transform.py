"""Transform-core corpus tests — ported behavioral pins from the reference
test suite (see FIXTURES.md §F1; reference tests/test_etl_job.py,
tests/test_etl_job_full_coverage.py)."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.transform import (
    parse_response,
    parse_response_json,
    rows_to_sink_shape,
    series_to_rows,
)


def _doc(result):
    return json.dumps({"status": "success", "data": {"result": result}})


def _parse(spark, result):
    df = spark.createDataFrame([(_doc(result),)], ["value"])
    return parse_response(df, "value")


def _collect(batch):
    # no .orderBy here: a Spark sort runs a range-partitioning sampling
    # pass that would evaluate the observe node twice and double the
    # counters — sort driver-side instead.
    rows = sorted(batch.rows.collect(), key=lambda r: (r.timestamp, r.name))
    metrics = dict(batch.observation.get)
    return rows, metrics


SERIES = {
    "metric": {"__name__": "http_requests_total", "method": "GET", "status": "200"},
    "values": [[1700000000, "10"], [1700000300, "15"]],
}


def test_happy_path(spark):
    """Two samples → two rows; name/labels extracted
    (ref tests/test_etl_job.py:283-323,668-740)."""
    rows, m = _collect(_parse(spark, [SERIES]))
    assert m["rows_count"] == 2 and m["skipped_count"] == 0
    assert [r.value for r in rows] == [10.0, 15.0]
    assert rows[0].name == "http_requests_total"
    assert rows[0].labels == {"method": "GET", "status": "200"}
    assert rows[0].timestamp.isoformat() == "2023-11-14T22:13:20"


def test_value_corpus(spark):
    """The six-variant corpus: numeric string, NaN, Inf, -Inf, invalid,
    raw number → 5 rows + 1 skip
    (ref tests/test_etl_job_full_coverage.py:21-62)."""
    series = {
        "metric": {"__name__": "m"},
        "values": [
            [1600000000, "1"],
            [1600000060, "NaN"],
            [1600000120, "Inf"],
            [1600000180, "-Inf"],
            [1600000240, "invalid"],
            [1600000300, 123.456],
        ],
    }
    rows, m = _collect(_parse(spark, [series]))
    assert m["rows_count"] == 5 and m["skipped_count"] == 1
    vals = [r.value for r in rows]
    assert vals[0] == 1.0
    assert math.isnan(vals[1])
    assert vals[2] == float("inf") and vals[3] == float("-inf")
    assert vals[4] == 123.456


def test_sci_notation_strings(spark):
    """1e-10 / 1e15 strings parse (ref tests/test_etl_job.py:1053-1098)."""
    series = {
        "metric": {"__name__": "m"},
        "values": [[1600000000, "1e-10"], [1600000060, "1e15"]],
    }
    rows, m = _collect(_parse(spark, [series]))
    assert m["rows_count"] == 2 and m["skipped_count"] == 0
    assert [r.value for r in rows] == [1e-10, 1e15]


def test_short_and_empty_pairs_dropped_uncounted(spark):
    """[ts] and [] pairs → no row, no skip
    (ref tests/test_etl_job.py:917-918,1829-1872)."""
    series = {
        "metric": {"__name__": "m"},
        "values": [[1700000300], [], [1700000000, "1"]],
    }
    rows, m = _collect(_parse(spark, [series]))
    assert m["rows_count"] == 1 and m["skipped_count"] == 0


def test_null_value_element_dropped_uncounted(spark):
    """[ts, null] → no row, skipped==0
    (ref tests/test_etl_job_full_coverage.py:101-118)."""
    series = {"metric": {"__name__": "m"}, "values": [[1700000000, None]]}
    rows, m = _collect(_parse(spark, [series]))
    assert m["rows_count"] == 0 and m["skipped_count"] == 0


def test_scalar_values_items_ignored(spark):
    """values: [ts, "42"] as scalars (not pairs) → 0 rows, no error
    (ref tests/test_etl_job_full_coverage.py:121-140)."""
    series = {"metric": {"__name__": "m"}, "values": [1600000000, "42"]}
    rows, m = _collect(_parse(spark, [series]))
    assert m["rows_count"] == 0


def test_missing_name_defaults_empty(spark):
    """No __name__ → name == "" (ref etl_job.py:613)."""
    series = {"metric": {"job": "x"}, "values": [[1700000000, "1"]]}
    rows, _ = _collect(_parse(spark, [series]))
    assert rows[0].name == "" and rows[0].labels == {"job": "x"}


def test_label_sorting(spark):
    """Label arrays sorted by key (ref etl_job.py:618-620;
    tests/test_etl_job.py:1666-1721)."""
    series = {
        "metric": {"__name__": "m", "zeta": "1", "alpha": "2", "mid": "3"},
        "values": [[1700000000, "1"]],
    }
    batch = _parse(spark, [series])
    sink = rows_to_sink_shape(batch.rows).collect()[0]
    assert sink.labels_key == ["alpha", "mid", "zeta"]
    assert sink.labels_value == ["2", "3", "1"]


def test_subsecond_timestamp_precision(spark):
    """Float timestamps keep microsecond precision
    (ref tests/test_etl_job.py:941-988)."""
    series = {
        "metric": {"__name__": "m"},
        "values": [[1700000000.123, "1"], [1700000000.789456, "2"]],
    }
    rows, _ = _collect(_parse(spark, [series]))
    assert rows[0].timestamp.microsecond == 123000
    assert rows[1].timestamp.microsecond == 789456


def test_multiple_series_and_series_count(spark):
    s2 = {"metric": {"__name__": "up"}, "values": [[1700000000, "1"]]}
    batch = _parse(spark, [SERIES, s2])
    rows, m = _collect(batch)
    assert m["rows_count"] == 3
    assert dict(batch.series_observation.get)["series_count"] == 2


def test_empty_result_zero_rows(spark):
    rows, m = _collect(_parse(spark, []))
    assert rows == [] and m["rows_count"] == 0


def test_invalid_string_resets_pair_state_machine(spark):
    """Exact state-machine parity: an unparseable string clears the pair
    accumulator; elements after it rebuild (ref etl_job.py:684-717)."""
    series = {
        "metric": {"__name__": "m"},
        # [bad, ts, val]: bad clears (skip+1), then [ts,val] survive → row
        "values": [["bad", 1700000000, 5]],
    }
    rows, m = _collect(_parse(spark, [series]))
    assert m["rows_count"] == 1 and m["skipped_count"] == 1
    assert rows[0].value == 5.0

    # 3 valid elements → silently dropped, no skip
    series3 = {"metric": {"__name__": "m"}, "values": [[1700000000, 1, 2]]}
    rows, m = _collect(_parse(spark, [series3]))
    assert m["rows_count"] == 0 and m["skipped_count"] == 0


def test_double_bad_strings_count_twice(spark):
    series = {"metric": {"__name__": "m"}, "values": [["oops", "nope"]]}
    rows, m = _collect(_parse(spark, [series]))
    assert m["rows_count"] == 0 and m["skipped_count"] == 2


def test_malformed_document_yields_no_series(spark):
    df = spark.createDataFrame([("this is not json",), ("{}",)], ["value"])
    assert parse_response_json(df).count() == 0


def test_sink_shape_content_hash_stable(spark):
    batch1 = _parse(spark, [SERIES])
    batch2 = _parse(spark, [SERIES])
    ids1 = [r.id for r in rows_to_sink_shape(batch1.rows).collect()]
    ids2 = [r.id for r in rows_to_sink_shape(batch2.rows).collect()]
    assert sorted(ids1) == sorted(ids2)
    assert len(set(ids1)) == 2  # distinct samples → distinct ids
