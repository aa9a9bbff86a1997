"""Explicit Spark schemas for every data shape in the engine.

The reference has no schema objects — the input shape is implicit in its
hand-written ijson parser (reference: etl_job.py:545-738) and the output
shapes are ClickHouse DDL (reference: README.md:119-178,
docker-compose.yml:156-200). Here everything is a StructType so Catalyst
can prune/pushdown and `from_json` never infers.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Prometheus query_range response (input).
#
# {"status": "success",
#  "data": {"resultType": "matrix",
#           "result": [{"metric": {"__name__": "up", ...},
#                       "values": [[1700000000.123, "1"], ...]}]}}
#
# `values` pairs mix JSON numbers (timestamps) and strings (values); Spark's
# Jackson parser reads any scalar into a STRING field preserving the literal
# text, so ARRAY<ARRAY<STRING>> captures both losslessly (SURVEY.md §1.3).
# ---------------------------------------------------------------------------

PROM_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "values", T.ArrayType(T.ArrayType(T.StringType(), True), True), True
        ),
    ]
)

PROM_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType(), True),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("resultType", T.StringType(), True),
                    T.StructField("result", T.ArrayType(PROM_SERIES_SCHEMA, True), True),
                ]
            ),
            True,
        ),
    ]
)

# ---------------------------------------------------------------------------
# Metrics fact table (output).
#
# Reference DDL (README.md:119-143): timestamp DateTime64(6,'UTC'),
# name String, labels Nested(key String, value String), value Float64,
# id UInt64 MATERIALIZED cityHash64(...). Internally we keep labels as a
# MAP and split into key-sorted parallel arrays only at the sink boundary
# (SURVEY.md §1.3). TimestampType is microsecond-precision, matching
# DateTime64(6).
# ---------------------------------------------------------------------------

METRIC_ROW_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

# Sink-side shape with parallel key-sorted arrays (reference
# etl_job.py:617-624) plus the content-hash identity column (xxhash64 here;
# cityHash64 in the reference — identity semantics match, bit values don't;
# SURVEY.md §1.2).
METRIC_SINK_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("labels_key", T.ArrayType(T.StringType(), False), False),
        T.StructField("labels_value", T.ArrayType(T.StringType(), False), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("id", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# ETL state table (watermark + lease + batch stats).
#
# Reference DDL (README.md:162-178): second-resolution DateTimes; NULLs are
# semantically distinct from 0 (etl_job.py:188-199). Epoch-seconds LongTypes
# keep the state store backend-agnostic (SURVEY.md §1.2 row 2).
# ---------------------------------------------------------------------------

ETL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp_start", T.LongType(), False),
        T.StructField("timestamp_end", T.LongType(), True),
        T.StructField("timestamp_progress", T.LongType(), True),
        T.StructField("batch_window_seconds", T.LongType(), True),
        T.StructField("batch_rows", T.LongType(), True),
        T.StructField("batch_skipped_count", T.LongType(), True),
        # version: monotonically increasing insert sequence standing in for
        # ReplacingMergeTree's insert-order versioning (README.md:162-178);
        # read side takes row_number()=1 per timestamp_start.
        T.StructField("version", T.LongType(), False),
    ]
)

# DDL strings for spark.createDataFrame(..., schema=...) convenience
METRIC_ROW_DDL = "timestamp timestamp, name string, labels map<string,string>, value double"
