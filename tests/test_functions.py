"""Golden tests for the scalar-function layer — escaping, float format,
lenient cast — pinned to the reference's exact expected strings
(FIXTURES.md §F2; reference tests/test_etl_job_extra.py:10-21,
tests/test_etl_job.py:991-1098)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.functions import (
    escape_tsv,
    format_clickhouse_array,
    format_float_no_sci_py,
    format_float_udf,
    format_timestamp_6f,
    lenient_double,
)


def _eval_str(spark, col, data, schema):
    df = spark.createDataFrame(data, schema)
    return [r.out for r in df.select(col.alias("out")).collect()]


# ---------------------------------------------------------------------------
# lenient cast — Python float() equivalence
# ---------------------------------------------------------------------------

FLOAT_CASES = [
    "1", "10", "123.456", "1e-10", "1e15", "-2.5", "+3", ".5", "5.",
    "NaN", "nan", "Inf", "inf", "+Inf", "-Inf", "Infinity", "-Infinity",
    "  42  ", "1_000.5", "1_0e1_0",
    # must NOT parse (Python float() raises on all of these)
    "invalid", "", " ", "0x1p3", "0x10", "1.5f", "1.5d", "_1", "1_", "1__0",
    "1,5", "nan2", "--1", "photo1e5",
]


def test_lenient_double_matches_python_float(spark):
    data = [(s,) for s in FLOAT_CASES]
    got = _eval_str(spark, lenient_double(F.col("s")), data, ["s"])
    for s, g in zip(FLOAT_CASES, got):
        try:
            expected = float(s)
        except ValueError:
            expected = None
        if expected is None:
            assert g is None, f"{s!r}: expected unparseable, got {g}"
        elif math.isnan(expected):
            assert g is not None and math.isnan(g), f"{s!r}: expected NaN, got {g}"
        else:
            assert g == expected, f"{s!r}: expected {expected}, got {g}"


# ---------------------------------------------------------------------------
# TSV escaping goldens (ref tests/test_etl_job_extra.py:10-21)
# ---------------------------------------------------------------------------

def test_escape_tsv_golden(spark):
    got = _eval_str(
        spark, escape_tsv(F.col("s")), [("back\\slash\tnewline\nend",)], ["s"]
    )
    assert got == ["back\\\\slash\\tnewline\\nend"]


def test_format_clickhouse_array_golden(spark):
    df = spark.createDataFrame(
        [(["a'b", "c\\d", "e\tf", "g\nh"],), ([],)], "arr: array<string>"
    )
    got = [r.out for r in df.select(format_clickhouse_array("arr").alias("out")).collect()]
    assert got[0] == "['a\\'b','c\\\\d','e\\tf','g\\nh']"
    assert got[1] == "[]"


# ---------------------------------------------------------------------------
# float formatting goldens (ref tests/test_etl_job.py:991-1050,
# tests/test_etl_job_full_coverage.py:10-18)
# ---------------------------------------------------------------------------

FLOAT_FORMAT_GOLDENS = [
    (123.456, "123.456"),
    (0.0, "0"),
    (42.0, "42"),
    (1234.5678, "1234.5678"),
    (float("nan"), "nan"),
    (float("inf"), "inf"),
    (float("-inf"), "-inf"),
]


def test_format_float_py_goldens():
    for v, want in FLOAT_FORMAT_GOLDENS:
        assert format_float_no_sci_py(v) == want
    # no scientific notation ever (ref tests/test_etl_job.py:1053-1098)
    for v in (1e-20, 1e20, 1e-25, 1e15, 123456789012345678.0):
        out = format_float_no_sci_py(v)
        assert "e" not in out.lower(), (v, out)


def test_format_float_udf_matches_python(spark):
    vals = [v for v, _ in FLOAT_FORMAT_GOLDENS] + [1e-20, 1e20, 1.5e-7]
    df = spark.createDataFrame([(v,) for v in vals], "v: double")
    got = [r.out for r in df.select(format_float_udf("v").alias("out")).collect()]
    assert got == [format_float_no_sci_py(v) for v in vals]


# ---------------------------------------------------------------------------
# timestamp %.6f formatting (ref etl_job.py:729; precision test
# tests/test_etl_job.py:941-988)
# ---------------------------------------------------------------------------

def test_format_timestamp_6f(spark):
    df = spark.createDataFrame(
        [(1700000000.123,), (1700000000.789456,), (1600000000.0,)], "ts: double"
    )
    out = [
        r.out
        for r in df.select(
            format_timestamp_6f(F.timestamp_seconds("ts")).alias("out")
        ).collect()
    ]
    assert out == ["1700000000.123000", "1700000000.789456", "1600000000.000000"]
