"""Property test: ``lenient_double`` is Python ``float()`` over ASCII
digits with the FULL float() whitespace set (functions/casts.py;
reference parser etl_job.py:664-717, corpus seeded from reference
tests/test_etl_job.py:1449-1827).

Scope note: CPython's float() additionally accepts unicode *digits*,
which the JVM expression recipe deliberately does not — see the
casts.py docstring. Unicode whitespace IS at parity (the
Py_UNICODE_ISSPACE trim class), so the alphabet includes it."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.functions import lenient_double

_ASCII = st.text(
    alphabet=st.sampled_from(
        list("0123456789+-._eExXpPfFaAnNiItTyY \t\n\r")
        # float()'s full whitespace set (must trim) plus lookalikes
        # that are NOT whitespace (must reject when adjacent to digits)
        + ["\x0b", "\x1c", "\x1f", "\x85", "\xa0", " ", " ",
           " ", " ", " ", " ", "　",
           "​", "⁠"]  # zero-width: not float() whitespace
    ),
    max_size=12,
)
_NUMERIC_ISH = st.from_regex(
    r"[+-]?[0-9_]{0,6}\.?[0-9_]{0,6}([eE][+-]?[0-9]{0,4})?", fullmatch=True
)
_KNOWN_EDGE = st.sampled_from(
    [
        "nan", "NaN", "+nan", "-nan", "inf", "Inf", "+inf", "-inf",
        "Infinity", "-Infinity", "infinity",
        "1_000", "1__0", "_1", "1_", "1_000.5_2",
        "0x1p3", "0xFF", "1.5f", "1.5d", "1e400", "1e-400",
        "9" * 30, "." , "+", "-", "e", "E", "1e", "e1", "+-1", "--1",
        " 1 ", "\t2\n", "5.", ".5", "+.5", "-.", "1.2.3",
    ]
)
_FLOATS = st.floats(allow_nan=True, allow_infinity=True).map(repr)

_VALUE = st.one_of(_ASCII, _NUMERIC_ISH, _KNOWN_EDGE, _FLOATS)


def _py_float(s: str) -> float | None:
    try:
        return float(s)
    except (ValueError, OverflowError):
        return None


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_VALUE, min_size=1, max_size=80))
def test_lenient_double_matches_python_float(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = df.select("s", lenient_double(F.col("s")).alias("v")).collect()
    # one input string may appear multiple times; verify each row
    for row in got:
        expect = _py_float(row.s)
        if expect is None:
            assert row.v is None, f"{row.s!r}: spark={row.v} expected reject"
        elif math.isnan(expect):
            assert row.v is not None and math.isnan(row.v), f"{row.s!r}"
        else:
            assert row.v == expect, f"{row.s!r}: spark={row.v!r} py={expect!r}"
