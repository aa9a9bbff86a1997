"""ClickHouse TabSeparated wire-format parity (reference: etl_job.py:726-844).

These exist only for the TSV/HTTP sink and for golden-parity tests
(reference goldens: tests/test_etl_job_extra.py:10-21,
tests/test_etl_job.py:991-1098). The analytic hot path never serializes —
rows stay columnar until the sink boundary (SURVEY.md §2 T6/T7).

Escaping and timestamp formatting are pure built-in expressions. The
no-scientific-notation float format replicates CPython's ``%.15g`` /
``%.15f``-fallback exactly, which Java's Formatter cannot (Java ``%g``
keeps trailing zeros), so that one function is a vectorized Pandas UDF —
acceptable because it runs only in the wire-parity sink.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def escape_tsv(col: Column | str) -> Column:
    """``\\`` → ``\\\\``, TAB → ``\\t``, NL → ``\\n`` — in that order so
    escapes are never double-escaped (reference etl_job.py:762-780)."""
    c = _c(col)
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return c


def format_clickhouse_array(arr: Column | str) -> Column:
    """``['a','b']`` literal with per-element escaping (basic TSV chars
    plus ``'`` → ``\\'``); empty array → ``[]``
    (reference etl_job.py:782-808)."""
    elems = F.transform(
        _c(arr),
        lambda e: F.concat(
            F.lit("'"),
            F.replace(escape_tsv(e), F.lit("'"), F.lit("\\'")),
            F.lit("'"),
        ),
    )
    return F.concat(F.lit("["), F.array_join(elems, ","), F.lit("]"))


def format_timestamp_6f(ts: Column | str) -> Column:
    """Microsecond-precision epoch string ``"<sec>.<6-digit-frac>"``
    matching the reference's ``f"{ts:.6f}"`` (etl_job.py:729).

    Built from ``unix_micros`` integer arithmetic — no float rounding, so
    DateTime64(6) precision survives bit-exactly
    (reference test: tests/test_etl_job.py:941-988).
    """
    us = F.unix_micros(_c(ts))
    sec = F.floor(us / 1_000_000).cast("long")
    frac = (us - sec * 1_000_000).cast("long")
    return F.concat(
        sec.cast("string"), F.lit("."), F.lpad(frac.cast("string"), 6, "0")
    )


def format_float_no_sci_py(value: float) -> str:
    """CPython-exact no-sci-notation float format
    (reference etl_job.py:810-844): specials as ``nan``/``inf``/``-inf``;
    ``%.15g``; on scientific output fall back to ``%.15f`` with trailing
    zeros and dangling point stripped."""
    if math.isnan(value):
        return "nan"
    if math.isinf(value):
        return "inf" if value > 0 else "-inf"
    formatted = f"{value:.15g}"
    if "e" in formatted.lower():
        formatted = f"{value:.15f}".rstrip("0").rstrip(".")
    return formatted


@F.pandas_udf(T.StringType())
def format_float_udf(values: pd.Series) -> pd.Series:
    """Arrow-vectorized wrapper of :func:`format_float_no_sci_py` for the
    TSV sink (the only non-JVM expression in the engine's sink path)."""
    return values.map(format_float_no_sci_py)
