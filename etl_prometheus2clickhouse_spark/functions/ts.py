"""Timezone-proof epoch arithmetic over every timestamp flavor.

The engine's canonical timestamp type is ``TIMESTAMP_NTZ`` with wall
time read as UTC — the same convention DuckDB and ClickHouse use for
naive timestamps (the reference stores ``DateTime64`` wall times,
reference clickhouse_client.py:247-261). Spark's ``TIMESTAMP`` (LTZ)
type drags the *session timezone* into ``date_trunc``/casts, which
would make results depend on whoever created the SparkSession; NTZ
never does. Parquet suppliers vary — the test corpus has shipped the
events ``ts`` column as epoch-nanos BIGINT, TIMESTAMP, and
TIMESTAMP_NTZ across generations — so every entry point normalizes
via :func:`to_ntz` and every epoch extraction dispatches on dtype.

``F.unix_micros`` rejects NTZ outright in Spark 4 (the round-4
breaker); ``timestamp_diff`` against the NTZ epoch is the supported
spelling and stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def ensure_parquet_nanos_conf(spark) -> None:
    """Idempotent defensive conf-set so TIMESTAMP(NANOS) parquet reads
    surface as BIGINT nanos (``spark.sql.legacy.parquet.nanosAsLong``)
    instead of failing the scan. Needed on *externally created*
    sessions (the driver calls ``queries()`` with its own
    SparkSession); the value written is a constant, so call order
    between batch and streaming entries never matters."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf locked down - fall through and hope ts reads as-is


def _ntz_epoch() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def ntz_micros(col: Column | str) -> Column:
    """Epoch microseconds (BIGINT, exact) of a known-``timestamp_ntz``
    column/expression, wall time read as UTC. Use for expressions whose
    dtype can't be looked up on a DataFrame (window struct fields,
    freshly built NTZ expressions)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", _ntz_epoch(), c)


def ntz_from_micros(us: Column) -> Column:
    """``timestamp_ntz`` from epoch microseconds (inverse of
    :func:`ntz_micros`)."""
    return F.timestamp_add("MICROSECOND", us, _ntz_epoch())


def _dtype_of(df: DataFrame, col: str) -> str:
    try:
        field = df.schema[col]
    except KeyError:
        # nested reference like "w.start" — walk the struct
        t: object = df.schema
        for part in col.split("."):
            assert isinstance(t, StructType), f"cannot resolve dtype of {col!r}"
            t = t[part].dataType
        return t.simpleString()
    return field.dataType.simpleString()


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Epoch microseconds (BIGINT, exact — no float rounding) of any
    timestamp flavor: timestamp_ntz (wall-as-UTC), timestamp (true
    instant), epoch-nanos BIGINT, or numeric seconds."""
    t = _dtype_of(df, col)
    c = F.col(col)
    if t == "timestamp_ntz":
        return ntz_micros(c)
    if t.startswith("timestamp"):
        return F.unix_micros(c)
    if t in ("bigint", "long"):
        # integer `div`, NOT `/`: float division casts the ns epoch
        # (~1.7e18) to double, whose spacing there is 256 ns — the
        # truncated µs can come out 1 off vs an exact converter
        return F.expr(f"`{col}` div 1000")
    return (c.cast("double") * 1_000_000).cast("long")


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds as DOUBLE (µs precision) — the sub-second form
    window/rate operators difference against each other."""
    t = _dtype_of(df, col)
    if t in ("bigint", "long") or t.startswith("timestamp"):
        return epoch_micros(df, col) / 1_000_000.0
    return F.col(col).cast("double")


def to_instant(df: DataFrame, col: str) -> DataFrame:
    """Normalize ``col`` in place to ``timestamp`` (LTZ) carrying the
    same instant (NTZ wall time read as UTC). Structured Streaming
    watermarks REQUIRE the LTZ type (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    otherwise), so streaming entry points normalize with this instead
    of :func:`to_ntz`. Downstream epoch math stays TZ-proof because
    ``unix_micros`` and tumbling windows are epoch-based for LTZ — only
    wall-time ops (``date_trunc``/casts) would see the session zone,
    and the streaming operators use none."""
    t = _dtype_of(df, col)
    if t == "timestamp":
        return df
    return df.withColumn(col, F.timestamp_micros(epoch_micros(df, col)))


def to_ntz(df: DataFrame, col: str) -> DataFrame:
    """Normalize ``col`` in place to the canonical ``timestamp_ntz``
    (wall time = UTC instant). Idempotent; accepts timestamp_ntz,
    timestamp, epoch-nanos BIGINT, or numeric seconds."""
    t = _dtype_of(df, col)
    if t == "timestamp_ntz":
        return df
    return df.withColumn(col, ntz_from_micros(epoch_micros(df, col)))
