"""Arrow-backed construction of DataFrames from driver-local rows.

``spark.createDataFrame(<python list>, schema)`` plans as a Scan
ExistingRDD over pickled rows: every job over it round-trips through a
Python worker, and in this engine's hot paths (index meta tables, the
driver union-find's component labels, per-micro-batch sketch partials)
that single-task worker spin-up measures ~5 s per write against ~0.2 s
for a JVM-local plan. Routing the same rows through a pandas frame
makes the conversion an Arrow batch handed to the JVM once — the
resulting plan is JVM-local and never touches a Python worker again.

This is a LOCAL-data helper: callers hold the rows on the driver
already (bounded meta/model/label sets), so the pandas detour adds no
new driver-memory class.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(
    spark: SparkSession,
    rows: Iterable,
    schema: StructType | str,
) -> DataFrame:
    """DataFrame over driver-local ``rows`` with an Arrow-backed plan.

    ``schema`` is authoritative (DDL string or StructType) — pandas'
    inferred dtypes never leak into the result. Falls back to the
    plain list path for row shapes the Arrow conversion rejects
    (identical semantics, just the slow plan).
    """
    import pandas as pd

    struct = (
        spark.createDataFrame([], schema).schema
        if isinstance(schema, str)
        else schema
    )
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], struct)
    pdf = pd.DataFrame.from_records(rows, columns=struct.names)
    try:
        return spark.createDataFrame(pdf, schema=struct)
    except Exception:
        return spark.createDataFrame(rows, struct)


__all__ = ["local_df"]
