"""Relational state-table queries as DataFrame plans (SURVEY.md §2 S2/A2/K2).

The reference issues five small SQL queries against ClickHouse for state
management (clickhouse_client.py:219-694). Re-expressed here as declarative
DataFrame transforms over *any* state DataFrame, so they run identically on
the local store, a JDBC read, or the test oracle:

- :func:`replacing_merge_latest` — ReplacingMergeTree ``FINAL`` semantics
  (latest version per key; reference README.md:162-178).
- :func:`latest_valid_state`    — the S2 top-1 state scan
  (clickhouse_client.py:247-261): filter valid rows, sort desc, limit 1.
- :func:`open_leases` / :func:`has_running_job_df` — the A2 lease scan
  (clickhouse_client.py:479-484,582-594).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def replacing_merge_latest(
    df: DataFrame, key: str = "timestamp_start", version: str = "version"
) -> DataFrame:
    """Collapse to the newest version per key — the engine's equivalent of
    reading a ReplacingMergeTree with ``FINAL``.

    A window + ``row_number`` shuffles only the (tiny) state table; on a
    real cluster the state table is KBs, so this never matters at scale.
    """
    w = Window.partitionBy(key).orderBy(F.col(version).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_valid_state(df: DataFrame) -> DataFrame:
    """Top-1 valid state row (reference clickhouse_client.py:247-261):

    ``WHERE timestamp_progress IS NOT NULL AND timestamp_end IS NOT NULL
    AND timestamp_end > timestamp_start ORDER BY timestamp_start DESC
    LIMIT 1`` over the merged (FINAL) view.
    """
    return (
        replacing_merge_latest(df)
        .where(
            F.col("timestamp_progress").isNotNull()
            & F.col("timestamp_end").isNotNull()
            & (F.col("timestamp_end") > F.col("timestamp_start"))
        )
        .orderBy(F.col("timestamp_start").desc())
        .limit(1)
    )


def open_leases(df: DataFrame, use_final: bool = True) -> DataFrame:
    """Distinct start timestamps of open leases
    (``timestamp_end IS NULL`` — reference clickhouse_client.py:582-594).
    """
    base = replacing_merge_latest(df) if use_final else df
    return (
        base.where(F.col("timestamp_end").isNull())
        .select("timestamp_start")
        .distinct()
    )


def has_running_job_df(df: DataFrame) -> bool:
    """``COUNT(*) > 0`` over open leases
    (reference clickhouse_client.py:440-534)."""
    return open_leases(df).limit(1).count() > 0
