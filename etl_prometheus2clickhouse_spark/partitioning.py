"""Scan-parallelism guard for CPU-dense operators.

A parquet scan's task count is its split count: one small file with a
single row group scans as ONE task, and every CPU-heavy narrow stage
built on it (tokenize, shingle, hash, JSON parse, codec encode/decode,
Python batch UDFs) runs serially while the rest of the cluster idles —
the "input skew: one huge unsplittable file" case of the optimization
guide (§2.5), which says to repartition immediately after the read.

:func:`spread` does that CONDITIONALLY: only when the frame is a
narrow (scan-rooted) plan with fewer partitions than the session's
default parallelism. At real scale a corpus scan has hundreds of
splits and the guard is a no-op — no exchange is added, no bytes move.
When it does fire, the exchange moves only the slim pre-explode rows
(ids + raw text/blob source columns), never derived work — callers
apply it BEFORE the expensive per-row stage, which is exactly the
cheap place to pay a shuffle.

Frames whose plan already contains a shuffle-introducing operator
(join, aggregate, window, distinct, repartition, set ops, global sort)
are returned unchanged, for two reasons: their parallelism is already
governed by the shuffle-partition settings, and inspecting their
partition count via ``df.rdd`` would force AQE to materialize query
stages eagerly (running real jobs) just to answer the question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# logical-plan node prefixes that imply a shuffle (or an already-
# parallel exchange) somewhere in the frame's lineage
_WIDE_PREFIXES = (
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Distinct",
    "Deduplicate",
    "Repartition",
    "RepartitionByExpression",
    "Intersect",
    "Except",
    "GlobalLimit",
    "CoGroup",
    "FlatMapGroups",
)


def _is_narrow(df: DataFrame) -> bool:
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    for line in plan.splitlines():
        node = line.lstrip("+-: ")
        if node.startswith(_WIDE_PREFIXES):
            return False
    return True


def spread(df: DataFrame) -> DataFrame:
    """Ensure a narrow, scan-rooted ``df`` has at least the session's
    default parallelism of partitions before CPU-heavy per-row work;
    no-op when it already does (the at-scale case) or when the plan is
    not narrow (already governed by shuffle parallelism)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if target <= 1 or not _is_narrow(df):
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df if n >= target else df.repartition(target)
