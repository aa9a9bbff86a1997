"""Label-map restructuring (reference: etl_job.py:611-625).

From each series' ``metric`` map the reference derives:
``name = metric["__name__"]`` (default ``""``), ``labels = metric`` minus
``__name__``, entries **sorted by key**, split into parallel key/value
arrays. All of it maps to built-in map/array higher-order functions —
JVM-side, codegen'd, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def metric_name(metric: Column | str) -> Column:
    """``metric['__name__']`` with ``""`` default (etl_job.py:613)."""
    return F.coalesce(F.element_at(_c(metric), "__name__"), F.lit(""))


def labels_without_name(metric: Column | str) -> Column:
    """The metric map minus the ``__name__`` entry (etl_job.py:614-615)."""
    return F.map_filter(_c(metric), lambda k, v: k != "__name__")


def sorted_label_entries(labels: Column | str) -> Column:
    """``array<struct<key,value>>`` sorted ascending by key
    (etl_job.py:618-620; array_sort on structs orders by first field)."""
    return F.array_sort(F.map_entries(_c(labels)))


def label_keys_sorted(labels: Column | str) -> Column:
    """Key-sorted parallel key array (etl_job.py:621)."""
    return F.transform(sorted_label_entries(labels), lambda e: e["key"])


def label_values_sorted(labels: Column | str) -> Column:
    """Key-sorted parallel value array (etl_job.py:622)."""
    return F.transform(sorted_label_entries(labels), lambda e: e["value"])


def content_hash(
    timestamp: Column | str = "timestamp",
    name: Column | str = "name",
    labels: Column | str = "labels",
    value: Column | str = "value",
) -> Column:
    """64-bit content identity over all fact columns.

    Mirrors the reference's MATERIALIZED ``id = cityHash64(timestamp, name,
    labels.key, labels.value, value)`` (README.md:120-126) with
    ``xxhash64`` — identity semantics match (same content ⇒ same id within
    one engine), bit values differ; the hash never leaves storage. The
    key-sorted entry array makes the hash label-order-independent, like the
    reference's pre-sorted arrays.
    """
    return F.xxhash64(
        _c(timestamp),
        _c(name),
        F.to_json(sorted_label_entries(labels)),
        _c(value),
    )
