"""Column-expression recipes (all JVM-side unless noted).

Re-exports the engine's scalar-function surface:

- :func:`lenient_double` — Python ``float()``-equivalent parse
  (reference etl_job.py:664-717).
- :func:`metric_name`, :func:`labels_without_name`,
  :func:`sorted_label_entries`, :func:`label_keys_sorted`,
  :func:`label_values_sorted` — label-map restructuring
  (reference etl_job.py:611-625).
- :func:`escape_tsv`, :func:`format_clickhouse_array` — TSV wire
  escaping (reference etl_job.py:762-808).
- :func:`format_float_no_sci_py`, :func:`format_float_udf` — float
  serialization without scientific notation (reference
  etl_job.py:810-844).
- :func:`content_hash` — row-identity hash for storage-side dedup
  (reference README.md:120-126; xxhash64 here vs cityHash64 there).
"""

from etl_prometheus2clickhouse_spark.functions.casts import (
    PY_FLOAT_REGEX,
    lenient_double,
)
from etl_prometheus2clickhouse_spark.functions.labels import (
    content_hash,
    label_keys_sorted,
    label_values_sorted,
    labels_without_name,
    metric_name,
    sorted_label_entries,
)
from etl_prometheus2clickhouse_spark.functions.tsv import (
    escape_tsv,
    format_clickhouse_array,
    format_float_no_sci_py,
    format_float_udf,
    format_timestamp_6f,
)

__all__ = [
    "PY_FLOAT_REGEX",
    "lenient_double",
    "metric_name",
    "labels_without_name",
    "sorted_label_entries",
    "label_keys_sorted",
    "label_values_sorted",
    "content_hash",
    "escape_tsv",
    "format_clickhouse_array",
    "format_float_no_sci_py",
    "format_float_udf",
    "format_timestamp_6f",
]
