"""Local parquet fact-table sink.

Mirrors the reference's storage layout decisions (README.md:119-157) in
lake form: daily partitioning (``dt`` ⇔ ClickHouse
``PARTITION BY toYYYYMMDD(timestamp)``) and a content-hash ``id`` column
for storage-side dedup. On a cluster this is the same code against
S3/HDFS; daily partitions keep partition pruning effective for
time-range queries at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.transform import rows_to_sink_shape


class ParquetSink:
    """Append-mode partitioned writer; one action per ``write`` call."""

    def __init__(self, path: str, dedup_within_batch: bool = False) -> None:
        self._path = path
        self._dedup = dedup_within_batch

    def write(self, rows: DataFrame) -> None:
        out = rows_to_sink_shape(rows)
        if self._dedup:
            # Within-batch exact dedup on the content hash — the lake-side
            # stand-in for ReplacingMergeTree collapse (README.md:96-113).
            # NaN values hash stably, so NaN rows dedup like the
            # reference's bitwise cityHash64 identity.
            out = out.dropDuplicates(["id"])
        (
            out.withColumn("dt", F.to_date("timestamp"))
            .write.mode("append")
            .partitionBy("dt")
            .parquet(self._path)
        )


class NullSink:
    """Consumes rows with one action and discards them (bench/tests)."""

    def write(self, rows: DataFrame) -> None:
        rows.write.format("noop").mode("overwrite").save()
