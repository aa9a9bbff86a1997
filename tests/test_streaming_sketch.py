"""Streaming sketch partials (streaming/sketch_stream.py): one partial
per REAL micro-batch, merged exactly — streamed-and-merged must equal
the one-shot sketch over everything streamed."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.sketch import (
    bloom_build,
    bloom_merge,
    kmv_distinct,
    kmv_merge,
)
from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
    stream_bloom_partials,
    stream_kmv_partials,
)


@pytest.fixture()
def four_file_stream(spark):
    """A 4-file parquet scratch dir streamed one file per micro-batch."""
    scratch = tempfile.mkdtemp(prefix="sketch_stream_test_")
    batch = spark.createDataFrame(
        [("g1" if i % 3 else "g2", f"u{i % 137}") for i in range(1000)],
        "grp string, v string",
    )
    batch.repartition(4).write.mode("overwrite").parquet(scratch)
    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(scratch)
    )
    yield batch, src
    shutil.rmtree(scratch, ignore_errors=True)


def test_stream_kmv_partials_merge_equals_one_shot(spark, four_file_stream):
    batch, src = four_file_stream
    partials = stream_kmv_partials(src, ["grp"], "v", k=32)
    # four genuine micro-batches fired (one per file), each group
    # sketched per batch
    assert partials.select("micro_batch").distinct().count() == 4
    merged = kmv_merge(partials, ["grp"], k=32)
    one_shot = kmv_distinct(batch, ["grp"], "v", k=32)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in one_shot.collect()
    }


def test_stream_bloom_partials_merge_equals_one_shot(spark, four_file_stream):
    batch, src = four_file_stream
    partials = stream_bloom_partials(src, "v", m_bits=2048, k_hashes=3)
    assert partials.count() == 4
    merged = bloom_merge(partials)
    one_shot = bloom_build(batch, "v", m_bits=2048, k_hashes=3)
    assert merged.first().bloom == one_shot.first().bloom


def test_stream_partials_empty_stream(spark):
    """Zero rows streamed → zero partial rows, with the right schema
    (the template frame supplies it), so a downstream merge fails loud
    instead of crashing on a schema-less frame."""
    scratch = tempfile.mkdtemp(prefix="sketch_stream_empty_")
    try:
        batch = spark.createDataFrame([], "grp string, v string")
        batch.write.mode("overwrite").parquet(scratch)
        src = spark.readStream.schema(batch.schema).parquet(scratch)
        partials = stream_kmv_partials(src, ["grp"], "v", k=32)
        assert partials.count() == 0
        assert set(partials.columns) == {
            "grp", "micro_batch", "sketch", "k", "hash_family"
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
