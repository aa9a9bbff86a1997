"""Streaming sketch partials — the mergeable-sketch family wired into
the micro-batch lifecycle (round-7 verdict "Next round" #7).

The partial sketches (operators/sketch.py) exist so corpus statistics
can accumulate ACROSS ingestion windows: each window sketches its own
slice down to O(groups × k) state, and the corpus answer is a merge
over partials instead of a re-scan of every window — the same
windowed-incremental lifecycle the engine's Prometheus ETL runs
(plans/lifecycle.py). This module demonstrates that wiring with real
Structured Streaming micro-batches:

- :func:`stream_kmv_partials` / :func:`stream_bloom_partials` run a
  bounded stream to completion (``Trigger.AvailableNow``) with a
  ``foreachBatch`` body that builds ONE partial sketch per micro-batch
  (micro-batch id = the sketch's ``batch_col``) and appends it to a
  driver-side accumulator. The accumulator holds SKETCH rows, not
  data — O(batches × groups × k) longs, the artifact whose whole
  point is being small enough to collect/ship — so this is a bounded,
  deliberate driver collect, same contract as the similarity module's
  guarded collects.
- The caller merges with the ordinary batch ``kmv_merge`` /
  ``bloom_merge``; because the merges are exact, the streamed-and-
  merged result must equal the one-shot sketch over the full stream —
  which is exactly what the ``stream_kmv`` catalog entry pins against
  the one-shot SQL oracle.

At 100 TB the accumulator becomes a parquet append (one tiny file per
window) or an upsert into the state store, and the merge runs on
demand; the foreachBatch body and the merge plan are identical.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.sketch import (
    bloom_build,
    kmv_partial_sketches,
)

_MICRO_BATCH_COL = "micro_batch"


def _run_partial_stream(
    src: DataFrame,
    per_batch: Callable[[DataFrame, int], DataFrame],
    template: DataFrame,
) -> DataFrame:
    """Run ``src`` to completion under AvailableNow, applying
    ``per_batch`` (a sketch-partial builder) to every micro-batch and
    accumulating the resulting SKETCH rows driver-side. Returns the
    accumulated partials as a batch DataFrame with ``template``'s
    schema (``template`` supplies the schema when zero batches fire)."""
    spark = src.sparkSession
    acc: list = []

    def body(batch_df: DataFrame, batch_id: int) -> None:
        acc.extend(per_batch(batch_df, int(batch_id)).collect())

    q = (
        src.writeStream.foreachBatch(body)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(acc, template.schema)


def stream_kmv_partials(
    src: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """One KMV partial set per micro-batch of ``src`` (a streaming
    DataFrame): returns the accumulated partials frame
    ``(group…, micro_batch, sketch, k, hash_family)`` ready for
    :func:`~etl_prometheus2clickhouse_spark.operators.sketch.kmv_merge`.
    Merge-exactness makes the batch boundaries irrelevant: however the
    source splits its files into micro-batches, the merged estimate
    equals the one-shot sketch over everything streamed."""
    template = kmv_partial_sketches(
        src.sparkSession.createDataFrame([], src.schema).withColumn(
            _MICRO_BATCH_COL, F.lit(0)
        ),
        group_cols,
        value_col,
        _MICRO_BATCH_COL,
        k,
        hash_family,
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return kmv_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            group_cols,
            value_col,
            _MICRO_BATCH_COL,
            k,
            hash_family,
        )

    return _run_partial_stream(src, per_batch, template)


def stream_bloom_partials(
    src: DataFrame,
    value_col: str,
    m_bits: int = 16384,
    k_hashes: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """One Bloom position-set partial per micro-batch of ``src``:
    returns the accumulated partials frame ``(micro_batch, bloom,
    m_bits, k_hashes, hash_family)`` ready for
    :func:`~etl_prometheus2clickhouse_spark.operators.sketch.bloom_merge`
    (position-set union — exact, so the merged sketch equals the
    one-shot build over everything streamed)."""
    template = bloom_build(
        src.sparkSession.createDataFrame([], src.schema).withColumn(
            _MICRO_BATCH_COL, F.lit(0)
        ),
        value_col,
        m_bits,
        k_hashes,
        batch_col=_MICRO_BATCH_COL,
        hash_family=hash_family,
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return bloom_build(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            value_col,
            m_bits,
            k_hashes,
            batch_col=_MICRO_BATCH_COL,
            hash_family=hash_family,
        )

    return _run_partial_stream(src, per_batch, template)
