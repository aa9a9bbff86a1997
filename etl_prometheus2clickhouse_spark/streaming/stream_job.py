"""Structured Streaming ETL: Prometheus source → transform → sink, with
the reference's write-then-commit ordering per micro-batch.

The reference's watermark/lease protocol is a hand-rolled offset log +
epoch commit (SURVEY.md §1.3); Structured Streaming supplies both
natively:

- the ``prometheus`` stream reader exposes ``timestamp_progress`` as the
  source offset (sources/prometheus.py); Spark's checkpoint WAL is the
  authoritative offset log (reference: the state table,
  /root/reference/etl_job.py:298-355);
- ``foreachBatch`` reproduces ``run_once``'s failure invariant — the
  data write strictly precedes the state append
  (/root/reference/etl_job.py:74-79,119-186, pinned by its
  tests/test_etl_job.py:510-665): a sink failure aborts the epoch
  before any state is recorded, Spark re-runs the SAME offset range on
  restart (offsets are WAL'd before processing, committed after), and
  storage-side dedup absorbs the replayed rows — at-least-once writes,
  exactly-once effect;
- the state store receives a *mirror* row per epoch (batch stats +
  observed max sample timestamp) for operational visibility, exactly
  the columns the reference persists (README.md:162-178). It is not
  load-bearing for recovery — the checkpoint is.

Counters ride the sink's single action via ``observe`` (SURVEY §2 A1):
no second pass over the micro-batch.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_prometheus2clickhouse_spark.functions import content_hash
from etl_prometheus2clickhouse_spark.operators.transform import (
    series_to_rows,
    series_to_rows_plan,
)
from etl_prometheus2clickhouse_spark.sources.prometheus import (
    DEFAULT_SELECTOR,
    register,
)
from etl_prometheus2clickhouse_spark.sources.state_store import StateRow, StateStore
from etl_prometheus2clickhouse_spark.streaming.job import RowSink


class EtlStreamingJob:
    """Continuous windowed ingestion: one micro-batch = one window."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        sink: RowSink,
        state: StateStore,
        checkpoint_dir: str,
        initial_progress: int,
        window_size_seconds: int = 300,
        query_step_seconds: int = 15,
        query: str = DEFAULT_SELECTOR,
        partitions: int = 1,
        overlap_seconds: int = 0,
        dedup_within_watermark: str | None = None,
        now_fn: Callable[[], int] = lambda: int(time.time()),
    ) -> None:
        self._spark = spark
        self._url = url
        self._sink = sink
        self._state = state
        self._checkpoint = checkpoint_dir
        self._initial = initial_progress
        self._window = window_size_seconds
        self._step = query_step_seconds
        self._query = query
        self._partitions = partitions
        # boundary-safety re-read (reference BATCH_WINDOW_OVERLAP_SECONDS,
        # config.py:165-173): each micro-batch fetches from
        # progress − overlap; replayed rows rely on sink dedup
        self._overlap = overlap_seconds
        # streaming-native K3: content-hash dedup ACROSS micro-batches
        # via dropDuplicatesWithinWatermark (e.g. "10 minutes") — the
        # overlap's replayed rows collapse in-stream, so a plain
        # (non-ReplacingMergeTree) sink still sees each sample once.
        # None = rely on storage-side dedup, the reference's model.
        self._dedup_watermark = dedup_within_watermark
        self._now = now_fn

    # -- per-epoch processing ----------------------------------------------

    def _process_batch(self, series_df: DataFrame, epoch_id: int) -> None:
        started = self._now()
        batch = series_to_rows(series_df)
        progress_obs = Observation()
        rows = batch.rows.observe(
            progress_obs,
            F.max(F.unix_micros("timestamp")).alias("max_us"),
        )

        # 1. data write — any failure here aborts the epoch with NO state
        #    recorded and NO offset committed (replayed on restart).
        self._sink.write(rows)

        # 2. state mirror append, strictly after the data landed.
        metrics = dict(batch.observation.get)
        max_us = dict(progress_obs.get)["max_us"]
        now = self._now()
        self._state.save_state(
            StateRow(
                timestamp_start=started,
                timestamp_end=max(now, started + 1),
                timestamp_progress=(
                    int(max_us // 1_000_000) if max_us is not None else None
                ),
                batch_rows=int(metrics["rows_count"]),
                batch_skipped_count=int(metrics["skipped_count"]),
            )
        )

    def _process_deduped_batch(self, rows_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body for the in-stream-dedup mode: rows arrive
        already transformed AND deduped (the stateful operator must live
        in the streaming plan, upstream of here). Same write-then-commit
        ordering; ``batch_skipped_count`` is None in this mode (the
        parse-stage counter lives inside the streaming plan, where batch
        Observations can't — the reference's state schema makes the
        column Nullable for exactly this kind of gap)."""
        started = self._now()
        obs = Observation()
        rows = rows_df.observe(
            obs,
            F.count(F.lit(1)).alias("rows_count"),
            F.max(F.unix_micros("timestamp")).alias("max_us"),
        )
        self._sink.write(rows)
        metrics = dict(obs.get)
        max_us = metrics["max_us"]
        now = self._now()
        self._state.save_state(
            StateRow(
                timestamp_start=started,
                timestamp_end=max(now, started + 1),
                timestamp_progress=(
                    int(max_us // 1_000_000) if max_us is not None else None
                ),
                batch_rows=int(metrics["rows_count"]),
                batch_skipped_count=None,
            )
        )

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> StreamingQuery:
        register(self._spark)
        stream = (
            self._spark.readStream.format("prometheus")
            .option("url", self._url)
            .option("query", self._query)
            .option("step_seconds", self._step)
            .option("partitions", self._partitions)
            .option("initial_progress", self._initial)
            .option("window_size_seconds", self._window)
            .option("overlap_seconds", self._overlap)
            .load()
        )
        if self._dedup_watermark is None:
            df, process = stream, self._process_batch
        else:
            # transform in-stream, then stateful content-hash dedup:
            # replayed rows (overlap re-read, epoch retry) collapse
            # before the sink, state bounded by the watermark delay
            rows = series_to_rows_plan(stream)
            deduped = (
                rows.withColumn("id", content_hash())
                .withWatermark("timestamp", self._dedup_watermark)
                .dropDuplicatesWithinWatermark(["id"])
                .drop("id")
            )
            df, process = deduped, self._process_deduped_batch
        return (
            df.writeStream.foreachBatch(process)
            .option("checkpointLocation", self._checkpoint)
            .start()
        )
