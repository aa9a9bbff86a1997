"""The ETL job — one windowed Extract→Transform→Load cycle.

Reproduces the reference's ``run_once`` control flow and its failure
invariants (etl_job.py:65-186) on Spark primitives:

1. start gate — blocked while a lease is open; state-read errors block
   fail-safe (etl_job.py:214-252);
2. atomic lease acquire (etl_job.py:254-296);
3. progress load — missing progress is a hard ``ValueError``, never
   auto-bootstrap (etl_job.py:298-355);
4. window arithmetic (etl_job.py:357-393);
5. fetch + transform as ONE lazy DataFrame plan (the reference's
   spool-file pipeline, etl_job.py:395-543, is here just Catalyst);
6. **data write strictly precedes state write** — a crash between them
   reprocesses the window and storage-side dedup absorbs duplicates
   (etl_job.py:74-79; pinned by tests/test_etl_job.py:510-665);
7. progress clamp + lease close in one versioned state append
   (etl_job.py:148-186, 893-947).

Counters (rows/skipped/series) ride the sink's single action via
``observe`` — no second pass over the data (SURVEY.md §2 A1).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Protocol

from pyspark.sql import DataFrame, SparkSession

from etl_prometheus2clickhouse_spark.operators.transform import (
    ParsedBatch,
    series_to_rows,
)
from etl_prometheus2clickhouse_spark.plans.lifecycle import (
    calc_window,
    can_start,
    commit_decision,
)
from etl_prometheus2clickhouse_spark.sources.state_store import StateRow, StateStore


class RowSink(Protocol):
    """Writes fact rows; must consume ``rows`` with exactly one Spark
    action (the job's observe-metrics contract depends on it)."""

    def write(self, rows: DataFrame) -> None: ...


FetchFn = Callable[[SparkSession, int, int, int], DataFrame]
"""(spark, window_start, window_end, step_seconds) → series DataFrame
(columns ``metric: map<string,string>``, ``values: array<array<string>>``)."""


@dataclass(frozen=True)
class RunResult:
    window_start: int
    window_end: int
    rows_count: int
    skipped_count: int
    series_count: int
    new_progress: int
    timestamp_end: int


class EtlBatchJob:
    """One process-level run = one window, like the reference's
    externally-scheduled loop (main.py:64-69).

    **Restart-grid contract** (pinned by
    tests/test_job_end_to_end.py::test_restart_grid_contract_batch_path):
    Prometheus evaluates a range query at ``window_start + k*step``, so
    the overlap region of a restart replays samples at the SAME
    instants only while the grid is unchanged — identical replayed
    rows, absorbed by dedup-on-storage (K3). Changing
    ``query_step_seconds`` (or an overlap that moves ``window_start``
    off the old grid) shifts the instants, and the replayed overlap
    rows become near-duplicates storage dedup cannot collapse. The
    state schema is wire-parity with the reference (README.md:162-178
    — no step column), so the batch path cannot detect this at
    startup; treat a step change as a re-deploy: run once with
    ``overlap_seconds=0``, or accept near-dup samples in one overlap
    window. The STREAMING path has no such gap — it stamps
    ``step``/``initial`` into its checkpoint offsets and refuses a
    mismatched restart (sources/prometheus.py ``_check_grid``)."""

    def __init__(
        self,
        spark: SparkSession,
        state: StateStore,
        fetch: FetchFn,
        sink: RowSink,
        window_size_seconds: int = 300,
        overlap_seconds: int = 0,
        min_window_start: int = 0,
        query_step_seconds: int = 15,
        now_fn: Callable[[], int] = lambda: int(time.time()),
    ) -> None:
        self._spark = spark
        self._state = state
        self._fetch = fetch
        self._sink = sink
        self._window_size = window_size_seconds
        self._overlap = overlap_seconds
        self._min_start = min_window_start
        self._step = query_step_seconds
        self._now = now_fn

    # -- lifecycle steps ---------------------------------------------------

    def _check_can_start(self) -> bool:
        """Fail-safe gate: any error reading state blocks the run
        (reference etl_job.py:214-252)."""
        try:
            running = self._state.has_running_job()
        except Exception:
            running = None
        return can_start(running)

    def _load_progress(self) -> int:
        """Hard-fail when no progress exists — the reference explicitly
        refuses to probe Prometheus for the oldest data
        (etl_job.py:298-355, note at 303-305)."""
        st = self._state.get_state()
        if st is None or st.timestamp_progress is None:
            raise ValueError(
                "timestamp_progress not found in state store; bootstrap it "
                "explicitly before the first run"
            )
        return st.timestamp_progress

    # -- the run -----------------------------------------------------------

    def run_once(self) -> RunResult:
        if not self._check_can_start():
            raise RuntimeError(
                "Job cannot start: previous job is still running or error "
                "checking state"
            )

        timestamp_start = self._now()
        if not self._state.try_mark_start(timestamp_start):
            raise RuntimeError("Job cannot start: failed to acquire lease")

        progress = self._load_progress()
        window_start, window_end = calc_window(
            progress, self._window_size, self._overlap, self._min_start
        )

        series_df = self._fetch(self._spark, window_start, window_end, self._step)
        batch: ParsedBatch = series_to_rows(series_df)

        # Data write FIRST; the sink's single action also materializes the
        # observe counters. Any exception here leaves progress untouched
        # (and the lease open), matching the reference invariant matrix.
        self._sink.write(batch.rows)
        metrics = dict(batch.observation.get)
        rows_count = int(metrics["rows_count"])
        skipped_count = int(metrics["skipped_count"])
        series_count = int(dict(batch.series_observation.get)["series_count"])

        # State write SECOND (etl_job.py:148-186).
        now = self._now()
        d = commit_decision(window_start, window_end, now, timestamp_start)
        self._state.save_state(
            StateRow(
                timestamp_start=timestamp_start,
                timestamp_end=d.timestamp_end,
                timestamp_progress=d.new_progress,
                batch_window_seconds=d.actual_window_seconds,
                batch_rows=rows_count,
                batch_skipped_count=skipped_count,
            )
        )
        return RunResult(
            window_start=window_start,
            window_end=window_end,
            rows_count=rows_count,
            skipped_count=skipped_count,
            series_count=series_count,
            new_progress=d.new_progress,
            timestamp_end=d.timestamp_end,
        )


def bootstrap_progress(state: StateStore, progress: int, now: int | None = None) -> None:
    """Seed the watermark for a fresh deployment (the reference requires a
    manually inserted initial progress row — README.md:162-178)."""
    now = now or int(time.time())
    state.save_state(
        StateRow(
            timestamp_start=now,
            timestamp_end=now + 1,
            timestamp_progress=progress,
        )
    )
