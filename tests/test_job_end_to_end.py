"""End-to-end job tests: DataSource → transform → sink → state commit,
including the reference's failure-ordering invariant matrix
(ref tests/test_etl_job.py:283-665) and partitioned-fetch equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.sinks.clickhouse_sink import ClickHouseHttpSink
from etl_prometheus2clickhouse_spark.sinks.parquet_sink import ParquetSink
from etl_prometheus2clickhouse_spark.sources.prometheus import (
    make_fetch_fn,
    register,
)
from etl_prometheus2clickhouse_spark.sources.state_store import (
    LocalStateStore,
    StateRow,
)
from etl_prometheus2clickhouse_spark.streaming.job import (
    EtlBatchJob,
    bootstrap_progress,
)

from tests.http_fixtures import FakeServers, synth_series

WINDOW = 300
STEP = 15
PROGRESS0 = 1_700_000_000
NOW = PROGRESS0 + 10_000  # far past the window → progress advances fully
# expected rows for one full window from the fake server (3 series ×
# step-aligned samples; start is NOT step-aligned, so compute it)
EXPECTED_ROWS = sum(len(s["values"]) for s in synth_series(PROGRESS0, PROGRESS0 + WINDOW, STEP))


@pytest.fixture(scope="module")
def servers():
    with FakeServers() as s:
        yield s


class TickingClock:
    """Monotonic 1s-per-call clock — two runs never share a
    timestamp_start key (in production int(time.time()) moves on)."""

    def __init__(self, base: int) -> None:
        self.t = base

    def __call__(self) -> int:
        self.t += 1
        return self.t


def _job(spark, tmp_path, servers, sink=None, overlap=0, now=NOW):
    state = LocalStateStore(str(tmp_path / "state.jsonl"))
    bootstrap_progress(state, PROGRESS0, now=PROGRESS0 - 1)
    job = EtlBatchJob(
        spark,
        state,
        make_fetch_fn(servers.url, partitions=1),
        sink or ParquetSink(str(tmp_path / "facts")),
        window_size_seconds=WINDOW,
        overlap_seconds=overlap,
        query_step_seconds=STEP,
        now_fn=TickingClock(now),
    )
    return job, state


def test_run_once_happy_path(spark, tmp_path, servers):
    job, state = _job(spark, tmp_path, servers)
    res = job.run_once()
    assert res.window_start == PROGRESS0
    assert res.window_end == PROGRESS0 + WINDOW
    assert res.series_count == 3
    assert res.rows_count == EXPECTED_ROWS
    assert res.new_progress == PROGRESS0 + WINDOW
    # data landed, partitioned by day
    facts = spark.read.parquet(str(tmp_path / "facts"))
    assert facts.count() == EXPECTED_ROWS
    assert set(facts.columns) >= {"timestamp", "name", "labels_key", "labels_value", "value", "id", "dt"}
    # lease closed, progress advanced
    st = state.get_state()
    assert st.timestamp_progress == PROGRESS0 + WINDOW
    assert state.has_running_job() is False
    assert st.batch_rows == EXPECTED_ROWS and st.batch_skipped_count == 0


def test_second_run_continues_window(spark, tmp_path, servers):
    job, state = _job(spark, tmp_path, servers)
    job.run_once()
    res2 = job.run_once()
    assert res2.window_start == PROGRESS0 + WINDOW
    assert state.get_state().timestamp_progress == PROGRESS0 + 2 * WINDOW


def test_progress_clamped_to_now(spark, tmp_path, servers):
    near_now = PROGRESS0 + 100  # mid-window
    job, state = _job(spark, tmp_path, servers, now=near_now)
    res = job.run_once()
    # min(window_end, now): clamped to the (ticking) clock, well short of
    # window_end
    assert near_now < res.new_progress < PROGRESS0 + WINDOW
    assert state.get_state().timestamp_progress == res.new_progress


def test_blocked_while_lease_open(spark, tmp_path, servers):
    job, state = _job(spark, tmp_path, servers)
    state.save_state(StateRow(timestamp_start=NOW - 5))  # open lease
    with pytest.raises(RuntimeError, match="cannot start"):
        job.run_once()


def test_missing_progress_fatal(spark, tmp_path, servers):
    state = LocalStateStore(str(tmp_path / "s2.jsonl"))
    job = EtlBatchJob(
        spark, state, make_fetch_fn(servers.url),
        ParquetSink(str(tmp_path / "f2")),
        now_fn=TickingClock(NOW),
    )
    with pytest.raises(ValueError, match="timestamp_progress"):
        job.run_once()
    # hard-fail happens AFTER lease acquire, like the reference — lease
    # stays open so operators notice (ref tests/test_etl_job.py:582-608)
    assert state.has_running_job() is True


class _FailingSink:
    def write(self, rows):
        raise IOError("sink down")


def test_write_failure_leaves_progress_untouched(spark, tmp_path, servers):
    """Failure ordering: data-write error → no state advance
    (ref tests/test_etl_job.py:510-579)."""
    job, state = _job(spark, tmp_path, servers, sink=_FailingSink())
    with pytest.raises(IOError):
        job.run_once()
    st = state.get_state()
    assert st.timestamp_progress == PROGRESS0  # untouched
    assert state.has_running_job() is True  # lease open → operator visible


class _FailingStateStore(LocalStateStore):
    def save_state(self, row):
        if row.timestamp_progress is not None:
            raise IOError("state down")
        super().save_state(row)


def test_state_save_failure_after_data_write(spark, tmp_path, servers):
    """Data lands but progress does not move when the final save fails —
    the at-least-once reprocess path (ref tests/test_etl_job.py:611-665)."""
    state = _FailingStateStore(str(tmp_path / "s3.jsonl"))
    # bootstrap bypasses the failing save (progress row via parent)
    LocalStateStore.save_state(
        state, StateRow(timestamp_start=1, timestamp_end=2, timestamp_progress=PROGRESS0)
    )
    job = EtlBatchJob(
        spark, state, make_fetch_fn(servers.url),
        ParquetSink(str(tmp_path / "f3")),
        window_size_seconds=WINDOW, query_step_seconds=STEP,
        now_fn=TickingClock(NOW),
    )
    with pytest.raises(IOError):
        job.run_once()
    assert spark.read.parquet(str(tmp_path / "f3")).count() == EXPECTED_ROWS  # data wrote
    assert state.get_state().timestamp_progress == PROGRESS0  # progress frozen


def test_partitioned_fetch_equals_single(spark, tmp_path, servers):
    """Sub-window partitioning returns exactly the single-scan sample set
    (step alignment, no boundary double-read)."""
    register(spark)
    def read(parts):
        return (
            spark.read.format("prometheus")
            .option("url", servers.url)
            .option("start", PROGRESS0)
            .option("end", PROGRESS0 + WINDOW)
            .option("step_seconds", STEP)
            .option("partitions", parts)
            .load()
        )
    single = read(1).select("metric", F.explode("values").alias("p")).collect()
    multi = read(4).select("metric", F.explode("values").alias("p")).collect()
    key = lambda r: (r.metric["__name__"], r.p[0])
    assert sorted(map(key, single)) == sorted(map(key, multi))
    assert len(multi) == EXPECTED_ROWS


def test_clickhouse_sink_wire_format(spark, tmp_path, servers):
    """Distributed TSV/HTTP sink posts reference-shaped lines."""
    servers.inserts.clear()
    job, state = _job(
        spark, tmp_path, servers,
        sink=ClickHouseHttpSink(servers.url, "default.metrics", distributed=True),
    )
    res = job.run_once()
    assert res.rows_count == EXPECTED_ROWS
    assert all(q.startswith("INSERT INTO default.metrics FORMAT TabSeparated")
               for q, _ in servers.inserts)
    lines = b"".join(b for _, b in servers.inserts).decode().strip().split("\n")
    assert len(lines) == EXPECTED_ROWS
    cols = lines[0].split("\t")
    assert len(cols) == 5
    assert cols[0].endswith(".000000")  # %.6f timestamp
    assert cols[2].startswith("['") and cols[3].startswith("['")


def test_clickhouse_sink_empty_short_circuit(spark, servers):
    """Empty batch → zero HTTP posts (ref clickhouse_client.py:166-170)."""
    servers.inserts.clear()
    sink = ClickHouseHttpSink(servers.url, "default.metrics", distributed=False)
    empty = spark.createDataFrame(
        [], "timestamp timestamp, name string, labels map<string,string>, value double"
    )
    sink.write(empty)
    assert servers.inserts == []


def test_restart_grid_contract_batch_path(spark, tmp_path, servers):
    """The batch restart-grid contract (EtlBatchJob docstring): a
    same-step restart replays the overlap region at IDENTICAL instants
    (every replayed row appears twice — dedup-on-storage collapses
    them), while a changed-step restart shifts the instant grid and
    produces overlap samples that exist only once on each grid —
    near-duplicates no content dedup can absorb. The state schema is
    wire-parity with the reference (no step column), so this is a
    pinned operational contract for the batch path; the streaming path
    stamps the grid into its checkpoint and refuses instead."""
    from pyspark.sql import functions as F

    ov = 30
    state = LocalStateStore(str(tmp_path / "grid_state.jsonl"))
    bootstrap_progress(state, PROGRESS0, now=PROGRESS0 - 1)
    facts_dir = str(tmp_path / "grid_facts")
    clock = TickingClock(NOW)

    def mk(step):
        return EtlBatchJob(
            spark,
            state,
            make_fetch_fn(servers.url, partitions=1),
            ParquetSink(facts_dir),
            window_size_seconds=WINDOW,
            overlap_seconds=ov,
            query_step_seconds=step,
            now_fn=clock,
        )

    r1 = mk(STEP).run_once()
    r2 = mk(STEP).run_once()
    assert r2.window_start == r1.window_end - ov  # overlap really replays

    def overlap_counts(lo, hi):
        facts = spark.read.parquet(facts_dir)
        return (
            facts.where(
                (F.unix_micros("timestamp") >= lo * 1_000_000)
                & (F.unix_micros("timestamp") <= hi * 1_000_000)
            )
            .groupBy("name", "timestamp")
            .count()
            .collect()
        )

    same_grid = overlap_counts(r2.window_start, r1.window_end)
    assert same_grid
    # unchanged grid: every overlap instant was written by BOTH runs as
    # an identical row - exactly what dedup-on-storage collapses
    assert all(r["count"] == 2 for r in same_grid)

    # run 3 with a CHANGED step: same state, moved grid
    r3 = mk(10).run_once()
    moved_grid = overlap_counts(r3.window_start, r2.window_end)
    solo = [r for r in moved_grid if r["count"] == 1]
    # instants exclusive to one grid exist on both sides: near-dup
    # samples that no exact dedup can collapse (the documented cost of
    # changing query_step_seconds without a clean re-deploy)
    assert solo, "changed step unexpectedly preserved the instant grid"
