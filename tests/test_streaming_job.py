"""Structured Streaming job: multi-micro-batch ingestion through the
fake Prometheus server, write-then-commit ordering under an injected
sink failure, and checkpoint-replay recovery
(streaming/stream_job.py; reference invariants
/root/reference/etl_job.py:74-79,119-186)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import DataFrame

from etl_prometheus2clickhouse_spark.sources.state_store import LocalStateStore
from etl_prometheus2clickhouse_spark.streaming.stream_job import EtlStreamingJob
from tests.http_fixtures import FakeServers


class RecordingSink:
    """Collects written rows; optionally fails on designated epochs
    BEFORE writing anything (the reference's fetch/write-failure
    matrix leaves no partial state)."""

    def __init__(self, fail_on_calls: set[int] | None = None) -> None:
        self.batches: list[list] = []
        self.calls = 0
        self._fail_on = fail_on_calls or set()

    def write(self, rows: DataFrame) -> None:
        call = self.calls
        self.calls += 1
        if call in self._fail_on:
            raise RuntimeError(f"injected sink failure on call {call}")
        self.batches.append(rows.collect())


def _run_stream(spark, tmp_path, url, sink, state, initial, window=300):
    job = EtlStreamingJob(
        spark,
        url=url,
        sink=sink,
        state=state,
        checkpoint_dir=str(tmp_path / "ckpt"),
        initial_progress=initial,
        window_size_seconds=window,
        query_step_seconds=60,
    )
    q = job.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return q


def test_multi_batch_ingest_and_state_mirror(spark, tmp_path):
    """≥2 micro-batches stream through; rows land; the state mirror
    records per-epoch batch stats with advancing progress."""
    state = LocalStateStore(str(tmp_path / "state.jsonl"))
    sink = RecordingSink()
    initial = int(time.time()) - 700  # 3 windows of 300s to catch up
    with FakeServers() as srv:
        _run_stream(spark, tmp_path, srv.url, sink, state, initial)
        assert len(srv.prom_requests) >= 2  # multiple windowed fetches
    assert len(sink.batches) >= 2
    total_rows = sum(len(b) for b in sink.batches)
    assert total_rows > 0
    # fake server emits 3 series per request; every row parses
    names = {r.name for b in sink.batches for r in b}
    assert names == {"up", "node_load1", "http_requests_total"}
    mirror = state.all_rows()
    assert len(mirror) == len(sink.batches)
    progresses = [r.timestamp_progress for r in mirror if r.timestamp_progress]
    assert progresses == sorted(progresses) and progresses  # monotone
    assert all(r.batch_rows == len(b) for r, b in zip(mirror, sink.batches))
    # windows are contiguous: each fetch starts where the previous ended
    starts = [int(float(q["start"])) for q in srv.prom_requests]
    ends = [int(float(q["end"])) for q in srv.prom_requests]
    assert starts[0] == initial
    for s, prev_end in zip(starts[1:], ends):
        assert s == prev_end


def test_sink_failure_blocks_state_then_replay_recovers(spark, tmp_path):
    """Epoch 1's sink failure aborts the query with NO state row for
    that epoch (data-before-state); restarting from the same checkpoint
    replays the SAME window (at-least-once) and then advances."""
    state = LocalStateStore(str(tmp_path / "state.jsonl"))
    sink = RecordingSink(fail_on_calls={1})
    initial = int(time.time()) - 700
    with FakeServers() as srv:
        with pytest.raises(Exception, match="injected sink failure"):
            job = EtlStreamingJob(
                spark,
                url=srv.url,
                sink=sink,
                state=state,
                checkpoint_dir=str(tmp_path / "ckpt"),
                initial_progress=initial,
                window_size_seconds=300,
                query_step_seconds=60,
            )
            q = job.start()
            try:
                q.processAllAvailable()
                if q.exception() is not None:
                    raise q.exception()
            finally:
                q.stop()
        # exactly one successful epoch before the failure
        mirror_before = state.all_rows()
        assert len(mirror_before) == 1
        assert len(sink.batches) == 1
        # the sink raised before any action, so window 1 was never even
        # fetched (lazy plan — the reference's fetch-failure case); it
        # begins where window 0 ended
        failed_window_start = int(float(srv.prom_requests[0]["end"]))
        n_requests_before = len(srv.prom_requests)

        # restart with a healthy sink on the SAME checkpoint: the failed
        # window is replayed from its WAL'd offsets, then the stream
        # catches up and state advances past it
        sink2 = RecordingSink()
        job2 = EtlStreamingJob(
            spark,
            url=srv.url,
            sink=sink2,
            state=state,
            checkpoint_dir=str(tmp_path / "ckpt"),
            initial_progress=initial,
            window_size_seconds=300,
            query_step_seconds=60,
        )
        q2 = job2.start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        replayed_starts = [
            int(float(r["start"]))
            for r in srv.prom_requests[n_requests_before:]
        ]
        assert replayed_starts and replayed_starts[0] == failed_window_start
    assert sink2.batches  # replayed data landed
    mirror_after = state.all_rows()
    assert len(mirror_after) == 1 + len(sink2.batches)
    progresses = [
        r.timestamp_progress for r in mirror_after if r.timestamp_progress
    ]
    assert progresses == sorted(progresses)
