"""Window arithmetic, commit rules, lease/state-machine scenarios —
ported behavioral pins (FIXTURES.md §F3; reference
tests/test_etl_job.py:283-665,1134-1294,
tests/test_clickhouse_client.py:955-1199)."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.plans.lifecycle import (
    calc_window,
    can_start,
    commit_decision,
)
from etl_prometheus2clickhouse_spark.plans.state_queries import (
    has_running_job_df,
    latest_valid_state,
    open_leases,
    replacing_merge_latest,
)
from etl_prometheus2clickhouse_spark.schemas import ETL_STATE_SCHEMA
from etl_prometheus2clickhouse_spark.sources.state_store import (
    LocalStateStore,
    StateRow,
    validate_table_name,
)


# ---------------------------------------------------------------------------
# Q2 window arithmetic (ref tests/test_etl_job.py:1171-1294)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "progress,size,overlap,min_start,expected",
    [
        (1000, 300, 0, 0, (1000, 1300)),
        (1000, 300, 20, 0, (980, 1280)),
        (50, 300, 20, 100, (100, 400)),  # clamped
        (150, 300, 20, 100, (130, 430)),  # not clamped
    ],
)
def test_calc_window(progress, size, overlap, min_start, expected):
    assert calc_window(progress, size, overlap, min_start) == expected


# ---------------------------------------------------------------------------
# Q3 progress clamp (ref tests/test_etl_job.py:1134-1168; etl_job.py:148-186)
# ---------------------------------------------------------------------------

def test_commit_progress_clamped_to_now():
    d = commit_decision(window_start=1000, window_end=1300, now=1100, timestamp_start=1050)
    assert d.new_progress == 1100  # never into the future
    assert d.actual_window_seconds == 100
    assert d.timestamp_end == 1100


def test_commit_full_window_in_past():
    d = commit_decision(window_start=1000, window_end=1300, now=5000, timestamp_start=4999)
    assert d.new_progress == 1300
    assert d.actual_window_seconds == 300
    assert d.timestamp_end == 5000


def test_commit_end_strictly_after_start():
    d = commit_decision(window_start=0, window_end=300, now=100, timestamp_start=100)
    assert d.timestamp_end == 101  # max(now, start+1)


# ---------------------------------------------------------------------------
# Q4 start gate (ref etl_job.py:214-252)
# ---------------------------------------------------------------------------

def test_can_start_matrix():
    assert can_start(False) is True
    assert can_start(True) is False
    assert can_start(None) is False  # state-read error → fail-safe block


# ---------------------------------------------------------------------------
# State store scenarios (FIXTURES.md §F3 matrix)
# ---------------------------------------------------------------------------

def _store(tmp_path) -> LocalStateStore:
    return LocalStateStore(str(tmp_path / "state.jsonl"))


def test_lease_acquire_and_block(tmp_path):
    s = _store(tmp_path)
    s.save_state(StateRow(timestamp_start=10, timestamp_end=20, timestamp_progress=1000))
    assert s.has_running_job() is False
    assert s.try_mark_start(100) is True  # lease row appended
    assert s.has_running_job() is True
    assert s.try_mark_start(101) is False  # blocked: open lease


def test_lease_close_via_newer_version(tmp_path):
    s = _store(tmp_path)
    assert s.try_mark_start(100) is True
    s.save_state(
        StateRow(timestamp_start=100, timestamp_end=200, timestamp_progress=1300)
    )
    # newer version of the same timestamp_start closes the lease (RMT merge)
    assert s.has_running_job() is False
    st = s.get_state()
    assert st.timestamp_progress == 1300 and st.timestamp_start == 100


def test_get_state_filters_invalid_rows(tmp_path):
    s = _store(tmp_path)
    # start > end → invalid, skipped by the S2 filter
    # (ref tests/test_etl_job.py:325-353: run proceeds past invalid state)
    s.save_state(StateRow(timestamp_start=500, timestamp_end=400, timestamp_progress=999))
    assert s.get_state() is None
    s.save_state(StateRow(timestamp_start=300, timestamp_end=400, timestamp_progress=1111))
    assert s.get_state().timestamp_progress == 1111


def test_get_state_latest_start_wins(tmp_path):
    s = _store(tmp_path)
    s.save_state(StateRow(timestamp_start=100, timestamp_end=150, timestamp_progress=1))
    s.save_state(StateRow(timestamp_start=200, timestamp_end=250, timestamp_progress=2))
    assert s.get_state().timestamp_progress == 2


def test_empty_store(tmp_path):
    s = _store(tmp_path)
    assert s.get_state() is None
    assert s.has_running_job() is False


def test_save_state_o1_versioning(tmp_path, monkeypatch):
    # save_state must not re-read the whole log per append: after the
    # first version probe, all_rows is never called again on the write
    # path (O(1) per append instead of O(n) → O(n²) over the log life).
    s = _store(tmp_path)
    calls = {"n": 0}
    orig = LocalStateStore.all_rows

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(LocalStateStore, "all_rows", counting)
    for i in range(100):
        s.save_state(
            StateRow(timestamp_start=i, timestamp_end=i + 1, timestamp_progress=i)
        )
    assert calls["n"] <= 1
    # versions stay strictly monotonic and dense
    versions = [r.version for r in orig(s)]
    assert versions == sorted(versions) and len(set(versions)) == 100


def test_version_cache_survives_second_instance(tmp_path):
    # a fresh store on the same path must continue the version sequence,
    # not restart it (the cache is lazy-initialized from the log)
    s1 = _store(tmp_path)
    s1.save_state(StateRow(timestamp_start=1, timestamp_end=2, timestamp_progress=1))
    s1.save_state(StateRow(timestamp_start=2, timestamp_end=3, timestamp_progress=2))
    s2 = _store(tmp_path)
    s2.save_state(StateRow(timestamp_start=3, timestamp_end=4, timestamp_progress=3))
    versions = [r.version for r in s2.all_rows()]
    assert versions == [1, 2, 3]
    # lease acquire under the lock refreshes the mark from disk, so a
    # stale third instance never reuses a version
    s3 = _store(tmp_path)
    assert s3.try_mark_start(999) is True
    assert max(r.version for r in s3.all_rows()) == 4


def test_validate_table_name():
    validate_table_name("default.metrics")
    validate_table_name("metrics")
    for bad in ("", "a.b.c", "a;drop", "a.", ".b", "a b", "a-b"):
        with pytest.raises(ValueError):
            validate_table_name(bad)


# ---------------------------------------------------------------------------
# DataFrame state-scan plans (S2/A2 as Spark primitives)
# ---------------------------------------------------------------------------

def _state_df(spark, rows):
    return spark.createDataFrame(
        [
            (r.timestamp_start, r.timestamp_end, r.timestamp_progress,
             r.batch_window_seconds, r.batch_rows, r.batch_skipped_count,
             r.version)
            for r in rows
        ],
        ETL_STATE_SCHEMA,
    )


def test_latest_valid_state_df(spark):
    df = _state_df(
        spark,
        [
            StateRow(100, 150, 1, version=1),
            StateRow(200, None, None, version=2),  # open lease → filtered
            StateRow(200, 260, 9, version=3),  # newer version closes it
            StateRow(300, 250, 5, version=4),  # end < start → invalid
        ],
    )
    got = latest_valid_state(df).collect()
    assert len(got) == 1
    assert got[0].timestamp_start == 200 and got[0].timestamp_progress == 9


def test_open_leases_and_running_df(spark):
    df = _state_df(
        spark,
        [StateRow(100, None, None, version=1), StateRow(50, 60, 1, version=2)],
    )
    assert [r.timestamp_start for r in open_leases(df).collect()] == [100]
    assert has_running_job_df(df) is True
    df2 = _state_df(spark, [StateRow(100, 150, 1, version=1)])
    assert has_running_job_df(df2) is False


def test_replacing_merge_latest_df(spark):
    df = _state_df(
        spark,
        [StateRow(100, None, None, version=1), StateRow(100, 200, 7, version=5)],
    )
    got = replacing_merge_latest(df).collect()
    assert len(got) == 1 and got[0].version == 5
