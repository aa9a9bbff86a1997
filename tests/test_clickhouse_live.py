"""LIVE ClickHouse integration — the falsifiable wire claim.

Every ClickHouse path in this repo (K1 TSV insert, Q1 lease SQL, S2
state scan) is pinned against pytest HTTP fakes elsewhere
(tests/http_fixtures.py, test_clickhouse_state_store.py). This module
runs the SAME code against a real server when one is reachable, and
skips cleanly otherwise — the sandbox has no services, so these tests
exist so that the day a cluster is available the wire format is
verified with one command, not an argument.

Run it against the reference's own stack
(/root/reference/docker-compose.yml:1-206 — ClickHouse 25.x + the
default.metrics / default.etl DDL):

    docker compose up -d clickhouse clickhouse_init
    CLICKHOUSE_URL=http://localhost:8123 python -m pytest tests/test_clickhouse_live.py

The tests create their own uniquely-named tables (reference DDL
shapes, docker-compose.yml:157-199) and drop them afterwards — safe
to point at a shared server.
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid

import pytest

# reachability PROBE, not an env flag: when CLICKHOUSE_URL is unset,
# the standard local daemon address is probed — the matrix auto-enables
# the first time the environment grows a reachable server, with zero
# configuration. A connection-refused probe fails in milliseconds, so
# service-less sandboxes still skip instantly.
CLICKHOUSE_URL = os.environ.get("CLICKHOUSE_URL", "http://localhost:8123")


def _execute(query: str, data: bytes | None = None) -> str:
    req = urllib.request.Request(
        f"{CLICKHOUSE_URL.rstrip('/')}/?"
        + urllib.parse.urlencode({"query": query}),
        data=data,
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=5) as resp:  # nosec B310
        return resp.read().decode()


def _reachable() -> bool:
    if not CLICKHOUSE_URL:
        return False
    try:
        return _execute("SELECT 1").strip() == "1"
    except (urllib.error.URLError, OSError, ValueError):
        return False


pytestmark = pytest.mark.skipif(
    not _reachable(),
    reason="no reachable ClickHouse (probed $CLICKHOUSE_URL or the "
    "localhost default) — live wire tests need a real server (see "
    "module docstring for the one-command stack)",
)


@pytest.fixture()
def metrics_table():
    """Reference-DDL metrics table (docker-compose.yml:157-180) under a
    unique name; dropped on teardown."""
    name = f"default.metrics_it_{uuid.uuid4().hex[:12]}"
    _execute(
        f"""
        CREATE TABLE {name} (
            id UInt64 MATERIALIZED cityHash64(
                timestamp, name, labels.key, labels.value, value),
            timestamp DateTime64(6, 'UTC'),
            name String,
            labels Nested(key String, value String),
            value Float64
        ) ENGINE = ReplacingMergeTree()
        PARTITION BY toYYYYMMDD(timestamp)
        ORDER BY (timestamp, name,
                  arraySort(arrayMap((k, v) -> tuple(k, v),
                            labels.key, labels.value)))
        """
    )
    yield name
    _execute(f"DROP TABLE IF EXISTS {name}")


@pytest.fixture()
def etl_table():
    """Reference-DDL state table (docker-compose.yml:184-200) under a
    unique name; dropped on teardown."""
    name = f"default.etl_it_{uuid.uuid4().hex[:12]}"
    _execute(
        f"""
        CREATE TABLE {name} (
            id UInt64 MATERIALIZED cityHash64(
                timestamp_start,
                coalesce(timestamp_end, toDateTime(0)),
                coalesce(timestamp_progress, toDateTime(0)),
                coalesce(batch_window_seconds, 0),
                coalesce(batch_rows, 0),
                coalesce(batch_skipped_count, 0)),
            timestamp_start DateTime,
            timestamp_end Nullable(DateTime),
            timestamp_progress Nullable(DateTime),
            batch_window_seconds Nullable(Int64),
            batch_rows Nullable(Int64),
            batch_skipped_count Nullable(Int64)
        ) ENGINE = ReplacingMergeTree()
        ORDER BY (timestamp_start)
        """
    )
    yield name
    _execute(f"DROP TABLE IF EXISTS {name}")


def test_k1_tsv_insert_round_trip(spark, metrics_table):
    """K1: the distributed mapInPandas TSV sink inserts rows a real
    server parses into the reference schema — values, µs timestamps,
    and sorted parallel label arrays all survive the round trip."""
    from etl_prometheus2clickhouse_spark.sinks.clickhouse_sink import (
        ClickHouseHttpSink,
    )

    rows = spark.createDataFrame(
        [
            (
                "2024-01-02 03:04:05.123456",
                "http_requests_total",
                {"job": "api", "instance": "i-1"},
                1.5,
            ),
            (
                "2024-01-02 03:04:06.000000",
                'weird"metric\\name',
                {"b": "2", "a": "1"},
                float("inf"),
            ),
        ],
        "ts string, name string, labels map<string,string>, value double",
    ).selectExpr(
        "CAST(ts AS TIMESTAMP) AS timestamp", "name", "labels", "value"
    )
    ClickHouseHttpSink(
        CLICKHOUSE_URL, metrics_table, distributed=True
    ).write(rows)

    got = _execute(
        f"SELECT name, toString(timestamp), labels.key, labels.value, value "
        f"FROM {metrics_table} ORDER BY name FORMAT TSV"
    ).strip().split("\n")
    assert len(got) == 2
    first = got[0].split("\t")
    assert first[0] == "http_requests_total"
    assert first[1] == "2024-01-02 03:04:05.123456"
    assert first[2] == "['instance','job']"  # key-sorted parallel arrays
    assert first[3] == "['i-1','api']"
    assert float(first[4]) == 1.5
    assert got[1].split("\t")[4] == "inf"


def test_q1_lease_and_state_round_trip(spark, etl_table):
    """Q1/K2/S2: atomic lease acquisition, one-holder semantics, and
    the versioned state insert + top-1-valid scan, against real
    ReplacingMergeTree FINAL behavior."""
    from etl_prometheus2clickhouse_spark.sources.state_store import (
        ClickHouseStateStore,
        StateRow,
    )

    store = ClickHouseStateStore(CLICKHOUSE_URL, etl_table)
    t0 = int(time.time()) // 60 * 60

    assert store.get_state() is None
    assert store.has_running_job() is False
    assert store.try_mark_start(t0) is True
    assert store.has_running_job() is True
    # second acquisition while the lease is held must fail
    assert store.try_mark_start(t0 + 60) is False

    store.save_state(
        StateRow(
            timestamp_start=t0,
            timestamp_end=t0 + 300,
            timestamp_progress=t0 + 240,
            batch_window_seconds=300,
            batch_rows=123,
            batch_skipped_count=4,
        )
    )
    got = store.get_state()
    assert got is not None
    assert (got.timestamp_start, got.timestamp_end, got.timestamp_progress) == (
        t0,
        t0 + 300,
        t0 + 240,
    )
    assert (got.batch_window_seconds, got.batch_rows, got.batch_skipped_count) == (
        300,
        123,
        4,
    )


# ---------------------------------------------------------------------------
# Full run_once loop — the ordered pipeline (lease → fetch → insert →
# state) against the live stack. The reference's whole contract is this
# ordering (etl_job.py:65-186; failure matrix tests/test_etl_job.py:
# 611-665): data write strictly precedes state write, so a failed state
# save leaves data landed and progress unmoved.
# ---------------------------------------------------------------------------

PROMETHEUS_URL = os.environ.get("PROMETHEUS_URL")


def _prometheus_reachable() -> bool:
    if not PROMETHEUS_URL:
        return False
    try:
        req = urllib.request.Request(
            f"{PROMETHEUS_URL.rstrip('/')}/api/v1/query?"
            + urllib.parse.urlencode({"query": "1"})
        )
        with urllib.request.urlopen(req, timeout=5) as resp:  # nosec B310
            return resp.status == 200
    except (urllib.error.URLError, OSError, ValueError):
        return False


def _fetch_for_test(spark):
    """Live Prometheus when reachable, else a synthetic in-memory
    series frame in the exact FetchFn shape — the full CH-side
    pipeline (lease, TSV insert, versioned state) is live either way;
    only the Extract source degrades to synthetic."""
    if _prometheus_reachable():
        from etl_prometheus2clickhouse_spark.sources.prometheus import (
            make_fetch_fn,
        )

        return make_fetch_fn(url=PROMETHEUS_URL, partitions=1)

    def fetch(spark_, ws, we, step):
        rows = [
            (
                {"__name__": "up", "instance": "i-1", "job": "live-test"},
                [[f"{float(t):.3f}", "1"] for t in range(ws, we, step)],
            ),
            (
                {"__name__": "errs", "instance": "i-1"},
                [
                    [f"{float(ws):.3f}", "oops"],
                    [f"{float(ws + step):.3f}", "NaN"],
                ],
            ),
        ]
        return spark_.createDataFrame(
            rows, "metric map<string,string>, values array<array<string>>"
        )

    return fetch


def _count(table: str) -> int:
    return int(_execute(f"SELECT count() FROM {table}").strip())


def test_full_run_once_ordered_pipeline(spark, metrics_table, etl_table):
    """run_once end-to-end against live ClickHouse: lease acquired and
    released, rows landed via the distributed TSV sink, progress
    advanced in the versioned state table — the ordered pipeline the
    reference runs (etl_job.py:65-186), through the same EtlBatchJob
    that main._run_batch wires."""
    from etl_prometheus2clickhouse_spark.sinks.clickhouse_sink import (
        ClickHouseHttpSink,
    )
    from etl_prometheus2clickhouse_spark.sources.state_store import (
        ClickHouseStateStore,
    )
    from etl_prometheus2clickhouse_spark.streaming.job import (
        EtlBatchJob,
        bootstrap_progress,
    )

    store = ClickHouseStateStore(CLICKHOUSE_URL, etl_table)
    now = int(time.time())
    bootstrap_progress(store, progress=now - 600, now=now - 601)

    job = EtlBatchJob(
        spark,
        state=store,
        fetch=_fetch_for_test(spark),
        sink=ClickHouseHttpSink(CLICKHOUSE_URL, metrics_table, distributed=True),
        window_size_seconds=300,
        query_step_seconds=15,
        now_fn=lambda: int(time.time()),
    )
    result = job.run_once()

    assert result.window_start == now - 600
    assert result.window_end == now - 300
    # data landed (synthetic fetch: 20 'up' samples + 1 NaN row; the
    # 'oops' sample is skipped-not-dropped; live Prometheus: whatever
    # the server returned)
    assert _count(metrics_table) == result.rows_count
    if not _prometheus_reachable():
        assert result.rows_count == 21
        assert result.skipped_count == 1
        assert result.series_count == 2
    # progress advanced, lease closed
    st = store.get_state()
    assert st is not None and st.timestamp_progress == result.new_progress
    assert result.new_progress == result.window_end
    assert store.has_running_job() is False
    # a second run starts cleanly from the new watermark (sleep past
    # the second boundary: timestamp_start is the state-row KEY, and a
    # same-second rerun would collide with the just-closed row under
    # ReplacingMergeTree versioning)
    time.sleep(1.1)
    result2 = job.run_once()
    assert result2.window_start == result.new_progress


def test_failed_state_save_preserves_progress(spark, metrics_table, etl_table):
    """The reference's failure-ordering invariant (etl_job.py:74-79;
    tests/test_etl_job.py:611-665): a state-save failure AFTER the
    data write leaves the rows landed, the progress watermark unmoved,
    and the lease open (blocking the next run) — at-least-once with
    storage-side dedup, never lost data, never phantom progress."""
    from etl_prometheus2clickhouse_spark.sinks.clickhouse_sink import (
        ClickHouseHttpSink,
    )
    from etl_prometheus2clickhouse_spark.sources.state_store import (
        ClickHouseStateStore,
    )
    from etl_prometheus2clickhouse_spark.streaming.job import (
        EtlBatchJob,
        bootstrap_progress,
    )

    class FailingSaveStore(ClickHouseStateStore):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.fail_saves = False

        def save_state(self, row):
            if self.fail_saves:
                raise ConnectionError("injected state-save failure")
            return super().save_state(row)

    store = FailingSaveStore(CLICKHOUSE_URL, etl_table)
    now = int(time.time())
    bootstrap_progress(store, progress=now - 600, now=now - 601)
    store.fail_saves = True

    job = EtlBatchJob(
        spark,
        state=store,
        fetch=_fetch_for_test(spark),
        sink=ClickHouseHttpSink(CLICKHOUSE_URL, metrics_table, distributed=True),
        window_size_seconds=300,
        query_step_seconds=15,
    )
    with pytest.raises(ConnectionError, match="injected"):
        job.run_once()

    # data landed...
    assert _count(metrics_table) > 0
    # ...but progress did not move...
    st = store.get_state()
    assert st is not None and st.timestamp_progress == now - 600
    # ...and the lease is still open, so the next run is blocked
    assert store.has_running_job() is True
    with pytest.raises(RuntimeError, match="cannot start"):
        job.run_once()


def test_main_run_batch_against_live_stack(metrics_table, etl_table):
    """The outermost wiring: main._run_batch builds session, state
    store, sink and fetch fn from Config and drives the same ordered
    pipeline. Needs BOTH live services (real Prometheus fetch), so it
    carries its own skip on top of the module's ClickHouse gate."""
    if not _prometheus_reachable():
        pytest.skip("PROMETHEUS_URL unset or unreachable")

    from etl_prometheus2clickhouse_spark.config import (
        ClickHouseConfig,
        Config,
        EtlConfig,
        PrometheusConfig,
    )
    from etl_prometheus2clickhouse_spark.main import _run_batch
    from etl_prometheus2clickhouse_spark.sources.state_store import (
        ClickHouseStateStore,
    )
    from etl_prometheus2clickhouse_spark.streaming.job import (
        bootstrap_progress,
    )

    store = ClickHouseStateStore(CLICKHOUSE_URL, etl_table)
    now = int(time.time())
    bootstrap_progress(store, progress=now - 600, now=now - 601)

    config = Config(
        prometheus=PrometheusConfig(url=PROMETHEUS_URL),
        clickhouse=ClickHouseConfig(
            url=CLICKHOUSE_URL,
            table_metrics=metrics_table,
            table_etl=etl_table,
        ),
        etl=EtlConfig(batch_window_size_seconds=300),
    )
    _run_batch(config)

    st = store.get_state()
    assert st is not None and st.timestamp_progress == now - 300
    assert store.has_running_job() is False
