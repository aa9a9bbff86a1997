"""ClickHouse wire protocol over a REAL socket — un-gated in every run.

The live module (tests/test_clickhouse_live.py) needs a daemon and skips
in this environment, which left K1/Q1 pinned by request-recording mocks
plus the byte-level tsv_lines oracle. This module ports the live
matrix — round-trip insert, lease protocol, the ordered ``run_once``
pipeline, and the reference's failure-ordering invariant
(/root/reference/tests/test_etl_job.py:611-665) — against
:class:`tests.fake_clickhouse.FakeClickHouse`, a stdlib ``http.server``
thread that speaks the exact HTTP surface the reference exercises
(/root/reference/clickhouse_client.py:131-217 insert, :219-294 state):
``query`` URL param, INSERT ``FORMAT TabSeparated`` bodies captured
byte-for-byte, the state SELECT protocol with ReplacingMergeTree FINAL
semantics, ``X-ClickHouse-User``/``Key`` auth, injected HTTP 500s.

Everything here crosses a real 127.0.0.1 socket through the production
urllib clients — including the executor-side POSTs of the distributed
``mapInPandas`` sink. The live module stays for the day a real daemon
exists; these tests run always.
"""

from __future__ import annotations

import time
import urllib.error

import pytest

from etl_prometheus2clickhouse_spark.sinks.clickhouse_sink import (
    ClickHouseHttpSink,
    rows_to_tsv_lines,
)
from etl_prometheus2clickhouse_spark.sources.state_store import (
    ClickHouseStateStore,
    StateRow,
)
from etl_prometheus2clickhouse_spark.streaming.job import (
    EtlBatchJob,
    bootstrap_progress,
)
from tests.fake_clickhouse import FakeClickHouse


@pytest.fixture()
def ch():
    with FakeClickHouse() as server:
        server.create_metrics_table("default.metrics_wt")
        server.create_etl_table("default.etl_wt")
        yield server


def _metric_rows(spark):
    """The live module's K1 fixture rows: µs timestamps, a name that
    needs TSV escaping, unsorted labels, an Inf value."""
    return spark.createDataFrame(
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


def _fetch_synthetic(spark_, ws, we, step):
    """The live module's synthetic FetchFn: 20 castable 'up' samples,
    one skipped 'oops', one NaN (kept — skipped ≠ structurally
    dropped)."""
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


# ---------------------------------------------------------------------------
# K1: distributed TSV insert
# ---------------------------------------------------------------------------


def test_k1_tsv_insert_round_trip(spark, ch):
    """The mapInPandas sink's executor-side POSTs land rows a
    TabSeparated parser reads back with values, µs timestamps, and
    key-sorted parallel label arrays intact (live-module port)."""
    rows = _metric_rows(spark)
    ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=True).write(
        rows
    )

    import urllib.parse
    import urllib.request

    def _execute(query: str) -> str:
        req = urllib.request.Request(
            f"{ch.url}/?" + urllib.parse.urlencode({"query": query}),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=5) as resp:
            return resp.read().decode()

    got = (
        _execute(
            "SELECT name, toString(timestamp), labels.key, labels.value, "
            "value FROM default.metrics_wt ORDER BY name FORMAT TSV"
        )
        .strip()
        .split("\n")
    )
    assert len(got) == 2
    first = got[0].split("\t")
    assert first[0] == "http_requests_total"
    assert first[1] == "2024-01-02 03:04:05.123456"
    assert first[2] == "['instance','job']"  # key-sorted parallel arrays
    assert first[3] == "['i-1','api']"
    assert float(first[4]) == 1.5
    assert got[1].split("\t")[4] == "inf"

    # byte-level: the POSTed bodies are exactly the tsv_lines oracle
    # rows (as a set — the distributed sink posts per partition)
    posted = set()
    for query, body in ch.inserts:
        assert query == "INSERT INTO default.metrics_wt FORMAT TabSeparated"
        assert body.endswith(b"\n")
        posted.update(body.decode().rstrip("\n").split("\n"))
    expected = {r.line for r in rows_to_tsv_lines(rows).collect()}
    assert posted == expected


def test_k1_replay_is_idempotent_under_final(spark, ch):
    """At-least-once POSTs, exactly-once effect: a replayed batch is
    visible raw (pre-merge) but collapses under FINAL — the
    ReplacingMergeTree contract the reference relies on
    (README.md:96-113)."""
    rows = _metric_rows(spark)
    sink = ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=True)
    sink.write(rows)
    sink.write(rows)  # replay
    t = ch.metrics["default.metrics_wt"]
    assert len(t.rows) == 4  # raw: at-least-once is visible
    assert len(t.final_rows()) == 2  # FINAL: exactly-once effect


def test_k1_dedup_token_drops_replayed_block_before_final(spark, ch):
    """dedup_tokens=True: every POST carries a content-addressed
    ``insert_deduplication_token`` (md5 of the body), so a replayed
    identical block is dropped SERVER-SIDE inside the deduplication
    window — raw (pre-merge) rows stay exactly-once, without waiting
    for the ReplacingMergeTree FINAL collapse. Belt-and-braces on top
    of the content-hash RMT contract, on both write paths."""
    rows = _metric_rows(spark)
    for distributed in (True, False):
        server = FakeClickHouse()
        with server:
            server.create_metrics_table("default.metrics_wt")
            sink = ClickHouseHttpSink(
                server.url, "default.metrics_wt",
                distributed=distributed, dedup_tokens=True,
            )
            sink.write(rows)
            sink.write(rows)  # replay: identical bodies, same tokens
            t = server.metrics["default.metrics_wt"]
            assert len(t.rows) == 2, distributed  # raw already deduped
            assert len(t.final_rows()) == 2, distributed
            # every insert carried a token; the replay reused it
            assert len(server.insert_tokens) == len(server.inserts)
            assert all(tok for tok in server.insert_tokens), (
                server.insert_tokens
            )
            import hashlib

            for (_, body), tok in zip(
                server.inserts, server.insert_tokens
            ):
                assert tok == hashlib.md5(body).hexdigest()


def test_k1_no_token_without_opt_in(spark, ch):
    """The default sink sends NO dedup token (the reference's wire
    shape, byte-for-byte) and replay stays at-least-once raw."""
    rows = _metric_rows(spark)
    sink = ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=True)
    sink.write(rows)
    assert ch.insert_tokens == [None] * len(ch.inserts)


def test_k1_empty_batch_short_circuits(spark, ch):
    """Empty batches never touch the network
    (clickhouse_client.py:166-170 parity), on both write paths."""
    empty = _metric_rows(spark).limit(0)
    ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=True).write(
        empty
    )
    ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=False).write(
        empty
    )
    assert ch.inserts == []


def test_k1_driver_path_single_byte_identical_upload(spark, ch):
    """distributed=False posts ONE body byte-identical to the
    tsv_lines serialization — the reference's single --data-binary
    upload shape."""
    rows = _metric_rows(spark)
    ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=False).write(
        rows
    )
    assert len(ch.inserts) == 1
    _, body = ch.inserts[0]
    expected = (
        "\n".join(r.line for r in rows_to_tsv_lines(rows).collect()) + "\n"
    ).encode()
    assert body == expected


# ---------------------------------------------------------------------------
# Q1/K2/S2: lease + versioned state over the socket
# ---------------------------------------------------------------------------


def test_q1_lease_and_state_round_trip(ch):
    """Atomic lease acquisition, one-holder semantics, and the
    versioned state insert + top-1-valid scan against FINAL collapse
    (live-module port)."""
    store = ClickHouseStateStore(ch.url, "default.etl_wt")
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
    assert (
        got.timestamp_start,
        got.timestamp_end,
        got.timestamp_progress,
    ) == (t0, t0 + 300, t0 + 240)
    assert (
        got.batch_window_seconds,
        got.batch_rows,
        got.batch_skipped_count,
    ) == (300, 123, 4)


def test_state_all_rows_parses_datetime_strings(ch):
    """all_rows exercises the DateTime-string JSONEachRow path
    (state_store._to_epoch's timezone-independent strptime branch)."""
    store = ClickHouseStateStore(ch.url, "default.etl_wt")
    store.save_state(StateRow(timestamp_start=1700000000))
    store.save_state(
        StateRow(timestamp_start=1700000300, timestamp_end=1700000600)
    )
    rows = store.all_rows()
    assert [r.timestamp_start for r in rows] == [1700000000, 1700000300]
    assert rows[0].timestamp_end is None
    assert rows[1].timestamp_end == 1700000600


# ---------------------------------------------------------------------------
# full run_once — the ordered pipeline over the socket
# ---------------------------------------------------------------------------


def test_full_run_once_ordered_pipeline(spark, ch):
    """run_once end-to-end: lease acquired and released, rows landed
    via the distributed TSV sink, progress advanced in the versioned
    state table — the ordered pipeline the reference runs
    (etl_job.py:65-186), live-module port."""
    store = ClickHouseStateStore(ch.url, "default.etl_wt")
    now = int(time.time())
    bootstrap_progress(store, progress=now - 600, now=now - 601)

    job = EtlBatchJob(
        spark,
        state=store,
        fetch=_fetch_synthetic,
        sink=ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=True),
        window_size_seconds=300,
        query_step_seconds=15,
        now_fn=lambda: int(time.time()),
    )
    result = job.run_once()

    assert result.window_start == now - 600
    assert result.window_end == now - 300
    assert result.rows_count == 21
    assert result.skipped_count == 1
    assert result.series_count == 2
    assert len(ch.metrics["default.metrics_wt"].rows) == 21
    # progress advanced, lease closed
    st = store.get_state()
    assert st is not None and st.timestamp_progress == result.new_progress
    assert result.new_progress == result.window_end
    assert store.has_running_job() is False
    # a second run starts cleanly from the new watermark (sleep past
    # the second boundary: timestamp_start is the state-row KEY)
    time.sleep(1.1)
    result2 = job.run_once()
    assert result2.window_start == result.new_progress


def test_failed_state_save_preserves_progress(spark, ch):
    """The reference's failure-ordering invariant (etl_job.py:74-79;
    tests/test_etl_job.py:611-665), with the failure injected as a
    real HTTP 500 on the wire instead of a Python-side raise: a
    state-save failure AFTER the data write leaves the rows landed,
    the progress watermark unmoved, and the lease open (blocking the
    next run)."""
    store = ClickHouseStateStore(ch.url, "default.etl_wt")
    now = int(time.time())
    bootstrap_progress(store, progress=now - 600, now=now - 601)
    # arm AFTER bootstrap: only save_state uses the VALUES insert (the
    # lease acquire is INSERT ... SELECT toDateTime)
    ch.fail_on(r"VALUES", times=1)

    job = EtlBatchJob(
        spark,
        state=store,
        fetch=_fetch_synthetic,
        sink=ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=True),
        window_size_seconds=300,
        query_step_seconds=15,
    )
    with pytest.raises(urllib.error.HTTPError):
        job.run_once()

    # data landed...
    assert len(ch.metrics["default.metrics_wt"].rows) == 21
    # ...but progress did not move...
    st = store.get_state()
    assert st is not None and st.timestamp_progress == now - 600
    # ...and the lease is still open, so the next run is blocked
    assert store.has_running_job() is True
    with pytest.raises(RuntimeError, match="cannot start"):
        job.run_once()


def test_failed_data_insert_blocks_progress(spark, ch):
    """The other arm of the matrix: a data-insert failure aborts the
    run BEFORE any state write — progress unmoved, lease open. The
    sink uses 1 partition here so one injected 500 fails the whole
    write (with N partitions a single 500 fails the job after sibling
    partitions may have posted — at-least-once, absorbed by storage
    dedup)."""
    store = ClickHouseStateStore(ch.url, "default.etl_wt")
    now = int(time.time())
    bootstrap_progress(store, progress=now - 600, now=now - 601)
    ch.fail_on(r"FORMAT TabSeparated", times=100)  # every data POST fails

    job = EtlBatchJob(
        spark,
        state=store,
        fetch=_fetch_synthetic,
        sink=ClickHouseHttpSink(ch.url, "default.metrics_wt", distributed=True),
        window_size_seconds=300,
        query_step_seconds=15,
    )
    with pytest.raises(Exception, match="HTTP Error 500|injected"):
        job.run_once()

    assert len(ch.metrics["default.metrics_wt"].rows) == 0
    st = store.get_state()
    assert st is not None and st.timestamp_progress == now - 600
    assert store.has_running_job() is True


# ---------------------------------------------------------------------------
# auth headers + loud unknown-query contract
# ---------------------------------------------------------------------------


def test_auth_headers_required_and_sent(spark):
    """The X-ClickHouse-User/Key header pair (clickhouse_client.py:87-94
    parity) is sent by BOTH clients — including the executor-side sink
    POSTs — and its absence is a loud 516."""
    with FakeClickHouse(user="etl", password="s3cret") as ch:
        ch.create_metrics_table("default.metrics_wt")
        ch.create_etl_table("default.etl_wt")

        store = ClickHouseStateStore(
            ch.url, "default.etl_wt", user="etl", password="s3cret"
        )
        assert store.try_mark_start(1700000000) is True

        sink = ClickHouseHttpSink(
            ch.url, "default.metrics_wt", user="etl", password="s3cret"
        )
        sink.write(_metric_rows(spark))
        assert len(ch.metrics["default.metrics_wt"].rows) == 2

        # missing credentials → HTTP 516, surfaced by the client
        anon = ClickHouseStateStore(ch.url, "default.etl_wt")
        with pytest.raises(urllib.error.HTTPError) as exc:
            anon.has_running_job()
        assert exc.value.code == 516

        wrong = ClickHouseHttpSink(
            ch.url, "default.metrics_wt", user="etl", password="nope"
        )
        with pytest.raises(Exception, match="516"):
            wrong.write(_metric_rows(spark))


def test_unknown_query_shape_is_loud(ch):
    """The fake answers ONLY the exact SQL shapes the clients emit —
    anything else is HTTP 501, so a silent client-side SQL drift can't
    fake-pass (the whitelist contract of tests/fake_clickhouse.py)."""
    import urllib.parse
    import urllib.request

    req = urllib.request.Request(
        f"{ch.url}/?"
        + urllib.parse.urlencode({"query": "SELECT sleep(1) FROM system.one"}),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=5)
    assert exc.value.code == 501
    assert b"unsupported query shape" in exc.value.read()


# ---------------------------------------------------------------------------
# outermost wiring: main._run_batch against the fake stack
# ---------------------------------------------------------------------------


def test_main_run_batch_against_fake_stack(spark):
    """main._run_batch builds session, state store, sink, and the
    partitioned Prometheus fetch from Config and drives the ordered
    pipeline — here against BOTH fakes (the live module needed two real
    daemons for this; the fake Prometheus serves deterministic
    query_range matrices, the fake ClickHouse the full state+insert
    protocol)."""
    from etl_prometheus2clickhouse_spark.config import (
        ClickHouseConfig,
        Config,
        EtlConfig,
        PrometheusConfig,
    )
    from etl_prometheus2clickhouse_spark.main import _run_batch
    from tests.http_fixtures import FakeServers

    with FakeServers() as prom, FakeClickHouse() as ch:
        ch.create_metrics_table("default.metrics_wt")
        ch.create_etl_table("default.etl_wt")
        store = ClickHouseStateStore(ch.url, "default.etl_wt")
        now = int(time.time())
        bootstrap_progress(store, progress=now - 600, now=now - 601)

        config = Config(
            prometheus=PrometheusConfig(url=prom.url),
            clickhouse=ClickHouseConfig(
                url=ch.url,
                table_metrics="default.metrics_wt",
                table_etl="default.etl_wt",
            ),
            etl=EtlConfig(batch_window_size_seconds=300),
        )
        _run_batch(config)

        st = store.get_state()
        assert st is not None and st.timestamp_progress == now - 300
        assert store.has_running_job() is False
        # the fake Prometheus emits 3 series × 21 instants
        assert len(ch.metrics["default.metrics_wt"].rows) == 63
        assert len(prom.prom_requests) >= 1
