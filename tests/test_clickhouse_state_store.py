"""ClickHouseStateStore wire behavior against a query-aware fake
ClickHouse HTTP endpoint (sources/state_store.py; reference SQL shapes
clickhouse_client.py:247-261, 611-665)."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_prometheus2clickhouse_spark.sources.state_store import (
    ClickHouseStateStore,
    StateRow,
    _to_epoch,
)


class FakeClickHouse:
    """Answers the state store's exact SQL shapes from an in-memory
    row list; records every query received."""

    def __init__(self) -> None:
        self.rows: list[dict] = []
        self.queries: list[str] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # noqa: D102
                pass

            def do_POST(self):  # noqa: N802
                q = dict(
                    urllib.parse.parse_qsl(urllib.parse.urlparse(self.path).query)
                )["query"]
                outer.queries.append(q)
                body = outer._answer(q).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- minimal SQL interpreter for the five state-store query shapes --

    def _final(self) -> list[dict]:
        latest: dict[int, dict] = {}
        for r in self.rows:  # insertion order = version order
            latest[r["timestamp_start"]] = r
        return list(latest.values())

    def _answer(self, q: str) -> str:
        if q.startswith("INSERT"):
            if "SELECT toDateTime" in q:  # conditional lease insert
                open_leases = [
                    r for r in self._final() if r["timestamp_end"] is None
                ]
                if not open_leases:
                    ts = int(q.split("toDateTime(")[1].split(")")[0])
                    self.rows.append(
                        {"timestamp_start": ts, "timestamp_end": None,
                         "timestamp_progress": None}
                    )
            else:  # plain VALUES insert (save_state)
                cols = q.split("(")[1].split(")")[0].split(", ")
                vals_part = q.split("VALUES (")[1].rstrip(")")
                vals = [
                    int(v.replace("toDateTime(", "").rstrip(")"))
                    for v in vals_part.split(", ")
                ]
                row = {"timestamp_start": None, "timestamp_end": None,
                       "timestamp_progress": None}
                row.update(dict(zip(cols, vals)))
                self.rows.append(row)
            return ""
        if "count(DISTINCT timestamp_start)" in q:
            opens = {
                r["timestamp_start"]
                for r in self._final()
                if r["timestamp_end"] is None
            }
            return str(len(opens))
        if q.startswith("SELECT count()") and "timestamp_start = toDateTime" in q:
            ts = int(q.split("toDateTime(")[1].split(")")[0])
            n = sum(
                1
                for r in self.rows
                if r["timestamp_start"] == ts and r["timestamp_end"] is None
            )
            return str(n)
        if q.startswith("SELECT count()"):
            return str(
                sum(1 for r in self._final() if r["timestamp_end"] is None)
            )
        if "ORDER BY timestamp_start DESC LIMIT 1" in q:
            valid = [
                r
                for r in self._final()
                if r["timestamp_progress"] is not None
                and r["timestamp_end"] is not None
                and r["timestamp_end"] > r["timestamp_start"]
            ]
            if not valid:
                return ""
            r = max(valid, key=lambda x: x["timestamp_start"])
            return json.dumps(
                {
                    "ts": r["timestamp_start"],
                    "te": r["timestamp_end"],
                    "tp": r["timestamp_progress"],
                    "batch_window_seconds": r.get("batch_window_seconds"),
                    "batch_rows": r.get("batch_rows"),
                    "batch_skipped_count": r.get("batch_skipped_count"),
                }
            )
        if "FORMAT JSONEachRow" in q:  # all_rows: DateTime strings
            import datetime

            def dt(v):
                if v is None:
                    return None
                return datetime.datetime.fromtimestamp(
                    v, datetime.timezone.utc
                ).strftime("%Y-%m-%d %H:%M:%S")

            return "\n".join(
                json.dumps(
                    {
                        "timestamp_start": dt(r["timestamp_start"]),
                        "timestamp_end": dt(r["timestamp_end"]),
                        "timestamp_progress": dt(r["timestamp_progress"]),
                        "batch_window_seconds": r.get("batch_window_seconds"),
                        "batch_rows": r.get("batch_rows"),
                        "batch_skipped_count": r.get("batch_skipped_count"),
                    }
                )
                for r in sorted(self.rows, key=lambda x: x["timestamp_start"])
            )
        raise AssertionError(f"unexpected query shape: {q}")

    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._server.shutdown()
        self._server.server_close()


@pytest.fixture()
def ch():
    with FakeClickHouse() as fake:
        yield fake


def test_lease_acquire_conflict_and_release(ch):
    store = ClickHouseStateStore(ch.url, table="default.etl")
    assert not store.has_running_job()
    assert store.try_mark_start(1000)
    assert store.has_running_job()
    assert not store.try_mark_start(2000)  # lease held → conditional no-op
    # close the lease + record progress (versioned insert)
    store.save_state(
        StateRow(
            timestamp_start=1000, timestamp_end=1010, timestamp_progress=900,
            batch_window_seconds=300, batch_rows=42, batch_skipped_count=1,
        )
    )
    assert not store.has_running_job()
    st = store.get_state()
    assert (st.timestamp_start, st.timestamp_end, st.timestamp_progress) == (
        1000, 1010, 900,
    )
    assert st.batch_rows == 42 and st.batch_skipped_count == 1
    # next lease acquire succeeds after release
    assert store.try_mark_start(2000)


def test_get_state_empty_and_all_rows_datetime_parse(ch):
    store = ClickHouseStateStore(ch.url, table="default.etl")
    assert store.get_state() is None
    store.save_state(StateRow(timestamp_start=1700000000, timestamp_end=1700000100,
                              timestamp_progress=1699999000))
    rows = store.all_rows()
    assert rows[0].timestamp_start == 1700000000  # DateTime string → epoch
    assert rows[0].timestamp_progress == 1699999000


def test_table_name_validation():
    with pytest.raises(ValueError, match="table_etl"):
        ClickHouseStateStore("http://x", table="bad;drop")


def test_to_epoch_is_dst_independent():
    """calendar.timegm conversion: a UTC DateTime string maps to the
    same epoch regardless of the host's local timezone
    (reference timezone torture: tests/test_clickhouse_client.py:1200-1300)."""
    import os
    import time as time_mod

    assert _to_epoch("2024-07-01 12:00:00") == 1719835200  # UTC, mid-DST
    assert _to_epoch("2024-01-15 00:00:00") == 1705276800
    assert _to_epoch(12345) == 12345
    old = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "America/New_York"
        time_mod.tzset()
        assert _to_epoch("2024-07-01 12:00:00") == 1719835200
        os.environ["TZ"] = "Europe/Berlin"
        time_mod.tzset()
        assert _to_epoch("2024-07-01 12:00:00") == 1719835200
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time_mod.tzset()
