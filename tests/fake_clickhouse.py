"""In-process fake ClickHouse HTTP server (stdlib only, no daemon).

The sandbox has no dockerd/containerd, so the live module
(tests/test_clickhouse_live.py) skips in every recorded run — but every
ClickHouse client in this repo is plain urllib over the HTTP interface
(sinks/clickhouse_sink.py:67-99, sources/state_store.py:209-228), which
means a stdlib ``http.server`` in a thread can exercise the REAL socket
path: URL ``query`` param parsing, INSERT ``FORMAT TabSeparated`` body
capture byte-for-byte, the state-table SQL protocol,
``X-ClickHouse-User``/``Key`` auth headers, and injected HTTP 500s.

Semantics emulated (the surface the reference exercises —
/root/reference/clickhouse_client.py:131-217 insert path, :219-294
state path; DDL shapes /root/reference/docker-compose.yml:157-199):

- **ReplacingMergeTree versioning**: inserts append raw rows; ``FINAL``
  collapses to the LAST-inserted row per ORDER BY key (etl state table:
  ``timestamp_start``; metrics table: (timestamp, name, label arrays)).
  Plain (non-FINAL) reads see raw pre-merge rows, like a real server
  before a background merge — so at-least-once delivery is visible raw
  and exactly-once is visible under FINAL, the reference's storage
  contract (README.md:96-113).
- **Query dispatch is an exact-shape whitelist**, not a SQL engine: the
  fake answers precisely the query shapes this repo's clients emit and
  returns HTTP 501 with the offending query for anything else — a
  client-side SQL change must consciously update the fake, it can never
  silently pass.

Fault injection: ``fail_on(pattern, times)`` makes the next ``times``
queries matching ``pattern`` return HTTP 500 with a ClickHouse-style
error body. Auth: construct with ``user``/``password`` to require the
reference's header pair on every request (HTTP 516 otherwise,
clickhouse_client.py:87-94 header parity).
"""

from __future__ import annotations

import re
import threading
import urllib.parse
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


@dataclass
class _MetricsTable:
    """Raw TSV field tuples (ts, name, keys, vals, value), append order.

    ``tokens`` is the block-deduplication window: a real server keeps
    the last N inserted blocks' hashes (``insert_deduplication_token``
    overrides the hash) and silently DROPS a re-inserted block whose
    token is still in the window — the at-least-once retry path."""

    rows: list[tuple[str, str, str, str, str]] = field(default_factory=list)
    tokens: list[str] = field(default_factory=list)

    def final_rows(self) -> list[tuple[str, str, str, str, str]]:
        # ReplacingMergeTree ORDER BY (timestamp, name, sorted labels):
        # last inserted row per key survives FINAL
        latest: dict[tuple[str, str, str, str], tuple] = {}
        for r in self.rows:
            latest[(r[0], r[1], r[2], r[3])] = r
        return list(latest.values())


@dataclass
class _EtlTable:
    """State rows as dicts; append order is the version order."""

    rows: list[dict] = field(default_factory=list)

    def final_rows(self) -> list[dict]:
        latest: dict[int, dict] = {}
        for r in self.rows:
            latest[r["timestamp_start"]] = r
        return list(latest.values())


_ETL_COLS = (
    "timestamp_start",
    "timestamp_end",
    "timestamp_progress",
    "batch_window_seconds",
    "batch_rows",
    "batch_skipped_count",
)


def _fmt_dt(epoch: int | None) -> None | str:
    if epoch is None:
        return None
    import datetime as _dt

    return _dt.datetime.fromtimestamp(epoch, _dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _parse_value(tok: str) -> int | None:
    tok = tok.strip()
    if tok.upper() == "NULL":
        return None
    m = re.fullmatch(r"toDateTime\((\d+)\)", tok)
    if m:
        return int(m.group(1))
    return int(tok)


class FakeClickHouse:
    """Threaded fake server; use as a context manager (``with`` starts
    and stops the HTTP thread). Tables are created via the same DDL
    strings the live tests send, or programmatically with
    :meth:`create_metrics_table` / :meth:`create_etl_table`."""

    def __init__(self, user: str | None = None, password: str | None = None):
        self.user = user
        self.password = password
        self.metrics: dict[str, _MetricsTable] = {}
        self.etl: dict[str, _EtlTable] = {}
        # byte-for-byte capture of every INSERT body: (query, raw body)
        self.inserts: list[tuple[str, bytes]] = []
        # the insert_deduplication_token URL param of each INSERT, in
        # the same order as ``inserts`` (None when the client sent none)
        self.insert_tokens: list[str | None] = []
        self.requests: list[str] = []  # every query string, in order
        self._fail_pattern: re.Pattern | None = None
        self._fail_times = 0
        self._lock = threading.RLock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence
                pass

            def _reply(self, code: int, body: str) -> None:
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self):  # noqa: N802
                parsed = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(parsed.query))
                query = q.get("query", "")
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                with outer._lock:
                    outer.requests.append(query)
                    if outer.user is not None and (
                        self.headers.get("X-ClickHouse-User") != outer.user
                        or self.headers.get("X-ClickHouse-Key")
                        != (outer.password or "")
                    ):
                        self._reply(
                            516,
                            "Code: 516. DB::Exception: default: "
                            "Authentication failed: password is incorrect, "
                            "or there is no user with such name.",
                        )
                        return
                    if (
                        outer._fail_times > 0
                        and outer._fail_pattern is not None
                        and outer._fail_pattern.search(query)
                    ):
                        outer._fail_times -= 1
                        self._reply(
                            500,
                            "Code: 999. DB::Exception: injected fault "
                            f"(query: {query[:80]})",
                        )
                        return
                    try:
                        out = outer._dispatch(
                            query, body,
                            q.get("insert_deduplication_token"),
                        )
                    except _Unknown as e:
                        self._reply(
                            501,
                            f"fake ClickHouse: unsupported query shape: {e}",
                        )
                        return
                    except Exception as e:  # loud, not silent
                        self._reply(500, f"Code: 1000. DB::Exception: {e}")
                        return
                self._reply(200, out)

            do_GET = do_POST  # the clients only POST, but be lenient

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- lifecycle ---------------------------------------------------------

    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def __enter__(self) -> "FakeClickHouse":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- test hooks --------------------------------------------------------

    def fail_on(self, pattern: str, times: int = 1) -> None:
        """Next ``times`` queries matching ``pattern`` get HTTP 500."""
        self._fail_pattern = re.compile(pattern)
        self._fail_times = times

    def create_metrics_table(self, name: str = "default.metrics") -> str:
        self.metrics[name] = _MetricsTable()
        return name

    def create_etl_table(self, name: str = "default.etl") -> str:
        self.etl[name] = _EtlTable()
        return name

    # -- the SQL surface ---------------------------------------------------

    def _dispatch(
        self, query: str, body: bytes, dedup_token: str | None = None
    ) -> str:
        qn = " ".join(query.split())  # normalize whitespace
        if qn == "SELECT 1":
            return "1\n"

        m = re.match(r"CREATE TABLE (\S+)", qn)
        if m:
            name = m.group(1)
            if "labels Nested" in qn:
                self.create_metrics_table(name)
            elif "timestamp_progress" in qn:
                self.create_etl_table(name)
            else:
                raise _Unknown(f"CREATE TABLE with unrecognized DDL: {qn}")
            return ""

        m = re.match(r"DROP TABLE (?:IF EXISTS )?(\S+)", qn)
        if m:
            self.metrics.pop(m.group(1), None)
            self.etl.pop(m.group(1), None)
            return ""

        m = re.match(r"INSERT INTO (\S+) FORMAT TabSeparated$", qn)
        if m:
            self.inserts.append((query, body))
            self.insert_tokens.append(dedup_token)
            t = self._metrics(m.group(1))
            if dedup_token is not None:
                if dedup_token in t.tokens:
                    return ""  # duplicate block in the window: dropped
                t.tokens.append(dedup_token)
                del t.tokens[:-100]  # the server's window is bounded
            for line in body.decode().split("\n"):
                if not line:
                    continue
                fields = line.split("\t")
                if len(fields) != 5:
                    raise ValueError(
                        f"TSV row has {len(fields)} fields, expected 5"
                    )
                t.rows.append(tuple(fields))
            return ""

        # conditional lease insert (state_store.try_mark_start)
        m = re.match(
            r"INSERT INTO (\S+) \(timestamp_start\) "
            r"SELECT toDateTime\((\d+)\) "
            r"WHERE \(SELECT count\(\) FROM (\S+) FINAL "
            r"WHERE timestamp_end IS NULL\) = 0$",
            qn,
        )
        if m:
            self.inserts.append((query, body))
            self.insert_tokens.append(dedup_token)
            t = self._etl(m.group(1))
            open_leases = [
                r for r in t.final_rows() if r["timestamp_end"] is None
            ]
            if not open_leases:
                t.rows.append(
                    dict.fromkeys(_ETL_COLS)
                    | {"timestamp_start": int(m.group(2))}
                )
            return ""

        # versioned state insert (state_store.save_state)
        m = re.match(r"INSERT INTO (\S+) \(([^)]+)\) VALUES \((.+)\)$", qn)
        if m:
            self.inserts.append((query, body))
            self.insert_tokens.append(dedup_token)
            t = self._etl(m.group(1))
            cols = [c.strip() for c in m.group(2).split(",")]
            vals = [_parse_value(v) for v in m.group(3).split(",")]
            bad = set(cols) - set(_ETL_COLS)
            if bad or len(cols) != len(vals):
                raise _Unknown(f"state INSERT columns {cols}")
            t.rows.append(dict.fromkeys(_ETL_COLS) | dict(zip(cols, vals)))
            return ""

        # -- state SELECT protocol (exact shapes from ClickHouseStateStore)
        m = re.match(
            r"SELECT count\(\) FROM (\S+) FINAL WHERE timestamp_end IS NULL$",
            qn,
        )
        if m:
            t = self._etl(m.group(1))
            n = sum(1 for r in t.final_rows() if r["timestamp_end"] is None)
            return f"{n}\n"

        m = re.match(
            r"SELECT count\(\) FROM (\S+) "
            r"WHERE timestamp_start = toDateTime\((\d+)\) "
            r"AND timestamp_end IS NULL$",
            qn,
        )
        if m:  # lease verify-readback: RAW rows, no FINAL
            t = self._etl(m.group(1))
            n = sum(
                1
                for r in t.rows
                if r["timestamp_start"] == int(m.group(2))
                and r["timestamp_end"] is None
            )
            return f"{n}\n"

        m = re.match(
            r"SELECT count\(DISTINCT timestamp_start\) FROM (\S+) FINAL "
            r"WHERE timestamp_end IS NULL$",
            qn,
        )
        if m:
            t = self._etl(m.group(1))
            n = len(
                {
                    r["timestamp_start"]
                    for r in t.final_rows()
                    if r["timestamp_end"] is None
                }
            )
            return f"{n}\n"

        m = re.match(
            r"SELECT toUnixTimestamp\(timestamp_start\) AS ts, "
            r"toUnixTimestamp\(timestamp_end\) AS te, "
            r"toUnixTimestamp\(timestamp_progress\) AS tp, "
            r"batch_window_seconds, batch_rows, batch_skipped_count "
            r"FROM (\S+) FINAL "
            r"WHERE timestamp_progress IS NOT NULL "
            r"AND timestamp_end IS NOT NULL "
            r"AND timestamp_end > timestamp_start "
            r"ORDER BY timestamp_start DESC LIMIT 1 FORMAT JSONEachRow$",
            qn,
        )
        if m:  # S2 top-1 valid state scan
            import json

            t = self._etl(m.group(1))
            valid = [
                r
                for r in t.final_rows()
                if r["timestamp_progress"] is not None
                and r["timestamp_end"] is not None
                and r["timestamp_end"] > r["timestamp_start"]
            ]
            if not valid:
                return ""
            r = max(valid, key=lambda r: r["timestamp_start"])
            return (
                json.dumps(
                    {
                        "ts": r["timestamp_start"],
                        "te": r["timestamp_end"],
                        "tp": r["timestamp_progress"],
                        "batch_window_seconds": r["batch_window_seconds"],
                        "batch_rows": r["batch_rows"],
                        "batch_skipped_count": r["batch_skipped_count"],
                    }
                )
                + "\n"
            )

        m = re.match(
            r"SELECT timestamp_start, timestamp_end, timestamp_progress, "
            r"batch_window_seconds, batch_rows, batch_skipped_count "
            r"FROM (\S+) ORDER BY timestamp_start FORMAT JSONEachRow$",
            qn,
        )
        if m:  # all_rows: raw history, DateTime as UTC strings (the
            # string-parsing path of state_store._to_epoch)
            import json

            t = self._etl(m.group(1))
            out = []
            for r in sorted(t.rows, key=lambda r: r["timestamp_start"]):
                out.append(
                    json.dumps(
                        {
                            "timestamp_start": _fmt_dt(r["timestamp_start"]),
                            "timestamp_end": _fmt_dt(r["timestamp_end"]),
                            "timestamp_progress": _fmt_dt(
                                r["timestamp_progress"]
                            ),
                            "batch_window_seconds": r["batch_window_seconds"],
                            "batch_rows": r["batch_rows"],
                            "batch_skipped_count": r["batch_skipped_count"],
                        }
                    )
                )
            return "\n".join(out) + ("\n" if out else "")

        # -- metrics-table reads used by the wire tests
        m = re.match(r"SELECT count\(\) FROM (\S+)( FINAL)?$", qn)
        if m:
            name = m.group(1)
            if name in self.metrics:
                t = self.metrics[name]
                rows = t.final_rows() if m.group(2) else t.rows
                return f"{len(rows)}\n"
            t = self._etl(name)
            rows = t.final_rows() if m.group(2) else t.rows
            return f"{len(rows)}\n"

        m = re.match(
            r"SELECT name, toString\(timestamp\), labels\.key, "
            r"labels\.value, value FROM (\S+)( FINAL)? "
            r"ORDER BY name FORMAT TSV$",
            qn,
        )
        if m:
            t = self._metrics(m.group(1))
            rows = t.final_rows() if m.group(2) else list(t.rows)
            rows.sort(key=lambda r: _tsv_unescape(r[1]))
            return "".join(
                "\t".join((r[1], _dt64_str(r[0]), r[2], r[3], r[4])) + "\n"
                for r in rows
            )

        raise _Unknown(qn)

    def _metrics(self, name: str) -> _MetricsTable:
        if name not in self.metrics:
            raise _Unknown(f"unknown metrics table {name}")
        return self.metrics[name]

    def _etl(self, name: str) -> _EtlTable:
        if name not in self.etl:
            raise _Unknown(f"unknown etl table {name}")
        return self.etl[name]


class _Unknown(Exception):
    pass


_UNESCAPES = {
    "\\t": "\t",
    "\\n": "\n",
    "\\r": "\r",
    "\\b": "\b",
    "\\f": "\f",
    "\\0": "\0",
    "\\'": "'",
    "\\\\": "\\",
}


def _dt64_str(epoch_6f: str) -> str:
    """The sink writes DateTime64(6) as ``%.6f`` epoch seconds
    (reference etl_job.py:726 wire shape); a real server parses that
    and ``toString`` renders the UTC datetime with exactly 6 fractional
    digits. Integer-exact: no float round-trip."""
    import datetime as _dt

    secs, _, frac = epoch_6f.partition(".")
    base = _dt.datetime.fromtimestamp(
        int(secs), _dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    return f"{base}.{(frac or '0'):0<6}"


def _tsv_unescape(s: str) -> str:
    return re.sub(
        r"\\.", lambda m: _UNESCAPES.get(m.group(0), m.group(0)), s
    )
