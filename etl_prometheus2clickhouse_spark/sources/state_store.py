"""Watermark/lease state store (reference clickhouse_client.py:219-693).

The reference persists ETL state *in ClickHouse itself*: an append-only
``ReplacingMergeTree`` keyed by ``timestamp_start`` where "update" means
"insert a newer version" and reads use ``FINAL`` to collapse. The lease is
a conditional insert (open lease = row with ``timestamp_end IS NULL``).

Two backends behind one protocol:

- :class:`LocalStateStore` — append-only JSON-lines file with an fcntl
  lock for lease atomicity. Read-side collapse uses the same
  latest-version-per-key rule. This is what tests/bench use, and it is
  exactly the Structured-Streaming-offset-log shape (one JSON doc per
  epoch), so the streaming job reuses it as its offset/commit log.
- :class:`ClickHouseStateStore` — wire-compatible with the reference's
  state table over the ClickHouse HTTP interface (stdlib urllib only; no
  extra deps). Reuses the reference's query semantics: conditional-insert
  lease acquire with verify-readback (clickhouse_client.py:611-665), S2
  top-1 state scan (clickhouse_client.py:247-261).

Identifier validation (U1, reference clickhouse_client.py:296-331) guards
every interpolated table name in both backends.
"""

from __future__ import annotations

import calendar
import fcntl
import json
import os
import re
import time
import urllib.parse
import urllib.request
from dataclasses import asdict, dataclass
from typing import Protocol

_TABLE_RE = re.compile(r"^[A-Za-z0-9_]+(\.[A-Za-z0-9_]+)?$")


def validate_table_name(table: str, field: str = "table") -> None:
    """Injection guard for identifiers interpolated into SQL
    (reference clickhouse_client.py:296-331): ``[A-Za-z0-9_]+`` parts,
    at most one dot, both parts non-empty."""
    if not table or not _TABLE_RE.match(table):
        raise ValueError(f"Invalid {field} name: {table!r}")


@dataclass
class StateRow:
    """One state-table row (reference README.md:162-178); epoch seconds."""

    timestamp_start: int
    timestamp_end: int | None = None
    timestamp_progress: int | None = None
    batch_window_seconds: int | None = None
    batch_rows: int | None = None
    batch_skipped_count: int | None = None
    version: int = 0


class StateStore(Protocol):
    """The contract the ETL job drives (SURVEY.md §2 S2/A2/Q1/K2)."""

    def get_state(self) -> StateRow | None: ...  # S2 top-1 valid state
    def has_running_job(self) -> bool: ...  # A2 lease scan
    def try_mark_start(self, timestamp_start: int) -> bool: ...  # Q1 lease
    def save_state(self, row: StateRow) -> None: ...  # K2 versioned insert
    def all_rows(self) -> list[StateRow]: ...  # unmerged history


def _latest_per_key(rows: list[StateRow]) -> list[StateRow]:
    """ReplacingMergeTree FINAL semantics: newest version per
    timestamp_start."""
    latest: dict[int, StateRow] = {}
    for r in rows:
        cur = latest.get(r.timestamp_start)
        if cur is None or r.version >= cur.version:
            latest[r.timestamp_start] = r
    return list(latest.values())


def _get_state_from(rows: list[StateRow]) -> StateRow | None:
    """S2: filter valid, order by start desc, top-1
    (reference clickhouse_client.py:247-261)."""
    valid = [
        r
        for r in _latest_per_key(rows)
        if r.timestamp_progress is not None
        and r.timestamp_end is not None
        and r.timestamp_end > r.timestamp_start
    ]
    if not valid:
        return None
    return max(valid, key=lambda r: r.timestamp_start)


class LocalStateStore:
    """Append-only JSONL state log with POSIX-lock lease atomicity."""

    def __init__(self, path: str) -> None:
        self._path = path
        # max version seen by THIS process; None until first read. Keeps
        # save_state O(1) per append instead of re-reading the whole log
        # (other writers are serialized through the .lock file for lease
        # ops; plain save_state is same-process per the job lifecycle, so
        # a cached high-water mark is safe and monotonic).
        self._max_version: int | None = None
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)

    # -- read side ---------------------------------------------------------

    def all_rows(self) -> list[StateRow]:
        if not os.path.exists(self._path):
            return []
        rows: list[StateRow] = []
        with open(self._path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(StateRow(**json.loads(line)))
        return rows

    def get_state(self) -> StateRow | None:
        return _get_state_from(self.all_rows())

    def has_running_job(self) -> bool:
        return any(
            r.timestamp_end is None for r in _latest_per_key(self.all_rows())
        )

    # -- write side --------------------------------------------------------

    def _append(self, row: StateRow) -> None:
        with open(self._path, "a", encoding="utf-8") as f:
            f.write(json.dumps(asdict(row)) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._max_version = max(self._max_version or 0, row.version)

    def _next_version(self, rows: list[StateRow] | None = None) -> int:
        if self._max_version is None:
            rows = self.all_rows() if rows is None else rows
            self._max_version = max((r.version for r in rows), default=0)
        return 1 + self._max_version

    def try_mark_start(self, timestamp_start: int) -> bool:
        """Atomic lease acquire: under an exclusive file lock, re-check
        no-open-lease then append the open-lease row — the local
        equivalent of the reference's conditional INSERT + verify-readback
        (clickhouse_client.py:611-665)."""
        lock_path = self._path + ".lock"
        with open(lock_path, "w") as lock_f:
            fcntl.flock(lock_f.fileno(), fcntl.LOCK_EX)
            try:
                rows = self.all_rows()
                # authoritative read under the lock: refresh the cached
                # high-water mark so versions from OTHER processes are
                # never reused
                self._max_version = max((r.version for r in rows), default=0)
                if any(r.timestamp_end is None for r in _latest_per_key(rows)):
                    return False
                self._append(
                    StateRow(
                        timestamp_start=timestamp_start,
                        version=self._next_version(),
                    )
                )
                return True
            finally:
                fcntl.flock(lock_f.fileno(), fcntl.LOCK_UN)

    def save_state(self, row: StateRow) -> None:
        """Versioned append — "update" is insert-newer-version, exactly the
        reference's ReplacingMergeTree write model
        (clickhouse_client.py:333-438). O(1) per append: the version
        high-water mark is cached in-process after the first read."""
        row.version = self._next_version()
        self._append(row)


class ClickHouseStateStore:
    """Reference-wire-compatible state store over ClickHouse HTTP.

    Emits the same SQL shapes as the reference (S2 scan
    clickhouse_client.py:247-261; lease conditional insert
    clickhouse_client.py:611-622; verify-readback 628-665). Not exercised
    by CI here (no ClickHouse server in the environment); kept thin and
    stdlib-only so it can run on a cluster edge node unchanged.
    """

    def __init__(
        self,
        url: str,
        table: str = "default.etl",
        user: str | None = None,
        password: str | None = None,
        timeout: int = 10,
        insecure: bool = False,
    ) -> None:
        validate_table_name(table, "table_etl")
        self._url = url.rstrip("/")
        self._table = table
        self._user = user
        self._password = password
        self._timeout = timeout
        self._insecure = insecure

    def _execute(self, query: str) -> str:
        params = {"query": query}
        req = urllib.request.Request(
            f"{self._url}/?{urllib.parse.urlencode(params)}", method="POST"
        )
        if self._user is not None:
            req.add_header("X-ClickHouse-User", self._user)
            req.add_header("X-ClickHouse-Key", self._password or "")
        # CLICKHOUSE_INSECURE parity (reference clickhouse_client.py:55-85).
        ctx = None
        if self._insecure and self._url.startswith("https"):
            import ssl

            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        with urllib.request.urlopen(  # nosec B310
            req, timeout=self._timeout, context=ctx
        ) as resp:
            return resp.read().decode("utf-8")

    def all_rows(self) -> list[StateRow]:
        out = self._execute(
            f"SELECT timestamp_start, timestamp_end, timestamp_progress, "
            f"batch_window_seconds, batch_rows, batch_skipped_count "
            f"FROM {self._table} ORDER BY timestamp_start FORMAT JSONEachRow"
        )
        rows = []
        for i, line in enumerate(out.splitlines()):
            if not line.strip():
                continue
            d = json.loads(line)
            rows.append(
                StateRow(
                    timestamp_start=_to_epoch(d["timestamp_start"]),
                    timestamp_end=_opt_epoch(d.get("timestamp_end")),
                    timestamp_progress=_opt_epoch(d.get("timestamp_progress")),
                    batch_window_seconds=d.get("batch_window_seconds"),
                    batch_rows=d.get("batch_rows"),
                    batch_skipped_count=d.get("batch_skipped_count"),
                    version=i,
                )
            )
        return rows

    def get_state(self) -> StateRow | None:
        # Delegate the S2 filter/sort/limit to ClickHouse, like the
        # reference does (pushdown; clickhouse_client.py:247-261).
        out = self._execute(
            f"SELECT toUnixTimestamp(timestamp_start) AS ts, "
            f"toUnixTimestamp(timestamp_end) AS te, "
            f"toUnixTimestamp(timestamp_progress) AS tp, "
            f"batch_window_seconds, batch_rows, batch_skipped_count "
            f"FROM {self._table} FINAL "
            f"WHERE timestamp_progress IS NOT NULL "
            f"AND timestamp_end IS NOT NULL AND timestamp_end > timestamp_start "
            f"ORDER BY timestamp_start DESC LIMIT 1 FORMAT JSONEachRow"
        )
        line = out.strip()
        if not line:
            return None
        d = json.loads(line.splitlines()[0])
        return StateRow(
            timestamp_start=int(d["ts"]),
            timestamp_end=int(d["te"]),
            timestamp_progress=int(d["tp"]),
            batch_window_seconds=d.get("batch_window_seconds"),
            batch_rows=d.get("batch_rows"),
            batch_skipped_count=d.get("batch_skipped_count"),
        )

    def has_running_job(self) -> bool:
        out = self._execute(
            f"SELECT count() FROM {self._table} FINAL "
            f"WHERE timestamp_end IS NULL"
        )
        return int(out.strip() or "0") > 0

    def try_mark_start(self, timestamp_start: int) -> bool:
        """Conditional insert + verify-readback + exactly-one-holder check
        (reference clickhouse_client.py:536-693)."""
        self._execute(
            f"INSERT INTO {self._table} (timestamp_start) "
            f"SELECT toDateTime({int(timestamp_start)}) "
            f"WHERE (SELECT count() FROM {self._table} FINAL "
            f"WHERE timestamp_end IS NULL) = 0"
        )
        verify = self._execute(
            f"SELECT count() FROM {self._table} "
            f"WHERE timestamp_start = toDateTime({int(timestamp_start)}) "
            f"AND timestamp_end IS NULL"
        )
        if int(verify.strip() or "0") == 0:
            return False
        holders = self._execute(
            f"SELECT count(DISTINCT timestamp_start) FROM {self._table} FINAL "
            f"WHERE timestamp_end IS NULL"
        )
        return int(holders.strip() or "0") == 1

    def save_state(self, row: StateRow) -> None:
        cols = ["timestamp_start"]
        vals = [f"toDateTime({int(row.timestamp_start)})"]
        if row.timestamp_end is not None:
            cols.append("timestamp_end")
            vals.append(f"toDateTime({int(row.timestamp_end)})")
        if row.timestamp_progress is not None:
            cols.append("timestamp_progress")
            vals.append(f"toDateTime({int(row.timestamp_progress)})")
        for col in ("batch_window_seconds", "batch_rows", "batch_skipped_count"):
            v = getattr(row, col)
            if v is not None:
                cols.append(col)
                vals.append(str(int(v)))
        self._execute(
            f"INSERT INTO {self._table} ({', '.join(cols)}) "
            f"VALUES ({', '.join(vals)})"
        )


def _to_epoch(v) -> int:
    """ClickHouse UTC DateTime string → epoch seconds.

    ``calendar.timegm`` is timezone-independent; ``time.mktime(...) -
    time.timezone`` would be off by one hour while the driver host's
    local zone observes DST (the reference normalizes strictly via UTC,
    clickhouse_client.py:96-129)."""
    if isinstance(v, (int, float)):
        return int(v)
    return calendar.timegm(time.strptime(str(v)[:19], "%Y-%m-%d %H:%M:%S"))


def _opt_epoch(v) -> int | None:
    return None if v is None else _to_epoch(v)
