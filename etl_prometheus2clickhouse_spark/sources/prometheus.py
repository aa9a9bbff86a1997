"""Partitioned Prometheus ``query_range`` DataSource (Spark 4 Python
Data Source API).

Replaces the reference's single-threaded driver fetch
(prometheus_client.py:126-209: one giant HTTP request spooled to a temp
file) with a *partitioned* scan: the batch window is split into
``partitions`` step-aligned sub-windows, each fetched by its own Spark
task directly on an executor. At cluster scale this is the difference
between one 100 GB response through one socket and N parallel bounded
requests — the unit of parallelism the reference fundamentally lacks
(SURVEY.md §2 S1, §4 conclusion).

Rows leave the source already series-shaped
(``metric map<string,string>, values array<array<string>>``) with the
reference's exact JSON-shape semantics applied while Python still sees
JSON types (the one place the JVM from_json path can't match — see
operators/transform.py divergence note):

- non-string label values are DROPPED
  (reference tests/test_etl_job_full_coverage.py:81-98);
- scalar/object items inside ``values`` are ignored;
- numbers inside pairs become shortest-roundtrip literal text
  (``repr``), nulls/bools/objects become NULL — feeding the same
  downstream pair state machine as the JSON path.

The stream reader exposes ``timestamp_progress`` as the source offset:
the reference's watermark/lease protocol *is* a hand-rolled offset log,
so Structured Streaming's checkpointed offsets + an idempotent sink give
the same at-least-once + dedup = exactly-once-effect contract
(SURVEY.md §1.3, §3.3).
"""

from __future__ import annotations

import json
import ssl
import time
import urllib.error
import urllib.parse
import urllib.request
from base64 import b64encode
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SERIES_DDL = "metric map<string,string>, values array<array<string>>"
DEFAULT_SELECTOR = '{__name__=~".+"}'  # reference etl_job.py:437


class PrometheusQueryError(RuntimeError):
    """Prometheus fetch failure with a diagnosable message (reference
    prometheus_client.py:139-196 wraps HTTP/timeout/connection errors
    with a response-body preview)."""


# ---------------------------------------------------------------------------
# fetch + exact-semantics JSON normalization (plain Python, runs per task)
# ---------------------------------------------------------------------------

def fetch_query_range(
    url: str,
    query: str,
    start: int,
    end: int,
    step_seconds: int,
    user: str | None = None,
    password: str | None = None,
    insecure: bool = False,
    timeout: int = 10,
) -> dict:
    """GET ``/api/v1/query_range`` (reference prometheus_client.py:126-209).

    Unlike the reference there is no spool file: each partition's response
    is bounded by its sub-window, so it parses in-memory in the task.
    """
    params = urllib.parse.urlencode(
        {"query": query, "start": start, "end": end, "step": f"{step_seconds}s"}
    )
    req = urllib.request.Request(
        f"{url.rstrip('/')}/api/v1/query_range?{params}"
    )
    if user is not None:
        token = b64encode(f"{user}:{password or ''}".encode()).decode()
        req.add_header("Authorization", f"Basic {token}")
    ctx = ssl._create_unverified_context() if insecure else None  # nosec B323
    # Distinct timeout/connection/HTTP-error wrapping with a response-body
    # preview, like the reference (prometheus_client.py:139-196) — raw
    # urllib tracebacks are useless in an executor log at 3am.
    try:
        with urllib.request.urlopen(  # nosec B310
            req, timeout=timeout, context=ctx
        ) as resp:
            return json.load(resp)
    except urllib.error.HTTPError as exc:
        preview = exc.read(500).decode("utf-8", "replace")
        raise PrometheusQueryError(
            f"Prometheus query_range failed: HTTP {exc.code} {exc.reason}; "
            f"response preview: {preview!r}"
        ) from exc
    except urllib.error.URLError as exc:
        if isinstance(exc.reason, TimeoutError):
            raise PrometheusQueryError(
                f"Prometheus query_range timed out after {timeout}s: {url}"
            ) from exc
        raise PrometheusQueryError(
            f"Prometheus connection failed: {exc.reason}"
        ) from exc
    except TimeoutError as exc:
        raise PrometheusQueryError(
            f"Prometheus query_range timed out after {timeout}s: {url}"
        ) from exc


def response_to_series(doc: dict) -> Iterator[tuple[dict, list]]:
    """Normalize one response document to (metric, values) tuples with the
    reference parser's exact shape semantics (etl_job.py:590-737)."""
    result = doc.get("data", {}).get("result", [])
    if not isinstance(result, list):
        return
    for item in result:
        if not isinstance(item, dict):
            continue
        raw_metric = item.get("metric", {})
        metric = (
            {k: v for k, v in raw_metric.items() if isinstance(v, str)}
            if isinstance(raw_metric, dict)
            else {}
        )
        raw_values = item.get("values", [])
        pairs: list[list[str | None]] = []
        if isinstance(raw_values, list):
            for pair in raw_values:
                if not isinstance(pair, list):
                    continue  # scalar items ignored (full_coverage.py:121-140)
                norm: list[str | None] = []
                for el in pair:
                    if isinstance(el, bool) or el is None or isinstance(el, (dict, list)):
                        norm.append(None)  # ignored by the pair state machine
                    elif isinstance(el, (int, float)):
                        norm.append(repr(el))  # shortest-roundtrip literal
                    else:
                        norm.append(str(el))
                pairs.append(norm)
        yield metric, pairs


def _aligned_subwindows(
    start: int, end: int, parts: int, step_seconds: int
) -> list[tuple[int, int]]:
    """Split [start, end] into ≤parts step-aligned half-open sub-windows.

    Boundaries snap to multiples of ``step`` so the union of partitioned
    scans returns exactly the sample set of one whole-window scan
    (Prometheus evaluates at start + k*step). Consecutive windows start
    one step after the previous end to avoid double-reading the shared
    boundary sample.
    """
    span = end - start
    if parts <= 1 or span <= step_seconds:
        return [(start, end)]
    per = max(step_seconds, (span // parts // step_seconds) * step_seconds)
    out: list[tuple[int, int]] = []
    s = start
    while s <= end:
        e = min(s + per, end)
        out.append((s, e))
        if e >= end:
            break
        s = e + step_seconds
    return out


# ---------------------------------------------------------------------------
# batch reader
# ---------------------------------------------------------------------------

class _WindowPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _Options:
    def __init__(self, options: dict) -> None:
        self.url = options["url"]
        self.query = options.get("query", DEFAULT_SELECTOR)
        self.step = int(options.get("step_seconds", "15"))
        self.user = options.get("user")
        self.password = options.get("password")
        self.insecure = options.get("insecure", "false").lower() == "true"
        self.timeout = int(options.get("timeout", "10"))
        self.partitions = int(options.get("partitions", "1"))


class PrometheusBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._o = _Options(options)
        self._start = int(options["start"])
        self._end = int(options["end"])

    def partitions(self) -> list[InputPartition]:
        return [
            _WindowPartition(s, e)
            for s, e in _aligned_subwindows(
                self._start, self._end, self._o.partitions, self._o.step
            )
        ]

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        doc = fetch_query_range(
            self._o.url,
            self._o.query,
            partition.start,
            partition.end,
            self._o.step,
            self._o.user,
            self._o.password,
            self._o.insecure,
            self._o.timeout,
        )
        yield from response_to_series(doc)


# ---------------------------------------------------------------------------
# stream reader — timestamp_progress as the source offset
# ---------------------------------------------------------------------------

class PrometheusStreamReader(DataSourceStreamReader):
    """Micro-batch source whose offset IS the reference's watermark.

    ``initial_progress`` is required — same hard-fail contract as the
    reference's ``_load_progress`` (etl_job.py:298-355). Each micro-batch
    covers ``(progress, min(progress + window, now))``; Spark's
    checkpoint persists offsets, replacing the hand-rolled state table
    for the streaming mode.

    ``overlap_seconds`` is the streaming face of the reference's
    boundary-safety re-read (``BATCH_WINDOW_OVERLAP_SECONDS``,
    reference config.py:165-173, README.md:62-63; batch analog
    ``calc_window`` in plans/lifecycle.py): each micro-batch *fetches*
    from ``committed_progress − overlap`` (clamped to the stream's
    initial progress, the ``min_start`` analog) so samples that land at
    a window boundary after the previous batch read it are captured by
    the next one. Offsets are NOT widened — the checkpoint contract is
    untouched — so the replayed rows rely on the sink's content-hash
    dedup (exactly how the reference pairs overlap with its
    ReplacingMergeTree sink).
    """

    def __init__(self, options: dict) -> None:
        self._o = _Options(options)
        if "initial_progress" not in options:
            raise ValueError(
                "initial_progress is required (no auto-bootstrap; reference "
                "etl_job.py:303-305)"
            )
        self._initial = int(options["initial_progress"])
        self._window = int(options.get("window_size_seconds", "300"))
        self._overlap = int(options.get("overlap_seconds", "0"))
        if self._overlap < 0:
            raise ValueError("overlap_seconds must be >= 0")

    def initialOffset(self) -> dict:
        # step + initial ride in the checkpointed offset so a restart
        # with changed options FAILS LOUDLY instead of silently moving
        # the instant grid (see partitions())
        return {
            "progress": self._initial,
            "step": self._o.step,
            "initial": self._initial,
        }

    def latestOffset(self) -> dict:
        now = int(time.time())
        # never into the future (reference etl_job.py:148-177)
        return {
            "progress": min(self._high_water() + self._window, now),
            "step": self._o.step,
            "initial": self._initial,
        }

    def _high_water(self) -> int:
        # Spark owns offset bookkeeping through the checkpoint; this
        # in-memory mark only shapes the next proposed batch. It is
        # re-seeded from every start/end offset Spark hands us
        # (partitions/commit below), so after a checkpoint restart the
        # first real batch re-aligns to the committed offset instead of
        # regressing to initial_progress and crawling forward.
        return getattr(self, "_last", self._initial)

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        self._check_grid(start)
        s, e = int(start["progress"]), int(end["progress"])
        self._last = max(self._high_water(), s, e)
        if e <= s:
            return []
        # widen the FETCH window backwards by the overlap (never before
        # the stream's initial progress — the min_start analog); offsets
        # themselves stay (s, e] so checkpoint semantics are unchanged
        fetch_s = max(s - self._overlap, min(s, self._initial))
        if self._overlap and fetch_s > self._initial:
            # snap DOWN onto the stream's global instant grid
            # (initial + k*step): query_range evaluates at start + k*step,
            # so re-reads only reproduce identical (timestamp, value)
            # rows — the ones sink dedup can collapse — when every batch
            # shares the grid. Snapping only widens the overlap (≤ one
            # step), never narrows it.
            step = self._o.step
            fetch_s = self._initial + ((fetch_s - self._initial) // step) * step
        return [
            _WindowPartition(ps, pe)
            for ps, pe in _aligned_subwindows(
                fetch_s, e, self._o.partitions, self._o.step
            )
        ]

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        doc = fetch_query_range(
            self._o.url,
            self._o.query,
            partition.start,
            partition.end,
            self._o.step,
            self._o.user,
            self._o.password,
            self._o.insecure,
            self._o.timeout,
        )
        yield from response_to_series(doc)

    def _check_grid(self, offset: dict) -> None:
        """Reject a restart whose options moved the instant grid.

        query_range evaluates at ``start + k*step``: every batch of a
        stream reproduces identical (timestamp, value) rows on replay —
        the rows sink-side content dedup can collapse — ONLY while all
        batches share the ``initial + k*step`` grid. A checkpoint
        restart with a changed ``step_seconds`` or ``initial_progress``
        would silently shift evaluation instants, emitting
        near-duplicate rows no dedup can collapse; fail loudly instead.
        Offsets from checkpoints written before these keys existed
        carry no grid info and pass unchecked."""
        for key, current in (("step", self._o.step), ("initial", self._initial)):
            if key in offset and int(offset[key]) != current:
                raise ValueError(
                    f"checkpointed {key}={offset[key]} does not match the "
                    f"configured {key}={current}: changing the query grid "
                    "across restarts makes replayed overlap rows "
                    "non-collapsible near-duplicates. Restart with the "
                    "original options or start a fresh checkpoint."
                )

    def commit(self, end: dict) -> None:
        # checkpoint owns offsets; sink idempotency handles replays —
        # just keep the in-memory high-water mark aligned.
        self._last = max(self._high_water(), int(end["progress"]))


class PrometheusDataSource(DataSource):
    """``spark.read.format("prometheus")`` / ``spark.readStream.format(...)``.

    Options: url (required), start, end (batch, epoch seconds), query,
    step_seconds, partitions, user, password, insecure, timeout,
    initial_progress + window_size_seconds + overlap_seconds (streaming).
    """

    @classmethod
    def name(cls) -> str:
        return "prometheus"

    def schema(self) -> str:
        return SERIES_DDL

    def reader(self, schema: StructType) -> PrometheusBatchReader:
        return PrometheusBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> PrometheusStreamReader:
        return PrometheusStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(PrometheusDataSource)


def make_fetch_fn(
    url: str,
    query: str = DEFAULT_SELECTOR,
    partitions: int = 1,
    user: str | None = None,
    password: str | None = None,
    insecure: bool = False,
    timeout: int = 10,
):
    """Adapt the DataSource to the EtlBatchJob FetchFn contract."""

    def fetch(spark, window_start: int, window_end: int, step_seconds: int):
        register(spark)
        reader = (
            spark.read.format("prometheus")
            .option("url", url)
            .option("query", query)
            .option("start", window_start)
            .option("end", window_end)
            .option("step_seconds", step_seconds)
            .option("partitions", partitions)
            .option("insecure", str(insecure).lower())
            .option("timeout", timeout)
        )
        if user is not None:
            reader = reader.option("user", user).option("password", password or "")
        return reader.load()

    return fetch
