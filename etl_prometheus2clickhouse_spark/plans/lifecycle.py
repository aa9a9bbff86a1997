"""Window/progress/commit arithmetic — pure, Spark-agnostic.

These are the reference's scalar state rules, ported with identical
semantics (they are already plain ints there):

- :func:`calc_window`    — reference etl_job.py:357-393
- :func:`commit_decision` — reference etl_job.py:148-186
- :func:`can_start`      — reference etl_job.py:214-252 (fail-safe gate)

Pinned by the reference's own tests (tests/test_etl_job.py:1134-1294) and
ported here in tests/test_lifecycle.py.
"""

from __future__ import annotations

from dataclasses import dataclass


def calc_window(
    progress: int,
    window_size_seconds: int,
    overlap_seconds: int = 0,
    min_window_start: int = 0,
) -> tuple[int, int]:
    """``window_start = max(progress - overlap, min_start)``;
    ``window_end = window_start + window_size``.

    Overlap shifts the window backward without growing it; the clamp
    prevents reading before the configured minimum
    (reference etl_job.py:357-393).
    """
    window_start = progress - overlap_seconds
    if window_start < min_window_start:
        window_start = min_window_start
    return window_start, window_start + window_size_seconds


@dataclass(frozen=True)
class CommitDecision:
    """What to persist after a successful window write."""

    new_progress: int
    actual_window_seconds: int
    timestamp_end: int


def commit_decision(
    window_start: int,
    window_end: int,
    now: int,
    timestamp_start: int,
) -> CommitDecision:
    """Progress clamp and end-timestamp rules (reference etl_job.py:148-186):

    - ``new_progress = min(window_end, now)`` — the watermark never moves
      into the future where Prometheus has no data yet;
    - ``actual_window = min(window_end, now) - window_start`` — the span
      actually covered;
    - ``timestamp_end = max(now, timestamp_start + 1)`` — strictly greater
      than start so a closed lease is always distinguishable.
    """
    new_progress = min(window_end, now)
    actual_window = min(window_end, now) - window_start
    timestamp_end = max(now, timestamp_start + 1)
    return CommitDecision(
        new_progress=new_progress,
        actual_window_seconds=actual_window,
        timestamp_end=timestamp_end,
    )


def can_start(has_running_job: bool | None) -> bool:
    """Start gate: blocked while a lease is open; *errors block too*
    (fail-safe — reference etl_job.py:214-252 returns False when the
    state read fails, passed in here as ``None``)."""
    if has_running_job is None:
        return False
    return not has_running_job
