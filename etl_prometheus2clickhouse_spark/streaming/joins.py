"""Stream-stream event-time interval join.

Structured Streaming's inner join with a time-range predicate is the
streaming face of the batch interval/as-of join family
(operators/joins.py): each left event matches right events of the same
key whose event time falls in ``[left.ts, left.ts + max_delay]``.

State-bounding contract (the part that matters on an unbounded
stream): BOTH sides carry a watermark and the join condition bounds
the right side's event time relative to the left's, so Spark can
compute, per side, the oldest state a future match could still need
and evict everything older. Without the time bound the state grows
with the stream; with it, state is O(events inside
``watermark_delay + max_delay``) per side — independent of stream
length, the same bounded-state argument as the windowed aggregation.

The micro-batch execution is a symmetric hash join over the keyed
state stores: each side's batch rows probe the other side's state and
append their own — at 1000 executors this partitions by key exactly
like the batch equi-join's shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one or more "<number> <unit>[s]" groups — the interval syntax this
# join accepts (compound intervals like "1 hour 30 minutes" included);
# validated up front so a malformed delay fails with a clear message,
# not an opaque SQL parse error from inside F.expr
_DELAY_RE = re.compile(
    r"^\d+\s+(microsecond|millisecond|second|minute|hour|day|week)s?"
    r"(\s+\d+\s+(microsecond|millisecond|second|minute|hour|day|week)s?)*$",
    re.IGNORECASE,
)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Inner-join two event-time streams on ``key_col`` with
    ``right_ts`` in ``[left_ts, left_ts + max_delay]``.

    ``left_ts`` / ``right_ts`` must be distinct column names (rename
    before calling) — keeping them distinct sidesteps ambiguous-column
    resolution and lets the caller project either side's time without
    aliases. Both inputs get ``watermark_delay`` watermarks on their
    time columns; append-mode output emits a match as soon as both
    rows have arrived.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names "
            f"(both {left_ts!r}); rename one side before joining"
        )
    if "`" in left_ts:
        raise ValueError(
            f"left_ts {left_ts!r} contains a backtick; rename the "
            "column before joining"
        )
    if not _DELAY_RE.match(max_delay.strip()):
        raise ValueError(
            f"max_delay {max_delay!r} is not a simple interval "
            "('<n> <unit>', e.g. '1 hour')"
        )
    l_wm = left.withWatermark(left_ts, watermark_delay)
    r_wm = right.withWatermark(right_ts, watermark_delay)
    # the upper bound needs an interval-add expression; backtick-quote
    # the column so a ts name needing quoting fails validation above,
    # never as an opaque parse error inside the expr
    upper = F.expr(f"`{left_ts}` + INTERVAL '{max_delay.strip()}'")
    cond = (
        (l_wm[key_col] == r_wm[key_col])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= upper)
    )
    return l_wm.join(r_wm, cond, "inner").drop(r_wm[key_col])
