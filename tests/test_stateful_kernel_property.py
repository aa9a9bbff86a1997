"""Property test: the vectorized stream-rate kernel must agree with a
straightforward scalar fold on arbitrary inputs.

The kernel (streaming/stateful.py:_rate_fn) is hand-vectorized numpy —
exactly the kind of code where tie groups, late replays, counter
resets, chunk boundaries, and state carry interact in ways example
tests miss. The reference model here is the obvious per-sample fold
with the same contract: sort by (ts, value); a sample at or before the
last accepted timestamp is late (never rated, never advances state);
the lowest-valued sample of a tie group is the accepted one; increase
= value delta, or the new value on a reset; rate = increase over the
exact-µs interval. Hypothesis drives random sequences through BOTH
implementations across random micro-batch splits.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_prometheus2clickhouse_spark.streaming.stateful import _rate_fn


class FakeState:
    hasTimedOut = False

    def __init__(self):
        self.exists = False
        self.get = None

    def update(self, v):
        self.exists = True
        self.get = tuple(v)

    def setTimeoutTimestamp(self, v):
        pass

    def remove(self):
        self.exists = False
        self.get = None


def reference_fold(batches):
    """Scalar model: independent re-implementation of the contract."""
    out = []
    last_us = last_val = None
    for batch in batches:
        for ts_us, val in sorted(batch, key=lambda p: (p[0], p[1])):
            if last_us is not None and ts_us <= last_us:
                out.append((ts_us / 1e6, None, None, True))
                continue
            if last_us is None:
                out.append((ts_us / 1e6, None, None, False))
            else:
                delta = val - last_val
                inc = val if delta < 0 else delta
                dt = (ts_us - last_us) / 1e6
                out.append((ts_us / 1e6, inc, inc / dt, False))
            last_us, last_val = ts_us, val
    return out


def kernel_fold(batches):
    state = FakeState()
    out = []
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "series": ["k"] * len(batch),
                "ts_us": [t for t, _ in batch],
                "value": [v for _, v in batch],
            }
        )
        for res in _rate_fn(("k",), iter([pdf]), state):
            for r in res.itertuples(index=False):
                out.append((r.ts_sec, r.increase, r.rate, r.late))
    return out


samples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50).map(lambda s: s * 250_000),
        st.sampled_from([0.0, 1.0, 2.5, 7.0, 100.0]),
    ),
    min_size=0,
    max_size=30,
)


def _norm(rows):
    # order-insensitive; NaN-safe equality on the float fields
    def key(r):
        return tuple(-1.0 if v is None else v if not isinstance(v, float) or not math.isnan(v) else -2.0 for v in r[:3]) + (r[3],)

    return sorted(rows, key=key)


@settings(max_examples=200, deadline=None)
@given(samples=samples, n_splits=st.integers(min_value=1, max_value=4))
def test_kernel_matches_scalar_reference(samples, n_splits):
    # split the sequence into n sequential micro-batches
    k = max(1, len(samples) // n_splits)
    batches = [samples[i : i + k] for i in range(0, len(samples), k)] or [[]]
    got = kernel_fold(batches)
    want = reference_fold(batches)
    assert len(got) == len(want)
    for g, w in zip(_norm(got), _norm(want)):
        assert g[3] == w[3]  # late flag
        for gv, wv in zip(g[:3], w[:3]):
            if wv is None:
                assert gv is None
            else:
                assert gv is not None and math.isclose(gv, wv, rel_tol=1e-12)
