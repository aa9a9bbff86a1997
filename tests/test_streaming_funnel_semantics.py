"""Cross-batch funnel semantics matrix: exactly where the streaming
window funnel (streaming/stateful.py:streaming_window_funnel) agrees
with the batch operator (operators/behavior.py:window_funnel) and where
the documented staleness stance makes it diverge under LATE ARRIVALS.

The streaming face's contract: out-of-order events older than the
chain's PROGRESS cannot retroactively re-anchor or re-thread it — the
three-scalar state (anchor, prev, level) only ever moves forward. The
batch operator, recomputing over the complete event set, always finds
the earliest chain. These tests pin the divergence as a tested
contract, case by case, instead of prose."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.behavior import window_funnel
from etl_prometheus2clickhouse_spark.streaming.stateful import (
    streaming_window_funnel,
)

T0 = 1_700_000_000
SCHEMA = "ts timestamp, user_id long, event_type string"
STEPS = ["s1", "s2", "s3"]


def _batch_result(spark, all_rows, window_seconds=None):
    df = spark.createDataFrame(
        [
            (datetime.fromtimestamp(t, tz=timezone.utc), u, e)
            for t, u, e in all_rows
        ],
        SCHEMA,
    )
    out = window_funnel(
        df,
        ["user_id"],
        steps=[F.col("event_type") == s for s in STEPS],
        window_seconds=window_seconds,
    ).collect()
    return {r.user_id: (r.level, r.anchor_sec) for r in out}


def _stream_result(spark, tmp_path, batches, qname, window_seconds=None):
    """Feed ``batches`` (lists of (t, user, step) rows) one micro-batch
    at a time; return the FINAL emission per key."""
    src = str(tmp_path / f"{qname}_src")
    ckpt = str(tmp_path / f"{qname}_ckpt")

    def _write(rows, n):
        spark.createDataFrame(
            [
                (datetime.fromtimestamp(t, tz=timezone.utc), u, e)
                for t, u, e in rows
            ],
            SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{n}")

    _write(batches[0], 0)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    out = streaming_window_funnel(
        stream,
        steps=STEPS,
        window_seconds=window_seconds,
        watermark_delay="1 hour",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        for i, rows in enumerate(batches[1:], start=1):
            _write(rows, i)
            q.processAllAvailable()
        # one emission per (key, batch-with-data); the final chain
        # state per key is the emission with the highest level (state
        # only moves forward), tie-broken by anchor
        rows = spark.sql(f"SELECT * FROM {qname}").collect()
        final: dict[int, tuple] = {}
        for r in rows:
            cur = final.get(r.user_id)
            cand = (r.level, r.anchor_sec)
            if cur is None or cand[0] >= cur[0]:
                final[r.user_id] = cand
        return final
    finally:
        q.stop()


def test_in_order_stream_equals_batch(spark, tmp_path):
    """Agreement case: with every event arriving in timestamp order,
    the final streaming emission equals the batch recomputation."""
    batches = [
        [(T0, 1, "s1"), (T0 + 10, 2, "s1")],
        [(T0 + 20, 1, "s2"), (T0 + 30, 2, "noise")],
        [(T0 + 40, 1, "s3"), (T0 + 50, 2, "s2")],
    ]
    all_rows = [r for b in batches for r in b]
    got = _stream_result(spark, tmp_path, batches, "funnel_inorder")
    want = _batch_result(spark, all_rows)
    assert got == want == {1: (3, T0), 2: (2, T0 + 10)}


def test_late_anchor_does_not_reanchor(spark, tmp_path):
    """Divergence: a LATE step-1 event EARLIER than the established
    anchor. Batch recomputation re-anchors the chain at the earlier
    event (earliest-chain semantics) and re-threads from there; the
    streaming state keeps its anchor — pinned divergence."""
    batches = [
        [(T0 + 100, 1, "s1"), (T0 + 200, 1, "s2")],
        [(T0 + 50, 1, "s1")],  # late, pre-anchor
    ]
    all_rows = [r for b in batches for r in b]
    got = _stream_result(spark, tmp_path, batches, "funnel_lateanchor")
    want = _batch_result(spark, all_rows)
    # batch: anchors at the EARLIER s1 (t0+50), s2 still threads
    assert want == {1: (2, T0 + 50)}
    # streaming: anchor stays where the chain first progressed
    assert got == {1: (2, T0 + 100)}


def test_late_mid_step_cannot_rethread(spark, tmp_path):
    """Divergence: the chain matched step 2 at t+200 (the only s2 seen
    so far), leaving an s3 at t+160 unreachable. A LATE s2 at t+150
    would let the batch recomputation thread s1→s2(150)→s3(160) to
    level 3; the streaming chain's progress (prev=t+200) makes the
    late s2 stale — it stays at level 2."""
    batches = [
        [(T0 + 100, 1, "s1"), (T0 + 160, 1, "s3"), (T0 + 200, 1, "s2")],
        [(T0 + 150, 1, "s2")],  # late, older than the chain's prev
    ]
    all_rows = [r for b in batches for r in b]
    got = _stream_result(spark, tmp_path, batches, "funnel_latemid")
    want = _batch_result(spark, all_rows)
    assert want == {1: (3, T0 + 100)}  # batch finds the full thread
    assert got == {1: (2, T0 + 100)}  # streaming: stale s2 ignored


def test_post_window_straggler_agrees(spark, tmp_path):
    """Agreement case: a straggler matching the next step but BEYOND
    anchor+window advances neither face — the window predicate is
    part of the chain semantics, not of arrival order."""
    batches = [
        [(T0, 1, "s1"), (T0 + 30, 1, "s2")],
        [(T0 + 120, 1, "s3")],  # in order but outside the 60s window
    ]
    all_rows = [r for b in batches for r in b]
    got = _stream_result(
        spark, tmp_path, batches, "funnel_postwin", window_seconds=60
    )
    want = _batch_result(spark, all_rows, window_seconds=60)
    assert got == want == {1: (2, T0)}


def test_late_step_still_inside_progress_advances(spark, tmp_path):
    """Boundary of the staleness rule: an out-of-ORDER arrival whose
    timestamp is NEWER than the chain's progress is not stale — it
    advances the chain exactly as the batch recomputation does."""
    batches = [
        [(T0, 1, "s1")],
        # arrives a batch late, but its ts is after prev (= anchor)
        [(T0 + 40, 1, "s2"), (T0 + 10, 1, "noise")],
        [(T0 + 80, 1, "s3")],
    ]
    all_rows = [r for b in batches for r in b]
    got = _stream_result(spark, tmp_path, batches, "funnel_progressok")
    want = _batch_result(spark, all_rows)
    assert got == want == {1: (3, T0)}
