"""Session-conf scope for micro-batch BODY jobs.

A ``foreachBatch`` body runs ordinary batch jobs, so it inherits the
session's batch-sized planning: 32 shuffle partitions and AQE's
per-stage re-planning. Both are mis-sized for a micro-batch, whose
volume is bounded by the TRIGGER (maxFilesPerTrigger / maxBytes), not
by the corpus:

- **Shuffle partitions size to batch volume, not cluster width** —
  the same reasoning the memory-sink faces already apply to state
  stores (plans/stream_catalog.py ``_run_to_table``: state partitions
  are sized to state volume, 8 at verification scale). A KB-MB batch
  shuffled 32 ways pays 32 tasks of fixed latency per exchange for
  data that fits in one.
- **Static planning beats adaptive planning at trigger scale** — AQE
  turns every body action into one job per query stage (plan →
  materialize → re-plan), which is pure fixed overhead when each
  stage carries KBs; skew handling is moot on trigger-bounded input.
  Event-log evidence: stream_curation ran 289 jobs / 291 stages for
  ~40 driver actions, 118 stages under 50 ms of task time; with the
  body scope at 8 static partitions the same face runs 45.5 s → 28.9 s
  (same JVM A/B, r17 measurements).

Both knobs are env-parameterized for deployments whose triggers carry
real volume: ``SPARK_GRAFT_STREAM_SHUFFLE`` (default 8 — size to rows
per trigger) and ``SPARK_GRAFT_STREAM_AQE`` (default false — set true
for GB-scale triggers where runtime coalescing pays again). The scope
restores the session values on exit, so batch queries planned after
the stream keep the session's batch-scale settings.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

_SHUFFLE_KEY = "spark.sql.shuffle.partitions"
_AQE_KEY = "spark.sql.adaptive.enabled"


@contextmanager
def batch_job_conf(spark) -> Iterator[None]:
    """Scope a stream run so its ``foreachBatch`` body jobs plan at
    micro-batch size (see module docstring). Wrap the whole
    ``start()`` → ``awaitTermination()`` span; build anything
    corpus-sized (reference models, seed indexes) BEFORE entering."""
    shuffle = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
    aqe = os.environ.get("SPARK_GRAFT_STREAM_AQE", "false")
    prev_shuffle = spark.conf.get(_SHUFFLE_KEY)
    prev_aqe = spark.conf.get(_AQE_KEY)
    spark.conf.set(_SHUFFLE_KEY, shuffle)
    spark.conf.set(_AQE_KEY, aqe)
    try:
        yield
    finally:
        spark.conf.set(_SHUFFLE_KEY, prev_shuffle)
        spark.conf.set(_AQE_KEY, prev_aqe)
