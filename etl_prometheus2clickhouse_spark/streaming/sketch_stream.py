"""Streaming sketch partials — the mergeable-sketch family wired into
the micro-batch lifecycle (round-7 verdict "Next round" #7; durable +
replay-safe per round-9 "Next round" #2/#3).

The partial sketches (operators/sketch.py) exist so corpus statistics
can accumulate ACROSS ingestion windows: each window sketches its own
slice down to O(groups × k) state, and the corpus answer is a merge
over partials instead of a re-scan of every window — the same
windowed-incremental lifecycle the engine's Prometheus ETL runs
(plans/lifecycle.py). This module demonstrates that wiring with real
Structured Streaming micro-batches, in two durability shapes:

- :func:`stream_kmv_partials` / :func:`stream_bloom_partials` /
  :func:`stream_cms_partials` run a bounded stream to completion
  (``Trigger.AvailableNow``) with a ``foreachBatch`` body that builds
  ONE partial sketch per micro-batch (micro-batch id = the sketch's
  ``batch_col``) and stores it in a driver-side accumulator. The
  accumulator holds SKETCH rows, not data — O(batches × groups × k)
  longs, the artifact whose whole point is being small enough to
  collect/ship — so this is a bounded, deliberate driver collect,
  same contract as the similarity module's guarded collects.
- :func:`stream_kmv_partials_durable` (+ the generic
  :func:`run_partial_stream_durable`) is the 100 TB shape: every
  micro-batch APPENDS its partial to a parquet directory — one
  ``micro_batch=N`` partition per batch — under a checkpoint, and the
  merge runs on demand over the directory (:func:`read_partials`).
  Stop/restart resumes from the checkpoint and processes only unseen
  input; a replayed batch OVERWRITES its own partition. Restart-
  correctness is pinned by tests/test_streaming_sketch.py (kill the
  stream mid-corpus, restart, merged result equals the one-shot
  sketch).

Replay contract (both shapes): Structured Streaming's ``foreachBatch``
is at-least-once per batch id — a batch can RE-RUN after a failure, so
a body that blindly appends would duplicate that batch's partial.
KMV and Bloom merges would survive that (explode+distinct / position-
set union are idempotent), but CMS merge is a counter SUM and would
silently double-count. Both bodies here are therefore keyed on
``batch_id``: the in-memory accumulator REPLACES the batch's entry,
and the durable writer overwrites the batch's own partition — replay-
safe for every family by construction, not by per-family accident.

The caller merges with the ordinary batch ``kmv_merge`` /
``bloom_merge`` / ``cms_merge``; because the merges are exact, the
streamed-and-merged result must equal the one-shot sketch over the
full stream — which is exactly what the ``stream_kmv`` catalog entry
pins against the one-shot SQL oracle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.localframe import local_df

from etl_prometheus2clickhouse_spark.operators.sketch import (
    bloom_build,
    cms_partial_sketches,
    hll_partial_sketches,
    kmv_partial_sketches,
)

_MICRO_BATCH_COL = "micro_batch"


def _run_partial_stream(
    src: DataFrame,
    per_batch: Callable[[DataFrame, int], DataFrame],
    template: DataFrame,
) -> DataFrame:
    """Run ``src`` to completion under AvailableNow, applying
    ``per_batch`` (a sketch-partial builder) to every micro-batch and
    accumulating the resulting SKETCH rows driver-side. Returns the
    accumulated partials as a batch DataFrame with ``template``'s
    schema (``template`` supplies the schema when zero batches fire).

    The accumulator is a dict keyed on ``batch_id``: ``foreachBatch``
    may re-run a batch after a transient failure (at-least-once per
    batch id), and a retry must REPLACE the earlier partial, not
    append a duplicate — CMS's counter-sum merge would silently
    double-count an appended duplicate (KMV/Bloom merges are
    idempotent and merely tolerate it). Keying makes the helper
    replay-safe for all three families."""
    from etl_prometheus2clickhouse_spark.streaming.batchconf import (
        batch_job_conf,
    )

    spark = src.sparkSession
    acc: dict[int, list] = {}
    with batch_job_conf(spark):
        q = (
            src.writeStream.foreachBatch(
                _keyed_collect_body(per_batch, acc)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    rows = [r for b in sorted(acc) for r in acc[b]]
    return local_df(spark, rows, template.schema)


def _keyed_collect_body(
    per_batch: Callable[[DataFrame, int], DataFrame],
    acc: dict[int, list],
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body of :func:`_run_partial_stream`, factored
    out so the replay contract is directly testable: invoking it twice
    with the same ``batch_id`` must leave exactly ONE partial for that
    batch (tests/test_streaming_sketch.py simulates the retry)."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        acc[int(batch_id)] = per_batch(batch_df, int(batch_id)).collect()

    return body


def run_partial_stream_durable(
    src: DataFrame,
    per_batch: Callable[[DataFrame, int], DataFrame],
    partials_dir: str,
    checkpoint_dir: str,
    max_live_dirs: int | None = None,
) -> None:
    """The durable face of :func:`_run_partial_stream` — the shape a
    100 TB deployment actually runs: every micro-batch writes its
    partial sketch to ``partials_dir/micro_batch=<id>/`` (one tiny
    parquet partition per ingestion window; the batch id returns as a
    partition column on read) under ``checkpoint_dir``, so

    - the stream is RESTARTABLE: stop it mid-corpus, start it again
      with the same checkpoint, and only unseen input is processed —
      partials already written stay put;
    - a REPLAYED batch (foreachBatch at-least-once) overwrites its own
      partition — idempotent for every sketch family, including CMS's
      non-idempotent counter-sum merge;
    - the merge is decoupled: any later job reads the directory
      (:func:`read_partials`) and merges with the ordinary batch
      ``*_merge`` — no driver accumulation, no stream left running.

    Runs to completion of currently-available input (AvailableNow) and
    returns when the stream stops. ``max_live_dirs`` schedules the
    retention fold (streaming/retention.py ``compact_stream_outputs``)
    INSIDE the lifecycle: when the partials directory reaches that
    many live batch partitions, the batch body folds the committed
    ones before doing its own work — bounded listings on a
    long-running stream without an operator remembering to compact."""

    from etl_prometheus2clickhouse_spark.streaming.batchconf import (
        batch_job_conf,
    )

    with batch_job_conf(src.sparkSession):
        q = (
            src.writeStream.foreachBatch(
                _durable_body(per_batch, partials_dir, max_live_dirs)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def _durable_body(
    per_batch: Callable[[DataFrame, int], DataFrame],
    partials_dir: str,
    max_live_dirs: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body of :func:`run_partial_stream_durable`,
    factored out so the replay contract is directly testable: a second
    invocation with the same ``batch_id`` overwrites that batch's own
    partition — never appends a duplicate. With ``max_live_dirs`` the
    body folds committed batch partitions first (keep_latest=1
    protects the only replayable one — see streaming/retention.py)."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if max_live_dirs is not None:
            from etl_prometheus2clickhouse_spark.streaming.retention import (
                compact_stream_outputs,
                live_batch_dirs,
            )

            spark = batch_df.sparkSession
            if live_batch_dirs(
                spark, partials_dir, _MICRO_BATCH_COL
            ) >= max_live_dirs:
                compact_stream_outputs(
                    spark, partials_dir,
                    partition_col=_MICRO_BATCH_COL, keep_latest=1,
                )
        partial = per_batch(batch_df, int(batch_id))
        # drop the batch column: the partition directory IS the batch
        # id, and partition discovery restores it as a column on read
        partial.drop(_MICRO_BATCH_COL).write.mode("overwrite").parquet(
            f"{partials_dir}/{_MICRO_BATCH_COL}={int(batch_id)}"
        )

    return body


def read_partials(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Read a durable partials directory back as one batch DataFrame
    (``micro_batch`` restored as a partition column), ready for the
    family's ``*_merge``. PURE — readers never mutate the directory;
    an interrupted retention fold is repaired by the next WRITER touch
    (streaming/retention.py ``recover_stream_outputs``, run at every
    compaction start)."""
    return spark.read.parquet(partials_dir)


def _kmv_per_batch(
    group_cols: list[str], value_col: str, k: int, hash_family: str
) -> Callable[[DataFrame, int], DataFrame]:
    def per_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return kmv_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            group_cols,
            value_col,
            _MICRO_BATCH_COL,
            k,
            hash_family,
        )

    return per_batch


def stream_kmv_partials(
    src: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """One KMV partial set per micro-batch of ``src`` (a streaming
    DataFrame): returns the accumulated partials frame
    ``(group…, micro_batch, sketch, k, hash_family)`` ready for
    :func:`~etl_prometheus2clickhouse_spark.operators.sketch.kmv_merge`.
    Merge-exactness makes the batch boundaries irrelevant: however the
    source splits its files into micro-batches, the merged estimate
    equals the one-shot sketch over everything streamed."""
    template = kmv_partial_sketches(
        src.sparkSession.createDataFrame([], src.schema).withColumn(
            _MICRO_BATCH_COL, F.lit(0)
        ),
        group_cols,
        value_col,
        _MICRO_BATCH_COL,
        k,
        hash_family,
    )
    return _run_partial_stream(
        src, _kmv_per_batch(group_cols, value_col, k, hash_family), template
    )


def stream_kmv_partials_durable(
    src: DataFrame,
    group_cols: list[str],
    value_col: str,
    partials_dir: str,
    checkpoint_dir: str,
    k: int = 64,
    hash_family: str = "md5",
) -> None:
    """Durable KMV partial accumulation: one parquet partition per
    micro-batch under a checkpoint (see
    :func:`run_partial_stream_durable` for the restart/replay
    contract). Merge later with ``kmv_merge(read_partials(...))``."""
    run_partial_stream_durable(
        src,
        _kmv_per_batch(group_cols, value_col, k, hash_family),
        partials_dir,
        checkpoint_dir,
    )


def stream_bloom_partials(
    src: DataFrame,
    value_col: str,
    m_bits: int = 16384,
    k_hashes: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """One Bloom position-set partial per micro-batch of ``src``:
    returns the accumulated partials frame ``(micro_batch, bloom,
    m_bits, k_hashes, hash_family)`` ready for
    :func:`~etl_prometheus2clickhouse_spark.operators.sketch.bloom_merge`
    (position-set union — exact, so the merged sketch equals the
    one-shot build over everything streamed)."""
    template = bloom_build(
        src.sparkSession.createDataFrame([], src.schema).withColumn(
            _MICRO_BATCH_COL, F.lit(0)
        ),
        value_col,
        m_bits,
        k_hashes,
        batch_col=_MICRO_BATCH_COL,
        hash_family=hash_family,
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return bloom_build(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            value_col,
            m_bits,
            k_hashes,
            batch_col=_MICRO_BATCH_COL,
            hash_family=hash_family,
        )

    return _run_partial_stream(src, per_batch, template)


def stream_cms_partials(
    src: DataFrame,
    group_cols: list[str],
    item_col: str,
    depth: int = 3,
    width: int = 1024,
    hash_family: str = "md5",
) -> DataFrame:
    """One CMS counter-table partial per micro-batch of ``src``:
    returns the accumulated partials frame ``(group…, micro_batch, r,
    bucket, cnt, depth, width, hash_family)`` ready for
    :func:`~etl_prometheus2clickhouse_spark.operators.sketch.cms_merge`.
    CMS merge is a counter SUM (exact by linearity but NOT
    idempotent) — this family is only safe on the batch-id-keyed
    accumulator, which is exactly what :func:`_run_partial_stream`
    provides (a replayed batch replaces its partial instead of
    double-counting)."""
    template = cms_partial_sketches(
        src.sparkSession.createDataFrame([], src.schema).withColumn(
            _MICRO_BATCH_COL, F.lit(0)
        ),
        group_cols,
        item_col,
        _MICRO_BATCH_COL,
        depth,
        width,
        hash_family,
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return cms_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            group_cols,
            item_col,
            _MICRO_BATCH_COL,
            depth,
            width,
            hash_family,
        )

    return _run_partial_stream(src, per_batch, template)


def _hll_per_batch(
    group_cols: list[str], value_col: str, p: int, hash_family: str
) -> Callable[[DataFrame, int], DataFrame]:
    def per_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return hll_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            group_cols,
            value_col,
            _MICRO_BATCH_COL,
            p,
            hash_family,
        )

    return per_batch


def stream_hll_partials(
    src: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """One HLL register-vector partial per micro-batch of ``src``:
    returns the accumulated partials frame ``(group…, micro_batch,
    sketch, p, hash_family)`` ready for
    :func:`~etl_prometheus2clickhouse_spark.operators.sketch.hll_merge`.
    Doubly replay-proof: the keyed accumulator REPLACES a retried
    batch's partial (the contract every family gets), and HLL's
    element-wise-max merge is additionally IDEMPOTENT — even an
    appended duplicate partial could not move the estimate, unlike
    CMS's counter sum. Merge-exactness (max of per-batch maxima ==
    union maxima) makes batch boundaries irrelevant: the merged
    estimate equals the one-shot sketch over everything streamed."""
    template = hll_partial_sketches(
        src.sparkSession.createDataFrame([], src.schema).withColumn(
            _MICRO_BATCH_COL, F.lit(0)
        ),
        group_cols,
        value_col,
        _MICRO_BATCH_COL,
        p,
        hash_family,
    )
    return _run_partial_stream(
        src, _hll_per_batch(group_cols, value_col, p, hash_family), template
    )
