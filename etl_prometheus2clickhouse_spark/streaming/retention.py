"""Retention for streaming output directories.

The durable streaming faces accrete one partition directory per
micro-batch forever — ``<dispositions>/mb=<id>`` from the curation
funnel (streaming/curation_stream.py) and
``<partials>/micro_batch=<id>`` from the durable sketch streams
(streaming/sketch_stream.py). The per-batch layout is what makes
at-least-once replay idempotent (a replayed batch overwrites its own
directory), but after months of 5-minute batches the directory listing
itself is the bottleneck: ~100k tiny directories per year per stream.

:func:`compact_stream_outputs` folds COMMITTED batch partitions into
one reserved ``<col>=-1`` partition (batch ids are non-negative, so
``-1`` keeps the partition column's integer type — readers see the
same schema before and after). The newest ``keep_latest`` batch
directories are never folded: under an at-least-once sink the only
batch that can still be replayed after a crash is one the checkpoint
has not committed — necessarily the newest — so folding strictly older
batches can never collide with a replay overwrite (pinned by the
kill→compact→restart pytest). Readers that only aggregate over the
rows (every sketch merge, the dispositions rollup) are unaffected;
per-batch lineage for folded batches is intentionally collapsed.

The fold itself is write-new → delete-old → rename (the hidden
``.compact-*`` staging dir is invisible to Spark readers, so a crash
before the deletes duplicates nothing); the window between the deletes
and the rename is documented debt shared with every non-transactional
parquet layout — the persisted-index tables close it with a manifest
(operators/dedup_index.py), streams that need the same guarantee
should land dispositions in a manifested index instead.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession

from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _delete_path,
    _hadoop_fs,
)

_FOLDED = -1  # reserved partition value for compacted batches


def compact_stream_outputs(
    spark: SparkSession,
    out_dir: str,
    partition_col: str = "mb",
    keep_latest: int = 1,
) -> dict:
    """Fold all but the newest ``keep_latest`` batch partitions of a
    streaming output directory into the reserved ``<col>=-1``
    partition. Returns ``{"folded_dirs": n, "rows": m}``; a no-op
    (nothing worth folding) returns zeros."""
    if keep_latest < 1:
        raise ValueError(
            "keep_latest must be >= 1: the newest batch may be an "
            "uncommitted replay target and must stay overwritable"
        )
    jvm, fs, hdir = _hadoop_fs(spark, out_dir)
    if not fs.exists(hdir):
        return {"folded_dirs": 0, "rows": 0}
    batch_ids = []
    has_folded = False
    prefix = f"{partition_col}="
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith(prefix):
            continue
        try:
            v = int(name[len(prefix):])
        except ValueError:
            continue
        if v == _FOLDED:
            has_folded = True
        else:
            batch_ids.append(v)
    batch_ids.sort()
    foldable = batch_ids[: max(0, len(batch_ids) - keep_latest)]
    src_dirs = [
        os.path.join(out_dir, f"{partition_col}={v}") for v in foldable
    ]
    if has_folded:
        src_dirs.append(os.path.join(out_dir, f"{partition_col}={_FOLDED}"))
    if not src_dirs or (len(src_dirs) == 1 and has_folded and not foldable):
        # nothing new to fold (re-folding just the -1 dir is a no-op)
        return {"folded_dirs": 0, "rows": 0}
    rows = spark.read.parquet(*src_dirs)
    staging = os.path.join(out_dir, f".compact-{uuid.uuid4().hex[:8]}")
    rows.coalesce(max(1, rows.rdd.getNumPartitions() // 8)).write.mode(
        "overwrite"
    ).parquet(staging)
    n = spark.read.parquet(staging).count()
    for d in src_dirs:
        _delete_path(spark, d)
    src = jvm.org.apache.hadoop.fs.Path(staging)
    dst = jvm.org.apache.hadoop.fs.Path(
        os.path.join(out_dir, f"{partition_col}={_FOLDED}")
    )
    if not fs.rename(src, dst):
        raise IOError(
            f"compact_stream_outputs: rename {staging!r} -> "
            f"{dst.toString()!r} failed; folded rows are intact in the "
            "staging directory — rename it into place manually"
        )
    return {"folded_dirs": len(src_dirs), "rows": n}
