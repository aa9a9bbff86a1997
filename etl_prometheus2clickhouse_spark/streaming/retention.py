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

CRASH SAFETY (the staged-swap protocol shared with the component
rewrite, operators/dedup_index.py): the folded rows land in a hidden
``.compact-*`` staging directory together with a ``_plan.json`` naming
every source directory, the staging dir is RENAMED to a
``.compact-commit-*`` marker — the atomic point of no return, content
and plan fully durable before anything is deleted — then the sources
are deleted and the marker renamed into ``<col>=-1``.
:func:`recover_stream_outputs` repairs any crash window from the
directory state alone (discard an uncommitted staging dir; roll a
committed one forward by finishing the deletes from its plan). It is
WRITER-side only — it runs at the start of every compaction, and
readers (``read_dispositions``, ``read_partials``) stay pure: a
reader that ran recovery would race an IN-FLIGHT compaction and could
delete its staging directory mid-fold. One writer at a time per
output directory is the module's contract (the same single-writer
contract every persisted index holds). A pure reader racing the
window between the commit rename and the next writer touch sees the
folded batches missing until then — streams that need a
reader-atomic swap should land their outputs in a manifested index
instead (operators/dedup_index.py).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _delete_path,
    _hadoop_fs,
)

_FOLDED = -1  # reserved partition value for compacted batches
_PLAN = "_plan.json"  # underscore-prefixed: invisible to parquet readers


def recover_stream_outputs(spark: SparkSession, out_dir: str) -> None:
    """Finish (or discard) an interrupted :func:`compact_stream_outputs`.

    A ``.compact-<tag>`` directory (no commit marker) means the fold
    never reached the point of no return: discard it — every source
    directory is still live. A ``.compact-commit-<tag>`` directory
    means the folded content and its source plan are durable: roll
    FORWARD — delete the planned sources that still exist, then rename
    the marker into the reserved partition. Both paths are idempotent."""
    jvm, fs, hdir = _hadoop_fs(spark, out_dir)
    if not fs.exists(hdir):
        return
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if not st.isDirectory():
            continue
        if name.startswith(".compact-commit-"):
            plan_path = jvm.org.apache.hadoop.fs.Path(
                os.path.join(out_dir, name, _PLAN)
            )
            stream = fs.open(plan_path)
            try:
                raw = bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                )
            finally:
                stream.close()
            plan = json.loads(raw.decode())
            for src in plan["sources"]:
                src_p = jvm.org.apache.hadoop.fs.Path(
                    os.path.join(out_dir, src)
                )
                if fs.exists(src_p):
                    fs.delete(src_p, True)
            dst = jvm.org.apache.hadoop.fs.Path(
                os.path.join(out_dir, plan["dest"])
            )
            if not fs.rename(st.getPath(), dst):
                raise IOError(
                    f"compaction recovery: rename {name} into place "
                    f"under {out_dir!r} reported failure"
                )
        elif name.startswith(".compact-"):
            fs.delete(st.getPath(), True)


def live_batch_dirs(
    spark: SparkSession, out_dir: str, partition_col: str = "mb"
) -> int:
    """Count of live batch partition directories (the folded ``-1``
    partition included) — the metadata-size telemetry the streaming
    compaction cadence triggers on. One listStatus, no Spark job."""
    _, fs, hdir = _hadoop_fs(spark, out_dir)
    if not fs.exists(hdir):
        return 0
    prefix = f"{partition_col}="
    return sum(
        1
        for st in fs.listStatus(hdir)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    )


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
    recover_stream_outputs(spark, out_dir)
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
    src_names = [f"{partition_col}={v}" for v in foldable]
    if has_folded:
        src_names.append(f"{partition_col}={_FOLDED}")
    if not src_names or (len(src_names) == 1 and has_folded and not foldable):
        # nothing new to fold (re-folding just the -1 dir is a no-op)
        return {"folded_dirs": 0, "rows": 0}
    src_dirs = [os.path.join(out_dir, s) for s in src_names]
    rows = spark.read.parquet(*src_dirs)
    tag = uuid.uuid4().hex[:8]
    staging = os.path.join(out_dir, f".compact-{tag}")
    # ~8 source batch dirs (one small file each) per output file; the
    # dir count stands in for the scan's partition count without a
    # .rdd plan conversion
    rows.coalesce(max(1, len(src_dirs) // 8)).write.mode(
        "overwrite"
    ).parquet(staging)
    n = spark.read.parquet(staging).count()
    # the recovery plan rides INSIDE the staged dir (underscore file —
    # parquet readers ignore it), so the commit rename below makes
    # content and plan durable in one atomic step
    plan_path = jvm.org.apache.hadoop.fs.Path(
        os.path.join(staging, _PLAN)
    )
    stream = fs.create(plan_path, True)
    try:
        stream.write(
            json.dumps(
                {
                    "sources": src_names,
                    "dest": f"{partition_col}={_FOLDED}",
                }
            ).encode()
        )
    finally:
        stream.close()
    commit = jvm.org.apache.hadoop.fs.Path(
        os.path.join(out_dir, f".compact-commit-{tag}")
    )
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staging), commit):
        raise IOError(
            f"compact_stream_outputs: commit rename of {staging!r} "
            "reported failure; sources untouched"
        )
    for d in src_dirs:
        _delete_path(spark, d)
    dst = jvm.org.apache.hadoop.fs.Path(
        os.path.join(out_dir, f"{partition_col}={_FOLDED}")
    )
    if not fs.rename(commit, dst):
        raise IOError(
            f"compact_stream_outputs: rename {commit.toString()!r} -> "
            f"{dst.toString()!r} failed; recover_stream_outputs "
            "completes the swap on the next touch"
        )
    return {"folded_dirs": len(src_dirs), "rows": n}
