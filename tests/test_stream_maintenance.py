"""Scheduled compaction + vacuum INSIDE the streaming lifecycle
(streaming/curation_stream.py ``max_live_dirs``, streaming/
sketch_stream.py ``run_partial_stream_durable``): a long-running
stream must bound its own metadata — live batch partitions of the
dispositions/partials outputs and live ``mb=`` increments of every
persisted index — without an operator remembering to call compaction,
and the folds must not change a single disposition."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    index_live_increments,
    minhash_index_build,
    paragraph_index_build,
)
from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
    read_dispositions,
    run_streaming_curation,
)
from etl_prometheus2clickhouse_spark.streaming.retention import (
    live_batch_dirs,
)

_SCHEMA = "doc_id long, text string"

# one Gopher-passing paragraph family; variants tweak the tail so
# cross-batch near-dup pairs exist (the folds must not lose the index
# rows those decisions probe)
_BASE = (
    "the careful librarians catalogued every manuscript in the "
    "collection and made certain that each shelf carried its label "
    "and that the reading rooms stayed quiet through the long "
    "afternoons while scholars worked through the archives with "
    "patience and returned every volume to its place before the "
    "lamps were dimmed for the evening"
)


def _doc(i: int, tail: str = "") -> tuple[int, str]:
    return (i, _BASE + (" " + tail if tail else ""))


def _batches() -> list[list[tuple[int, str]]]:
    """9 single-trigger batches: each has one fresh doc and every
    third batch re-crawls an earlier doc verbatim (a cross-batch
    duplicate that must survive every fold in between). 9 batches at
    max_live_dirs=4 still trigger TWO folds on every surface (each
    micro-batch costs ~10 s of fixed per-action overhead at any data
    size — r17 durations audit — so the count stays at the minimum
    that exercises repeated folds)."""
    out = []
    for b in range(9):
        rows = [_doc(100 + 10 * b, f"entry number {b} of the audit")]
        if b % 3 == 2:
            rows.append(_doc(100 + 10 * b + 1, "entry number 0 of the audit"))
        out.append(rows)
    return out


def _land(spark, src, batches):
    for n, rows in enumerate(batches):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{n:02d}")


def _stream(spark, src):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )


def _run(spark, tmp_path, name, max_live_dirs):
    seed = spark.createDataFrame([_doc(1), _doc(2, "seed two")], _SCHEMA)
    ref = spark.createDataFrame([_doc(1)], _SCHEMA)
    idx = str(tmp_path / f"{name}_idx")
    pidx = str(tmp_path / f"{name}_pidx")
    minhash_index_build(seed, idx, id_col="doc_id", threshold=0.5,
                        index_buckets=8)
    paragraph_index_build(seed, pidx, id_col="doc_id", index_buckets=8)
    src = str(tmp_path / f"{name}_src")
    disp = str(tmp_path / f"{name}_disp")
    ckpt = str(tmp_path / f"{name}_ckpt")
    _land(spark, src, _batches())
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp, ckpt, 1e9,
        para_index_path=pidx, max_live_dirs=max_live_dirs,
    )
    got = {
        r.doc_id: r.disposition
        for r in read_dispositions(spark, disp).collect()
    }
    return idx, pidx, disp, got


import pytest


@pytest.fixture(scope="module")
def reference_run(spark, tmp_path_factory):
    """The maintenance-disabled 9-batch run BOTH compaction tests
    compare against — executed once per module (it used to run inside
    each test, ~1/3 of their combined former cost)."""
    with cached_scope():
        _, _, _, want = _run(
            spark, tmp_path_factory.mktemp("maint_ref"), "ref", None
        )
    return want


def test_scheduled_compaction_bounds_live_dirs(
    spark, tmp_path, reference_run
):
    """A 9-batch stream with max_live_dirs=4 ends with a bounded
    live-unit count on EVERY surface (dispositions dirs, minhash index
    increments, paragraph index increments), vacuum has reclaimed the
    superseded index directories, and the dispositions equal an
    identical run with maintenance disabled."""
    with cached_scope():
        idx, pidx, disp, got = _run(spark, tmp_path, "mnt", 4)
    want = reference_run
    assert got == want and len(got) == 12
    # the dedup stages stayed non-vacuous ACROSS folds: the exact
    # re-crawls lose every paragraph to the index (dedup_empty) and
    # the tail variants are near-dups of earlier batches (duplicate)
    assert {"duplicate", "dedup_empty"} <= set(got.values()), got

    # bounded dispositions listing: the fold triggers at >= 4 live
    # dirs and keeps the newest, so the count never exceeds
    # max_live_dirs + 1 at any batch boundary
    assert live_batch_dirs(spark, disp, "mb") <= 5
    # bounded index metadata on both indexes
    for path in (idx, pidx):
        live = index_live_increments(spark, path)
        assert live and max(live.values()) <= 5, (path, live)
        # vacuum reclaimed superseded dirs: physical mb= dirs == live
        for table, n_live in live.items():
            root = os.path.join(path, table)
            physical = [
                d for d in os.listdir(root) if d.startswith("mb=")
            ]
            assert len(physical) == n_live, (root, physical, n_live)


def test_restart_mid_compaction_resumes(spark, tmp_path, reference_run):
    """Kill the stream after the first batches, leave an interrupted
    dispositions fold at BOTH crash windows' worth of state (a
    committed-but-unswapped marker), then restart with maintenance on:
    the body's first fold heals it, the remaining batches process, and
    the labels equal the uninterrupted run."""
    import json

    want = reference_run
    seed = spark.createDataFrame([_doc(1), _doc(2, "seed two")], _SCHEMA)
    ref = spark.createDataFrame([_doc(1)], _SCHEMA)
    idx = str(tmp_path / "rc_idx")
    pidx = str(tmp_path / "rc_pidx")
    minhash_index_build(seed, idx, id_col="doc_id", threshold=0.5,
                        index_buckets=8)
    paragraph_index_build(seed, pidx, id_col="doc_id", index_buckets=8)
    src = str(tmp_path / "rc_src")
    disp = str(tmp_path / "rc_disp")
    ckpt = str(tmp_path / "rc_ckpt")
    batches = _batches()
    _land(spark, src, batches[:5])
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp, ckpt, 1e9,
        para_index_path=pidx, max_live_dirs=4,
    )
    # simulate a fold that crashed PAST the point of no return: stage
    # a committed marker whose plan folds the two oldest live dirs
    lives = sorted(
        d for d in os.listdir(disp) if d.startswith("mb=")
    )[:2]
    marker = os.path.join(disp, ".compact-commit-deadbeef")
    os.makedirs(marker)
    spark.read.parquet(
        *[os.path.join(disp, d) for d in lives]
    ).coalesce(1).write.mode("overwrite").parquet(marker)
    # the staged-write leaves _SUCCESS etc.; add the plan the recovery
    # rolls forward from
    with open(os.path.join(marker, "_plan.json"), "w") as fh:
        json.dump({"sources": lives, "dest": "mb=-1"}, fh)

    # the remaining 4 arrive (fresh directories only — rewriting the
    # processed ones would register new file names as new input)
    for n, rows in enumerate(batches[5:], start=5):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{n:02d}")
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp, ckpt, 1e9,
        para_index_path=pidx, max_live_dirs=4,
    )
    got = {
        r.doc_id: r.disposition
        for r in read_dispositions(spark, disp).collect()
    }
    assert got == want
    # the marker was rolled forward, not leaked
    assert not any(d.startswith(".compact") for d in os.listdir(disp))
    assert live_batch_dirs(spark, disp, "mb") <= 5


def test_durable_sketch_stream_bounds_partials(spark, tmp_path):
    """run_partial_stream_durable with max_live_dirs folds committed
    partials in-lifecycle; the decoupled merge over the folded
    directory equals the unfolded run's merge."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_merge,
        kmv_partial_sketches,
    )
    from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
        _MICRO_BATCH_COL,
        read_partials,
        run_partial_stream_durable,
    )

    src = str(tmp_path / "kv_src")
    rows = [(f"t{j % 3}", f"v{j}") for j in range(120)]
    for n in range(10):
        spark.createDataFrame(
            rows[12 * n: 12 * (n + 1)], "event_type string, value string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{n:02d}")

    def per_batch(batch_df, batch_id):
        return kmv_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            ["event_type"], "value", _MICRO_BATCH_COL, 16,
        )

    def _go(name, max_live):
        stream = (
            spark.readStream.schema("event_type string, value string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/b*")
        )
        pdir = str(tmp_path / f"{name}_partials")
        run_partial_stream_durable(
            stream, per_batch, pdir, str(tmp_path / f"{name}_ckpt"),
            max_live_dirs=max_live,
        )
        merged = kmv_merge(
            read_partials(spark, pdir), ["event_type"], k=16
        )
        return pdir, {
            (r.event_type, round(r.est_distinct, 6))
            for r in merged.collect()
        }

    pdir, got = _go("fold", 4)
    _, want = _go("flat", None)
    assert got == want and len(got) == 3
    assert live_batch_dirs(spark, pdir, "micro_batch") <= 5


def test_replay_after_fold_excludes_inflight_label(spark, tmp_path):
    """The replay guard, isolated: batch b3's first attempt writes its
    increments and crashes BEFORE the checkpoint commit; maintenance
    then folds the index. If the fold swallowed mb=b3, the replayed
    attempt's overwrite would land NEXT TO the folded copy and double
    b3's rows. exclude_labels keeps b3 live and un-folded, so the
    replay overwrite stays idempotent."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _manifest_tables,
        dedup_increment,
        index_stats,
        index_vacuum,
        minhash_index_compact,
    )

    seed = spark.createDataFrame([_doc(1), _doc(2, "seed two")], _SCHEMA)
    idx = str(tmp_path / "rg_idx")
    minhash_index_build(seed, idx, id_col="doc_id", threshold=0.5,
                        index_buckets=8)
    empty = spark.createDataFrame([], _SCHEMA)
    with cached_scope():
        for b in range(4):  # b0-b2 committed; b3 is the crashed attempt
            dedup_increment(
                empty,
                spark.createDataFrame(
                    [_doc(100 + b, f"batch {b} entry")], _SCHEMA
                ),
                idx, id_col="doc_id",
                update_index=True, update_label=f"b{b}",
            ).count()
        stats_before = index_stats(spark, idx)

        # maintenance fires while b3 is still the in-flight batch
        minhash_index_compact(spark, idx, exclude_labels={"b3"})
        index_vacuum(spark, idx)
        live = _manifest_tables(spark, idx, ["bands", "shingles"])
        for t in ("bands", "shingles"):
            assert "mb=b3" in live[t], live
            assert len(live[t]) == 2, live  # folded base + live b3

        # the replay: same label, same shard — must OVERWRITE, not add
        dedup_increment(
            empty,
            spark.createDataFrame([_doc(103, "batch 3 entry")], _SCHEMA),
            idx, id_col="doc_id",
            update_index=True, update_label="b3",
        ).count()
        stats_after = index_stats(spark, idx)
    for key in ("bands_rows", "shingles_rows", "components_rows"):
        assert stats_after[key] == stats_before[key], (
            key, stats_before, stats_after,
        )
