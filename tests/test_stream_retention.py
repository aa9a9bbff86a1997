"""Streaming-output retention (streaming/retention.py): folding
committed micro-batch partitions into the reserved ``<col>=-1``
partition must preserve every row and the partition column's integer
type, never touch the newest (possibly replay-targeted) batch, and —
the core contract — a kill → compact → restart sequence must neither
re-read committed input nor double-count any document."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.streaming.retention import (
    compact_stream_outputs,
)


def _write_mb(spark, root, mb, rows):
    spark.createDataFrame(rows, "doc_id long, disposition string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/mb={mb}")


def test_fold_preserves_rows_schema_and_latest(spark, tmp_path):
    root = str(tmp_path / "disp")
    for mb in range(5):
        _write_mb(
            spark, root, mb,
            [(10 * mb + i, "kept" if i % 2 else "duplicate")
             for i in range(3)],
        )
    before = spark.read.parquet(root)
    want = sorted(
        (r.doc_id, r.disposition) for r in before.collect()
    )
    assert dict(before.dtypes)["mb"] == "int"
    out = compact_stream_outputs(spark, root, "mb", keep_latest=2)
    assert out["folded_dirs"] == 3 and out["rows"] == 9, out
    after = spark.read.parquet(root)
    got = sorted((r.doc_id, r.disposition) for r in after.collect())
    assert got == want
    # integer partition type survives (folded value is -1)
    assert dict(after.dtypes)["mb"] == "int"
    assert sorted(
        r.mb for r in after.select("mb").distinct().collect()
    ) == [-1, 3, 4]
    # second fold folds the previous fold + newly-eligible batch 3
    out2 = compact_stream_outputs(spark, root, "mb", keep_latest=1)
    assert out2["rows"] == 12, out2
    assert sorted(
        r.mb
        for r in spark.read.parquet(root).select("mb").distinct().collect()
    ) == [-1, 4]
    # idempotent no-op when nothing new is foldable
    assert compact_stream_outputs(spark, root, "mb", keep_latest=1) == {
        "folded_dirs": 0, "rows": 0,
    }


def test_fold_crash_windows_recover(spark, tmp_path):
    """The fold is crash-safe at every window: an uncommitted
    ``.compact-*`` staging dir (crash before the commit rename) is
    discarded with every source intact; a ``.compact-commit-*`` dir
    whose sources were not yet deleted (crash right after the point of
    no return — previously a permanent, manual-fix data loss once the
    deletes started) rolls FORWARD from its embedded plan: sources
    deleted, folded content renamed into ``mb=-1``, every row exactly
    once."""
    import json
    import os
    import shutil

    from etl_prometheus2clickhouse_spark.streaming.retention import (
        recover_stream_outputs,
    )

    root = str(tmp_path / "dispc")
    for mb in range(4):
        _write_mb(
            spark, root, mb,
            [(10 * mb + i, "kept") for i in range(3)],
        )
    want = sorted(
        r.doc_id for r in spark.read.parquet(root).collect()
    )
    # (a) crash BEFORE the commit rename: staging is junk — discarded
    shutil.copytree(f"{root}/mb=0", f"{root}/.compact-zz")
    recover_stream_outputs(spark, root)
    assert not any(
        d.startswith(".compact") for d in os.listdir(root)
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(root).collect()
    ) == want
    # (b) crash AFTER the commit rename, before any source delete:
    # fabricate the exact on-disk state — folded content for batches
    # 0-2 under the marker, plan listing the sources, sources live
    folded = spark.read.parquet(
        f"{root}/mb=0", f"{root}/mb=1", f"{root}/mb=2"
    )
    commit = f"{root}/.compact-commit-zz"
    folded.coalesce(1).write.parquet(commit)
    with open(f"{commit}/_plan.json", "w") as f:
        json.dump(
            {"sources": ["mb=0", "mb=1", "mb=2"], "dest": "mb=-1"}, f
        )
    recover_stream_outputs(spark, root)
    after = spark.read.parquet(root)
    assert sorted(r.doc_id for r in after.collect()) == want
    assert sorted(
        r.mb for r in after.select("mb").distinct().collect()
    ) == [-1, 3]
    # recovery is idempotent; only the newest batch is foldable-exempt,
    # so a later fold (after one more batch lands) folds -1 ∪ mb=3
    recover_stream_outputs(spark, root)
    assert compact_stream_outputs(spark, root, "mb", keep_latest=1) == {
        "folded_dirs": 0, "rows": 0,
    }
    _write_mb(spark, root, 4, [(40 + i, "kept") for i in range(3)])
    assert compact_stream_outputs(spark, root, "mb", keep_latest=1)[
        "rows"
    ] == 12


def test_kill_compact_restart_curation(spark, tmp_path):
    """Run the curation stream over two batches, stop, COMPACT the
    dispositions, land a third batch, restart from the same
    checkpoint: only unseen input is processed, nothing is re-read,
    no document is double-counted, and the final dispositions equal
    the uncompacted run's."""
    from tests.test_streaming_curation import (
        _BATCHES,
        _median_ppl,
        _one_shot,
        _setup,
        _stream,
        _write_batch,
    )
    from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
        read_dispositions,
        run_streaming_curation,
    )

    with cached_scope():
        thr = _median_ppl(spark)
        want = _one_shot(spark, thr)
    seed, ref, idx = _setup(spark, tmp_path, "rc")
    src = str(tmp_path / "rc_src")
    disp_dir = str(tmp_path / "rc_disp")
    ckpt = str(tmp_path / "rc_ckpt")

    _write_batch(spark, src, _BATCHES[0], 0)
    _write_batch(spark, src, _BATCHES[1], 1)
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp_dir, ckpt, thr
    )
    # stream stopped; maintenance folds the committed batches (the
    # newest stays, in case it were an uncommitted replay target)
    out = compact_stream_outputs(spark, disp_dir, "mb", keep_latest=1)
    assert out["folded_dirs"] >= 1, out

    _write_batch(spark, src, _BATCHES[2], 2)
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp_dir, ckpt, thr
    )
    disp = read_dispositions(spark, disp_dir)
    rows = disp.collect()
    got = {r.doc_id: r.disposition for r in rows}
    streamed_ids = {r[0] for b in _BATCHES for r in b}
    # no re-read, no double-count: exactly one row per streamed doc
    assert len(rows) == len(streamed_ids)
    assert got == {k: v for k, v in want.items() if k in streamed_ids}
    # the restart created only the new batch's partition next to -1
    mbs = sorted(r.mb for r in disp.select("mb").distinct().collect())
    assert mbs[0] == -1 and len(mbs) <= 3, mbs


def test_kill_compact_restart_sketch_partials(spark, tmp_path):
    """Durable sketch partials: fold committed micro_batch partitions,
    restart the stream on new input, and the merged estimate equals
    the never-compacted run's."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_merge,
    )
    from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
        read_partials,
        stream_kmv_partials_durable,
    )

    src = str(tmp_path / "kin")
    pdir = str(tmp_path / "kparts")
    ckpt = str(tmp_path / "kckpt")

    def _land(n, lo, hi):
        spark.range(lo, hi).select(
            F.lit("g").alias("g"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{n}")

    def _run():
        stream = (
            spark.readStream.schema("g string, v string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        stream_kmv_partials_durable(
            stream, ["g"], "v", pdir, ckpt, k=64
        )

    _land(0, 0, 500)
    _land(1, 400, 900)
    _run()
    n_dirs_before = (
        spark.read.parquet(pdir).select("micro_batch").distinct().count()
    )
    assert n_dirs_before >= 2
    out = compact_stream_outputs(
        spark, pdir, "micro_batch", keep_latest=1
    )
    assert out["folded_dirs"] >= 1, out
    _land(2, 800, 1300)
    _run()
    est = kmv_merge(read_partials(spark, pdir), ["g"]).collect()
    assert len(est) == 1
    # 1300 distinct values; KMV k=64 — generous tolerance, the pinned
    # claim is no double-count blowup and no lost batch
    assert 800 < est[0].est_distinct < 1900, est
