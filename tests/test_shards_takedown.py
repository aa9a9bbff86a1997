"""Takedown of the MATERIALIZED outputs (operators/shards.py): the
training shard table and the streaming dispositions table — physical,
partition-bounded, crash-safe, replay-idempotent deletion, reachable
through the takedown orchestrator as kinds 'shards'/'dispositions'."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.sampling import (
    mix_corpora,
    mix_epochs,
    write_training_shards,
)
from etl_prometheus2clickhouse_spark.operators.shards import (
    dispositions_delete,
    read_shards_meta,
    recover_partition_swap,
    shards_delete,
)

N_SHARDS = 8
SPEC = {
    "kind": "mix_corpora",
    "salt": 12345,
    "sources": [
        {"name": "web_en", "rate": 0.25},
        {"name": "curated", "rate": 1.0},
    ],
}


def _docs(spark, n=400):
    return spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def _mix(spark, docs):
    return mix_corpora(
        [
            (docs.where(F.col("lang") == "en"), "web_en", 0.25),
            (docs.where(F.col("lang") != "en"), "curated", 1.0),
        ],
        id_col="doc_id",
    )


def _listing(path):
    """{shard dir: sorted (file, size, mtime_ns)} — the byte witness
    that unaffected shards were not rewritten."""
    out = {}
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if not (d.startswith("__shard=") or d.startswith("mb=")):
            continue
        out[d] = sorted(
            (f, os.path.getsize(os.path.join(full, f)),
             os.stat(os.path.join(full, f)).st_mtime_ns)
            for f in os.listdir(full)
            if not f.startswith(".")
        )
    return out


def _rows(spark, path):
    return sorted(
        (r.doc_id, r.source, r.mix_key, r["__shard"])
        for r in spark.read.parquet(path)
        .select("doc_id", "source", "mix_key", "__shard")
        .collect()
    )


def test_shards_delete_spec_plans_scan_free_and_bounds_rewrite(
    spark, tmp_path
):
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    write_training_shards(_mix(spark, docs), path, N_SHARDS, key_spec=SPEC)
    assert read_shards_meta(spark, path)["key_spec"] == SPEC
    before = _rows(spark, path)
    listing0 = _listing(path)
    dele_ids = [r.doc_id for r in
                spark.read.parquet(path).select("doc_id").distinct()
                .orderBy("doc_id").limit(5).collect()]
    dele = spark.createDataFrame([(i,) for i in dele_ids], "doc_id long")
    rep = shards_delete(spark, path, dele, "case-1")
    assert rep["planned_via"] == "key_spec"
    # every shard that actually held a deleted row is in the plan
    actually = {s for (d, _, _, s) in before if d in set(dele_ids)}
    assert actually <= set(rep["affected_shards"])
    assert rep["deleted_rows"] == sum(
        1 for (d, _, _, _) in before if d in set(dele_ids)
    ) > 0
    # surviving content is exactly the original minus the ids
    want = [t for t in before if t[0] not in set(dele_ids)]
    assert _rows(spark, path) == want
    # byte witness: shards outside the plan were not touched
    listing1 = _listing(path)
    for d, files in listing0.items():
        s = int(d.split("=")[1])
        if s not in set(rep["affected_shards"]):
            assert listing1[d] == files, f"untouched shard {d} rewritten"
    # within-shard sort survives the rewrite (file-level check)
    import pyarrow.parquet as pq

    for d in listing1:
        for f, _, _ in listing1[d]:
            if f.endswith(".parquet"):
                keys = pq.read_table(
                    os.path.join(path, d, f), columns=["mix_key"]
                )["mix_key"].to_pylist()
                assert keys == sorted(keys)


def test_shards_delete_replay_is_idempotent_and_scan_fallback(
    spark, tmp_path
):
    docs = _docs(spark, 200)
    path = str(tmp_path / "nospec")
    write_training_shards(_mix(spark, docs), path, 4)  # no key_spec
    before = _rows(spark, path)
    dele = spark.createDataFrame([(6,), (7,), (9999,)], "doc_id long")
    rep = shards_delete(spark, path, dele, "case-2")
    assert rep["planned_via"] == "scan"
    want = [t for t in before if t[0] not in (6, 7)]
    assert _rows(spark, path) == want
    rep2 = shards_delete(spark, path, dele, "case-2")
    assert rep2["deleted_rows"] == 0
    assert _rows(spark, path) == want


def test_shards_delete_survives_fully_emptied_shards(spark, tmp_path):
    """A delete that emptied its shards entirely must stay replayable:
    the resume (and any later delete hashing into the emptied shards)
    completes with 0 rows instead of failing schema inference on the
    file-less directories."""
    docs = _docs(spark, 40)
    path = str(tmp_path / "allgone")
    write_training_shards(_mix(spark, docs), path, 4, key_spec=SPEC)
    # materialize the id list first — the takedown orchestrator stages
    # ids to parquet for exactly this reason (a frame lazily reading
    # the table being rewritten would dangle on replay)
    every = spark.createDataFrame(
        [(r.doc_id,) for r in
         spark.read.parquet(path).select("doc_id").distinct().collect()],
        "doc_id long",
    )
    rep = shards_delete(spark, path, every, "wipe")
    assert rep["deleted_rows"] > 0
    # every shard dir is now file-less (a fully-emptied table has
    # nothing left for parquet schema inference — check at file level)
    for d in os.listdir(path):
        if d.startswith("__shard="):
            assert not [
                f for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            ], d
    # replay of the same takedown (crash-before-state-commit resume)
    rep2 = shards_delete(spark, path, every, "wipe")
    assert rep2["deleted_rows"] == 0
    # a later delete whose candidates land in the emptied shards
    rep3 = shards_delete(
        spark, path,
        spark.createDataFrame([(1,), (2,)], "doc_id long"), "wipe-2",
    )
    assert rep3["deleted_rows"] == 0


def test_shards_delete_epochs_spec_removes_every_copy(spark, tmp_path):
    docs = _docs(spark, 150).drop("lang")
    epochs = {"a": 2.4, "b": 0.7}
    spec = {
        "kind": "mix_epochs",
        "salt": 777,
        "sources": [{"name": "a", "epochs": 2.4},
                    {"name": "b", "epochs": 0.7}],
    }
    mixed = mix_epochs(
        [(docs, "a"), (docs, "b")], epochs, id_col="doc_id", salt=777
    )
    path = str(tmp_path / "ep")
    write_training_shards(mixed, path, 4, key_spec=spec)
    before = _rows(spark, path)
    dele = spark.createDataFrame([(10,), (11,), (12,)], "doc_id long")
    rep = shards_delete(spark, path, dele, "case-3")
    assert rep["planned_via"] == "key_spec"
    want = [t for t in before if t[0] not in (10, 11, 12)]
    assert _rows(spark, path) == want
    left = spark.read.parquet(path).where(
        F.col("doc_id").isin(10, 11, 12)
    ).count()
    assert left == 0


def test_crash_mid_swap_heals_on_replay(spark, tmp_path, monkeypatch):
    """Crash AFTER the .commit-* rename (content durable) but BEFORE
    the live swap: the next delete call rolls the swap forward first,
    then its own anti-join is a no-op — final content correct."""
    import etl_prometheus2clickhouse_spark.operators.shards as sh

    docs = _docs(spark, 200)
    path = str(tmp_path / "crash")
    write_training_shards(_mix(spark, docs), path, 4, key_spec=SPEC)
    before = _rows(spark, path)
    dele = spark.createDataFrame([(6,), (9,)], "doc_id long")

    real_swap = sh._swap_partitions

    def crashing_swap(spark_, path_, part_col, affected, writer_fn):
        import uuid as _uuid

        jvm, fs, _ = sh._hadoop_fs(spark_, path_)
        tag = _uuid.uuid4().hex[:8]
        staged = os.path.join(path_, f".staged-{tag}")
        writer_fn(staged)
        for v in affected:
            p = jvm.org.apache.hadoop.fs.Path(
                os.path.join(staged, f"{part_col}={v}")
            )
            if not fs.exists(p):
                fs.mkdirs(p)
        commit = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path_, f".commit-{tag}")
        )
        assert fs.rename(jvm.org.apache.hadoop.fs.Path(staged), commit)
        raise RuntimeError("simulated crash before the live swap")

    monkeypatch.setattr(sh, "_swap_partitions", crashing_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        shards_delete(spark, path, dele, "case-4")
    # live table still readable (old content — commit not yet applied)
    monkeypatch.setattr(sh, "_swap_partitions", real_swap)
    shards_delete(spark, path, dele, "case-4")
    want = [t for t in before if t[0] not in (6, 9)]
    assert _rows(spark, path) == want
    # and a .staged-* orphan (crash BEFORE the point of no return)
    # is simply discarded
    os.makedirs(os.path.join(path, ".staged-deadbeef/__shard=0"))
    recover_partition_swap(spark, path, "__shard=")
    assert not os.path.exists(os.path.join(path, ".staged-deadbeef"))
    assert _rows(spark, path) == want


def test_shards_append_merges_only_receiving_shards(spark, tmp_path):
    """Incremental publication: a batch re-merges ONLY the shards its
    keys land in (others byte-identical), the merged table equals the
    one-shot write of the union, sorted order survives, and a replayed
    append is a no-op (mix rows are unique by construction)."""
    from etl_prometheus2clickhouse_spark.operators.shards import (
        shards_append,
    )

    docs = _docs(spark, 300)
    full = _mix(spark, docs)
    base = full.where(F.col("doc_id") % 4 != 2)
    batch = full.where(F.col("doc_id") % 4 == 2)
    path = str(tmp_path / "inc")
    write_training_shards(base, path, N_SHARDS)
    listing0 = _listing(path)
    rep = shards_append(spark, path, batch, "b1")
    assert rep["appended_rows"] == batch.count() > 0
    # equals the one-shot write of the union
    oneshot = str(tmp_path / "oneshot")
    write_training_shards(full, oneshot, N_SHARDS)
    assert _rows(spark, path) == _rows(spark, oneshot)
    # non-receiving shards untouched
    for d, files in listing0.items():
        s = int(d.split("=")[1])
        if s not in set(rep["affected_shards"]):
            assert _listing(path)[d] == files, d
    # sorted within files
    import pyarrow.parquet as pq

    for d, files in _listing(path).items():
        for f, _, _ in files:
            if f.endswith(".parquet"):
                keys = pq.read_table(
                    os.path.join(path, d, f), columns=["mix_key"]
                )["mix_key"].to_pylist()
                assert keys == sorted(keys)
    # replay converges (no duplicates)
    rep2 = shards_append(spark, path, batch, "b1")
    assert rep2["appended_rows"] == 0
    assert _rows(spark, path) == _rows(spark, oneshot)
    # a geometry-less legacy table refuses loudly
    os.remove(os.path.join(path, "_shards_meta.json"))
    with pytest.raises(ValueError, match="no _shards_meta"):
        shards_append(spark, path, batch, "b2")


def _write_dispositions(spark, root):
    for b, rows in [
        (0, [(1, "kept"), (2, "duplicate")]),
        (1, [(3, "kept"), (4, "quality")]),
        (2, [(5, "kept"), (6, "kept")]),
    ]:
        spark.createDataFrame(
            rows, "doc_id long, disposition string"
        ).coalesce(1).write.parquet(os.path.join(root, f"mb={b}"))


def test_dispositions_delete_touches_only_affected_batches(
    spark, tmp_path
):
    root = str(tmp_path / "disp")
    _write_dispositions(spark, root)
    listing0 = _listing(root)
    dele = spark.createDataFrame([(3,), (6,)], "doc_id long")
    rep = dispositions_delete(spark, root, dele, "case-5")
    assert rep["affected_batches"] == [1, 2]
    assert rep["deleted_rows"] == 2
    got = sorted(
        (r.doc_id, r.disposition, r.mb)
        for r in spark.read.parquet(root).collect()
    )
    assert got == [(1, "kept", 0), (2, "duplicate", 0), (4, "quality", 1),
                   (5, "kept", 2)]
    assert _listing(root)["mb=0"] == listing0["mb=0"]
    # replay: nothing left to delete
    rep2 = dispositions_delete(spark, root, dele, "case-5")
    assert rep2["deleted_rows"] == 0 and rep2["affected_batches"] == []


def test_takedown_orchestrator_spans_materialized_outputs(
    spark, tmp_path
):
    """The compliance story end-to-end: one takedown() call sweeps a
    shard table AND the dispositions table, reaches 'compacted'
    (compact is a documented physical-delete no-op for these kinds),
    and the audit record survives."""
    from etl_prometheus2clickhouse_spark.operators.takedown import (
        takedown,
        takedown_status,
    )

    docs = _docs(spark, 200)
    shards = str(tmp_path / "out_shards")
    write_training_shards(_mix(spark, docs), shards, 4, key_spec=SPEC)
    disp = str(tmp_path / "out_disp")
    _write_dispositions(spark, disp)
    dele = spark.createDataFrame([(2,), (3,)], "doc_id long")
    out = takedown(
        spark,
        dele,
        [("shards", shards), ("dispositions", disp)],
        str(tmp_path),
        "gdpr-outputs",
        id_col="doc_id",
        compact=True,
        vacuum=True,
    )
    assert out["complete"]
    assert out["indexes"]["0:shards"]["report"]["planned_via"] == "key_spec"
    assert all(
        v["status"] == "compacted" for v in out["indexes"].values()
    )
    assert spark.read.parquet(shards).where(
        F.col("doc_id").isin(2, 3)
    ).count() == 0
    assert spark.read.parquet(disp).where(
        F.col("doc_id").isin(2, 3)
    ).count() == 0
    st = takedown_status(spark, str(tmp_path), "gdpr-outputs")
    assert st is not None and all(
        v["status"] == "compacted" for v in st["indexes"].values()
    )
    # the auditor's closing step over the physical kinds
    from etl_prometheus2clickhouse_spark.operators.takedown import (
        takedown_verify,
    )

    ver = takedown_verify(spark, str(tmp_path), "gdpr-outputs")
    assert ver["clean"] and all(
        v["residual_ids"] == 0 for v in ver["indexes"].values()
    )
