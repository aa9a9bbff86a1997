"""Incremental SemDeDup against the persisted cell-partitioned vector
index (operators/semantic_index.py): exact one-shot equivalence on the
shard's rows, cross-shard duplicate detection through the index,
at-least-once replay idempotence, probe partition pruning, and
compaction decision-preservation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _read_manifest,
    index_vacuum,
    probed_partition_plan,
)
from etl_prometheus2clickhouse_spark.operators.semantic_index import (
    semantic_increment,
    semantic_index_build,
    semantic_index_compact,
)
from etl_prometheus2clickhouse_spark.operators.similarity import (
    semantic_dedup,
)


def _v(deg: float) -> list[float]:
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, _v(a)) for i, a in rows], "vec_id long, embedding array<double>"
    )


def _disp(df):
    return {
        r.vec_id: (r.cell, r.dup_of, r.kept) for r in df.collect()
    }


def test_increment_equals_one_shot(spark, sf_dir):
    """Prefix split of the real embeddings table: build on the first
    id-half, increment the rest — dispositions equal the one-shot
    semantic_dedup of the union restricted to the shard, EXACTLY (the
    module's no-caveat contract: frozen centroids + all vectors
    indexed)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half = emb.agg(F.max("vec_id")).first()[0] // 2
    corpus = emb.where(F.col("vec_id") <= half)
    shard = emb.where(F.col("vec_id") > half)
    path = f"{sf_dir}/sem_idx_scratch"

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/idx"
        with cached_scope():
            semantic_index_build(
                corpus, path, n_cells=16, threshold=0.3, centroids="first"
            )
            got = _disp(semantic_increment(shard, path))
            want = {
                k: v
                for k, v in _disp(
                    semantic_dedup(
                        emb, dim=64, n_cells=16, threshold=0.3,
                        centroids="first",
                    )
                ).items()
                if k > half
            }
    assert got == want
    # non-vacuous: real duplicates at this threshold on this corpus
    assert sum(1 for v in got.values() if not v[2]) > 0


def test_cross_shard_dups_and_replay(spark, tmp_path):
    """Planted 2-D geometry: a second shard's vector is a near-dup of
    a FIRST shard's vector only via the index (cross-shard), within-
    shard pairs resolve to the global min lower id, and a replayed
    increment is idempotent in both dispositions and stored rows
    (its own mb= rows are excluded from the probe)."""
    seed = _mk(spark, [(1, 0.0), (2, 90.0)])
    s1 = _mk(spark, [(10, 5.0), (11, 50.0)])
    s2 = _mk(spark, [(20, 48.0), (21, 3.0), (22, 49.0)])
    path = str(tmp_path / "semidx")
    with cached_scope():
        # centroids="first" → cells are the seed's own two vectors
        semantic_index_build(
            seed, path, n_cells=2, threshold=0.9, centroids="first"
        )
        d1 = _disp(
            semantic_increment(s1, path, update_index=True, update_label="s1")
        )
        # 10 @5° dups seed 1 @0° (cos 0.996); 11 @50° is fresh
        assert d1[10] == (0, 1, False)
        assert d1[11][1] is None and d1[11][2] is True
        d2 = _disp(
            semantic_increment(s2, path, update_index=True, update_label="s2")
        )
        # 20 @48° dups s1's 11 @50° — ONLY reachable through the index
        assert d2[20] == (1, 11, False)
        # 21 @3° dups seed 1 @0° (min lower id, not s1's 10 @5°)
        assert d2[21] == (0, 1, False)
        # 22 @49°: qualifying lower ids {11, 20} → min 11
        assert d2[22] == (1, 11, False)
        n_stored = spark.read.parquet(f"{path}/vectors").count()
        # replay s2: same dispositions, same stored rows
        d2b = _disp(
            semantic_increment(s2, path, update_index=True, update_label="s2")
        )
        assert d2b == d2
        assert spark.read.parquet(f"{path}/vectors").count() == n_stored
        # duplicates ARE indexed: 30 @4° must resolve to min lower id 1
        # through stored dups 10 @5° and 21 @3° even though both are
        # themselves duplicates (the one-shot's lower-id relation)
        d3 = _disp(semantic_increment(_mk(spark, [(30, 4.0)]), path))
        assert d3[30] == (0, 1, False)


def test_probe_is_a_partition_filter(spark, tmp_path):
    """The stored-vector read must push the shard's cell set as a
    PARTITION filter — unprobed cell directories pruned at file
    listing, not post-scan."""
    seed = _mk(spark, [(1, 0.0), (2, 90.0)])
    path = str(tmp_path / "semidxp")
    with cached_scope():
        semantic_index_build(
            seed, path, n_cells=2, threshold=0.9, centroids="first"
        )
    plan = probed_partition_plan(
        spark, f"{path}/vectors", "cell", [0]
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], plan


def test_compaction_preserves_decisions(spark, tmp_path):
    """Compaction is a physical rewrite behind an atomic manifest
    swap: a probe after equals the probe before, one live dir
    remains, vacuum reclaims the superseded ones."""
    seed = _mk(spark, [(1, 0.0), (2, 90.0)])
    s1 = _mk(spark, [(10, 5.0), (11, 50.0)])
    probe = _mk(spark, [(20, 48.0), (21, 3.0)])
    path = str(tmp_path / "semidxc")
    with cached_scope():
        semantic_index_build(
            seed, path, n_cells=2, threshold=0.9, centroids="first"
        )
        semantic_increment(
            s1, path, update_index=True, update_label="s1"
        ).write.format("noop").mode("overwrite").save()
        want = _disp(semantic_increment(probe, path))
        counts = semantic_index_compact(spark, path)
        got = _disp(semantic_increment(probe, path))
    assert got == want
    assert counts["vector_rows"] == 4
    live = _read_manifest(spark, path)["tables"]["vectors"]
    assert len(live) == 1 and live[0].startswith("mb=base-"), live
    index_vacuum(spark, path)
    mbs = {
        p.name
        for p in (tmp_path / "semidxc" / "vectors").iterdir()
        if p.name.startswith("mb=")
    }
    assert mbs == set(live)


def test_retrain_recovers_drifted_colocation(spark, tmp_path):
    """The frozen-centroid miss SemDeDup accepts grows under drift: a
    near-dup pair straddling the old cell boundary is missed; retrain
    re-clusters on the CURRENT stored distribution, the co-location
    gate passes, the manifest swap is atomic, and the same geometry
    probed again now catches the pair. A no-gain retrain rolls back."""
    from etl_prometheus2clickhouse_spark.operators.semantic_index import (
        _read_model,
        semantic_index_retrain,
    )

    seed = _mk(
        spark, [(1, 0.0), (2, 1.0), (3, 2.0), (4, 89.0), (5, 90.0), (6, 91.0)]
    )
    path = str(tmp_path / "semidxr")
    with cached_scope():
        semantic_index_build(seed, path, n_cells=2, threshold=0.9)
        # drifted shard: a true pair (cos 10° = 0.985) straddling the
        # 45° boundary of the seed-trained centroids — both kept
        d1 = _disp(
            semantic_increment(
                _mk(spark, [(10, 40.0), (11, 50.0)]),
                path, update_index=True, update_label="s1",
            )
        )
        assert d1[10][2] is True and d1[11][2] is True
        assert d1[10][0] != d1[11][0]  # the miss IS cross-cell
        rep = semantic_index_retrain(spark, path)
        assert rep["swapped"] is True
        assert rep["colocation_new"] > rep["colocation_old"]
        assert rep["n_vectors"] == 8
        # the same-shape pair now lands in ONE cell and resolves
        # against the stored drifted vectors through the index
        d2 = _disp(
            semantic_increment(_mk(spark, [(20, 41.0), (21, 49.0)]), path)
        )
        assert d2[20] == (d2[20][0], 10, False)
        assert d2[21][1] in (10, 11) and d2[21][2] is False
        # no-gain retrain: gated out, nothing committed
        C_before = _read_model(spark, path)[0]
        rep2 = semantic_index_retrain(
            spark, path, min_colocation_gain=0.5
        )
        assert rep2["swapped"] is False and rep2["label"] is None
        assert (_read_model(spark, path)[0] == C_before).all()


def test_stream_equals_one_shot_with_kill_and_restart(spark, tmp_path):
    """Streaming SemDeDup (streaming/curation_stream.py:
    run_streaming_semantic_dedup): batch 0 runs to completion, the
    stream stops, batch 1 lands, a RESTART from the same checkpoint
    processes ONLY it — and the accumulated dispositions equal the
    one-shot semantic_dedup over everything, restricted to the
    streamed ids (the exact-equivalence contract). A replayed body
    invocation is idempotent in dispositions and stored vectors."""
    from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
        read_dispositions,
        run_streaming_semantic_dedup,
        semantic_dedup_body,
    )

    seed_rows = [(1, 0.0), (2, 90.0)]
    b0_rows = [(10, 5.0), (11, 50.0)]
    b1_rows = [(20, 48.0), (21, 87.0)]
    seed = _mk(spark, seed_rows)
    all_vecs = _mk(spark, seed_rows + b0_rows + b1_rows)
    path = str(tmp_path / "ssem_idx")
    src = str(tmp_path / "ssem_src")
    disp_dir = str(tmp_path / "ssem_disp")
    ckpt = str(tmp_path / "ssem_ckpt")

    def _stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/b*")
        )

    with cached_scope():
        want = {
            k: v
            for k, v in _disp(
                semantic_dedup(
                    all_vecs, dim=2, n_cells=2, threshold=0.9,
                    centroids="first",
                )
            ).items()
            if k >= 10
        }
        semantic_index_build(
            seed, path, n_cells=2, threshold=0.9, centroids="first"
        )
        _mk(spark, b0_rows).coalesce(1).write.parquet(f"{src}/b0")
        run_streaming_semantic_dedup(_stream(), path, disp_dir, ckpt)
        assert read_dispositions(spark, disp_dir).count() == 2
        # stream stopped; new batch lands; restart from checkpoint
        _mk(spark, b1_rows).coalesce(1).write.parquet(f"{src}/b1")
        run_streaming_semantic_dedup(_stream(), path, disp_dir, ckpt)
        disp = read_dispositions(spark, disp_dir)
        assert disp.select("mb").distinct().count() == 2
        got = _disp(disp.select("vec_id", "cell", "dup_of", "kept"))
        assert got == want
        # cross-batch dup THROUGH the index: 20 @48° ~ batch-0's 11 @50°
        assert got[20][1] == 11 and got[21][1] == 2
        # replay: same dispositions, same stored rows
        n_stored = spark.read.parquet(f"{path}/vectors").count()
        body = semantic_dedup_body(path, disp_dir)
        body(_mk(spark, b1_rows), 1)
        got2 = _disp(
            read_dispositions(spark, disp_dir).select(
                "vec_id", "cell", "dup_of", "kept"
            )
        )
        assert got2 == got
        assert spark.read.parquet(f"{path}/vectors").count() == n_stored


def test_bad_labels_and_corrupt_model(spark, tmp_path):
    seed = _mk(spark, [(1, 0.0), (2, 90.0)])
    path = str(tmp_path / "semidxb")
    with cached_scope():
        semantic_index_build(
            seed, path, n_cells=2, threshold=0.9, centroids="first"
        )
    with pytest.raises(ValueError, match="filesystem-safe"):
        semantic_increment(seed, path, update_index=True, update_label="a=b")
    with pytest.raises(ValueError, match="reserved"):
        semantic_increment(seed, path, update_index=True, update_label="base")
    # corrupt model: two rows
    m = spark.read.parquet(f"{path}/model")
    m.unionByName(m).write.mode("overwrite").parquet(
        str(tmp_path / "m_bad")
    )
    import shutil

    shutil.rmtree(f"{path}/model/mb=base")
    shutil.copytree(str(tmp_path / "m_bad"), f"{path}/model/mb=base")
    with pytest.raises(ValueError, match="corrupt model"):
        semantic_increment(seed, path)


def test_skew_witness_trips_and_semantic_retrain_rebalances(
    spark, tmp_path
):
    """Hot-cell witness (semantic_occupancy_skew): a balanced build is
    a no-op for retrain_on_skew; planting every new vector near ONE
    frozen centroid trips the witness, the triggered retrain passes
    the co-location gate, and per-cell occupancy rebalances — the
    Σ|cell|² bound the module's scale argument rests on is restored."""
    from etl_prometheus2clickhouse_spark.operators.semantic_index import (
        semantic_occupancy_skew,
        semantic_retrain_on_skew,
    )

    # four seed clusters at the axes -> 4 cells, balanced
    seed = _mk(
        spark,
        [(10 * j + i, 90.0 * j + i) for j in range(4) for i in range(2)],
    )
    path = str(tmp_path / "semsk")
    with cached_scope():
        semantic_index_build(seed, path, n_cells=4, threshold=0.99)
        balanced = semantic_occupancy_skew(spark, path)
        assert balanced["total_vectors"] == 8
        assert balanced["skew"] <= 1.2, balanced
        rep0 = semantic_retrain_on_skew(spark, path, skew_threshold=2.0)
        assert not rep0["triggered"] and not rep0["swapped"]

        # drift: new vectors over the 0°..44° arc, spaced wider than
        # the duplicate threshold (9° > arccos(.99) ≈ 8.1°) so the
        # increment adds NO true pairs — the frozen quantizer still
        # maps the whole arc to the 0° cell (the 45° boundary), so
        # one cell absorbs the entire increment and the rebalance
        # cannot cost the co-location gate anything
        drift = _mk(
            spark, [(100 + i, 9.0 * i) for i in range(5)] + [(105, 44.0)]
        )
        semantic_increment(
            drift, path, update_index=True, update_label="s1"
        )
        skewed = semantic_occupancy_skew(spark, path)
        assert skewed["skew"] > 2.0, skewed  # (2+6)/14 × 4 ≈ 2.29

        report = semantic_retrain_on_skew(
            spark, path, skew_threshold=2.0
        )
        assert report["triggered"], report
        if report["swapped"]:
            assert (
                report["skew_after"]["skew"] < skewed["skew"]
            ), report
        else:
            # the co-location gate may legitimately refuse (reported,
            # not silent) — but on this geometry it should not
            raise AssertionError(f"gate refused the rebalance: {report}")


# ---------------------------------------------------------------------------
# identity layer: overlap detection + deletion tombstones
# ---------------------------------------------------------------------------

def test_update_overlapping_ids_fails_loud(spark, tmp_path):
    """Re-presenting a live id as a new update increment raises before
    anything is written — an overlapping update would make the id its
    own stored twin (cos 1.0) in every later probe. A replay with the
    SAME label still passes (own-label exclusion)."""
    path = str(tmp_path / "idx")
    base = _mk(spark, [(1, 0.0), (2, 40.0), (3, 90.0)])
    with cached_scope():
        semantic_index_build(
            base, path, n_cells=2, threshold=0.95, centroids="first"
        )
        shard = _mk(spark, [(4, 1.0), (5, 120.0)])
        semantic_increment(
            shard, path, update_index=True, update_label="w2"
        ).collect()
        # replay: same shard, same label — legal
        semantic_increment(
            shard, path, update_index=True, update_label="w2"
        ).collect()
        overlap = _mk(spark, [(4, 2.0), (6, 200.0)])
        with pytest.raises(ValueError, match="overlaps ids already live"):
            semantic_increment(
                overlap, path, update_index=True, update_label="w3"
            ).collect()


def test_delete_then_increment_equals_one_shot_on_reduced(spark, tmp_path):
    """After semantic_index_delete, a new shard's dispositions equal
    the one-shot semantic_dedup over (reduced corpus) ∪ shard — a
    deleted near-twin no longer suppresses the new arrival."""
    from etl_prometheus2clickhouse_spark.operators.semantic_index import (
        semantic_index_delete,
    )

    path = str(tmp_path / "idx")
    # ids 1 and 2 are near-twins (1°); deleting 1 frees the slot
    base = _mk(spark, [(1, 0.0), (2, 45.0), (3, 90.0)])
    with cached_scope():
        semantic_index_build(
            base, path, n_cells=2, threshold=0.95, centroids="first"
        )
        rep = semantic_index_delete(
            spark, path,
            spark.createDataFrame([(1,), (99,)], "vec_id long"),
            "takedown1",
        )
        assert rep["deleted_vectors"] == 1  # 99 was never present
        # replayed delete recomputes identically; double delete no-ops
        assert semantic_index_delete(
            spark, path,
            spark.createDataFrame([(1,)], "vec_id long"), "takedown1",
        ) == {"deleted_vectors": 1}
        assert semantic_index_delete(
            spark, path,
            spark.createDataFrame([(1,)], "vec_id long"), "t2",
        ) == {"deleted_vectors": 0}
        shard = _mk(spark, [(10, 0.5), (11, 46.0)])
        got = _disp(semantic_increment(shard, path))
    # 10's only near-twin was the DELETED id 1 (0.5° apart) → kept now
    # (before the delete it would have been dup_of=1); 11 is 1° from
    # the live id 2 → still suppressed — exactly the one-shot's
    # lower-id relation on the reduced corpus ∪ shard
    assert got[10] == (got[10][0], None, True)
    assert got[11][1] == 2 and got[11][2] is False


def test_delete_compact_reingest_lifecycle(spark, tmp_path):
    """delete → compact → re-ingest: compaction drops tombstoned
    vector + identity rows, clears the tombstone table, and the freed
    id can be updated in again."""
    from etl_prometheus2clickhouse_spark.operators.semantic_index import (
        semantic_index_delete,
    )

    path = str(tmp_path / "idx")
    base = _mk(spark, [(1, 0.0), (2, 45.0), (3, 90.0)])
    with cached_scope():
        semantic_index_build(
            base, path, n_cells=2, threshold=0.95, centroids="first"
        )
        semantic_index_delete(
            spark, path, spark.createDataFrame([(1,)], "vec_id long"), "d1"
        )
        redo = _mk(spark, [(1, 10.0)])
        with pytest.raises(ValueError, match="overlaps ids already live"):
            semantic_increment(
                redo, path, update_index=True, update_label="w2"
            ).collect()
        out = semantic_index_compact(spark, path)
        assert out.get("tombstones_cleared") is True
        index_vacuum(spark, path)
        assert _read_manifest(spark, path)["tables"]["tombstones"] == []
        semantic_increment(
            redo, path, update_index=True, update_label="w2"
        ).collect()
        # the re-ingested id now participates as stored corpus
        probe = _mk(spark, [(20, 10.5)])
        got = _disp(semantic_increment(probe, path))
    assert got[20][1] == 1 and got[20][2] is False


def test_excluded_compact_keeps_tombstoned_rows_physical(spark, tmp_path):
    """Same atomicity contract as the BM25/ANN siblings: a fold that
    keeps tombstones (exclude_labels) keeps tombstoned rows physical,
    so the overlap guard still refuses re-ingest; only the full
    compaction that clears tombstones drops the rows."""
    from etl_prometheus2clickhouse_spark.operators.semantic_index import (
        semantic_index_delete,
    )

    path = str(tmp_path / "idx")
    base = _mk(spark, [(1, 0.0), (2, 45.0), (3, 90.0)])
    with cached_scope():
        semantic_index_build(
            base, path, n_cells=2, threshold=0.95, centroids="first"
        )
        semantic_increment(
            _mk(spark, [(4, 130.0)]), path,
            update_index=True, update_label="w1",
        ).collect()
        semantic_index_delete(
            spark, path, spark.createDataFrame([(1,)], "vec_id long"), "d1"
        )
        out = semantic_index_compact(spark, path, exclude_labels={"w1"})
        assert out.get("tombstones_cleared") is None
        redo = _mk(spark, [(1, 10.0)])
        with pytest.raises(ValueError, match="overlaps ids already live"):
            semantic_increment(
                redo, path, update_index=True, update_label="w2"
            ).collect()
        out2 = semantic_index_compact(spark, path)
        assert out2.get("tombstones_cleared") is True
        semantic_increment(
            redo, path, update_index=True, update_label="w2"
        ).collect()
