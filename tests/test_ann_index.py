"""Incremental ANN index (operators/ann_index.py): model persistence
round-trip, append-with-stored-model equivalence to one-shot encoding,
replay idempotence, and the fail-loud label contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.ann_index import (
    ann_index_append,
    ann_index_build,
    ann_index_model,
    ann_index_search,
    ivfpq_model_from_json,
    ivfpq_model_to_json,
)
from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.operators.similarity import (
    cosine_topk_ivfpq_codes,
    ivfpq_encode,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _topk(df):
    return {
        (r.query_id, r.rank): (r.neighbor_id, round(r.cosine_sim, 6))
        for r in df.collect()
    }


def test_build_append_search_equals_one_shot(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "idx")
    with cached_scope():
        model = ann_index_build(
            base, path, dim=64, n_cells=32, m=4, k_codes=16,
            quantizers="first",
        )
        ann_index_append(shard, path, "w2")
        got = _topk(
            ann_index_search(
                emb.where(F.col("vec_id") < 10), path, emb,
                k=5, n_probe=8, n_candidates=50,
            )
        )
        # one-shot: the SAME stored model encodes everything at once
        want = _topk(
            cosine_topk_ivfpq_codes(
                ivfpq_encode(emb, model),
                model,
                emb,
                emb.where(F.col("vec_id") < 10),
                k=5,
                n_probe=8,
                n_candidates=50,
            )
        )
    assert got == want and len(got) == 50


def test_model_json_round_trip_encodes_identically(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir).where(F.col("vec_id") % 5 != 0)
    path = str(tmp_path / "idxm")
    with cached_scope():
        model = ann_index_build(
            emb, path, dim=64, n_cells=16, m=4, k_codes=8,
        )
        loaded = ann_index_model(spark, path)
        assert ivfpq_model_to_json(model) == ivfpq_model_to_json(loaded)
        a = {
            (r.id, r.cell, tuple(r.codes))
            for r in ivfpq_encode(emb.limit(50), model).collect()
        }
        b = {
            (r.id, r.cell, tuple(r.codes))
            for r in ivfpq_encode(emb.limit(50), loaded).collect()
        }
    assert a == b
    with pytest.raises(ValueError, match="not an IVFPQ"):
        ivfpq_model_from_json('{"kind": "bpe", "merges": []}')


def test_append_replay_is_idempotent(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "idxr")
    with cached_scope():
        ann_index_build(base, path, dim=64, n_cells=16, m=4, k_codes=8)
        ann_index_append(shard, path, "w2")
        n1 = spark.read.parquet(f"{path}/codes").count()
        ann_index_append(shard, path, "w2")  # replay
        n2 = spark.read.parquet(f"{path}/codes").count()
    assert n1 == n2 == emb.count()


def test_append_label_contract(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir).limit(20)
    path = str(tmp_path / "idxl")
    with cached_scope():
        ann_index_build(emb, path, dim=64, n_cells=4, m=4, k_codes=4)
    with pytest.raises(ValueError, match="reserved"):
        ann_index_append(emb, path, "base")
    with pytest.raises(ValueError, match="filesystem-safe"):
        ann_index_append(emb, path, "a/b")


def test_compaction_preserves_search(spark, sf_dir, tmp_path):
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_compact,
    )

    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "idxc")
    q = emb.where(F.col("vec_id") < 10)
    with cached_scope():
        ann_index_build(base, path, dim=64, n_cells=16, m=4, k_codes=8)
        ann_index_append(shard, path, "w2")
        want = _topk(ann_index_search(q, path, emb, k=5))
        counts = ann_index_compact(spark, path)
        got = _topk(ann_index_search(q, path, emb, k=5))
    assert got == want
    assert counts["codes_rows"] == emb.count()
    assert counts["vectors_rows"] == emb.count()
    # the swap is a manifest commit: one live dir per table; vacuum
    # reclaims the superseded increments, search unchanged throughout
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
    )

    m = _read_manifest(spark, path)
    assert len(m["tables"]["codes"]) == 1
    assert len(m["tables"]["vectors"]) == 1
    index_vacuum(spark, path)
    mbs = {
        p.name
        for p in (tmp_path / "idxc" / "codes").iterdir()
        if p.name.startswith("mb=")
    }
    assert mbs == set(m["tables"]["codes"])
    with cached_scope():
        assert _topk(ann_index_search(q, path, emb, k=5)) == want


def test_search_probe_prunes_cell_partitions(spark, sf_dir, tmp_path):
    """The probe-set union must survive the (mb, cell) increment
    layout as a PARTITION filter on cell — the IVFPQ pruning witness,
    re-pinned on the incremental index's directory structure."""
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "idxpf")
    with cached_scope():
        ann_index_build(
            emb.where(F.col("vec_id") % 5 != 0), path,
            dim=64, n_cells=32, m=4, k_codes=16,
        )
        ann_index_append(emb.where(F.col("vec_id") % 5 == 0), path, "w2")
        out = ann_index_search(
            emb.where(F.col("vec_id") < 10), path, emb, k=5, n_probe=8
        )
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cell" in ln
    ]
    assert pf, plan
    # probed cells are a strict subset of the 32 built
    vals = pf[0].split("INSET ")[1] if "INSET" in pf[0] else (
        pf[0].split("IN (")[1]
    )
    n = len(vals.split(","))
    assert n < 32, pf[0]


def test_streaming_ingest_kill_and_restart(spark, sf_dir, tmp_path):
    """Streaming ANN ingestion under a checkpoint: run over the first
    shard file, stop, land a second file, restart — only unseen input
    is processed, and the search over the grown table equals one-shot
    encoding of everything with the stored model."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        ivfpq_encode,
    )
    from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
        run_streaming_ann_ingest,
    )

    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "sidx")
    src = str(tmp_path / "sin")
    ckpt = str(tmp_path / "sckpt")
    q = emb.where(F.col("vec_id") < 10)
    with cached_scope():
        model = ann_index_build(
            base, path, dim=64, n_cells=16, m=4, k_codes=8
        )
        w1 = shard.where(F.col("vec_id") % 2 == 0)
        w2 = shard.where(F.col("vec_id") % 2 == 1)
        w1.coalesce(1).write.parquet(f"{src}/b0")
        stream = lambda: (  # noqa: E731
            spark.readStream.schema(shard.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/b*")
        )
        run_streaming_ann_ingest(stream(), path, ckpt)
        n_after_w1 = spark.read.parquet(f"{path}/codes").count()
        assert n_after_w1 == base.count() + w1.count()
        # restart with the same checkpoint: only w2 is processed
        w2.coalesce(1).write.parquet(f"{src}/b1")
        run_streaming_ann_ingest(stream(), path, ckpt)
        assert (
            spark.read.parquet(f"{path}/codes").count() == emb.count()
        )
        got = _topk(ann_index_search(q, path, emb, k=5))
        want = _topk(
            cosine_topk_ivfpq_codes(
                ivfpq_encode(emb, model), model, emb, q, k=5
            )
        )
    assert got == want


def test_search_from_persisted_vectors_equals_corpus_rescore(
    spark, sf_dir, tmp_path
):
    """Omitting `corpus` rescores against the index's own id-bucketed
    vector table pruned to the candidates' vp= partitions — results
    must be row-identical to the caller-supplied-corpus rescore."""
    import os as _os

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    queries = emb.where(F.col("vec_id") < 8)
    path = str(tmp_path / "annv")
    dim = len(emb.select("embedding").first()[0])
    ann_index_build(corpus, path, dim, n_cells=8, train_sample=512,
                    vec_buckets=16)
    ann_index_append(shard, path, "w2")
    with_corpus = ann_index_search(
        queries, path, emb, k=5, n_probe=4, n_candidates=20
    ).collect()
    from_index = ann_index_search(
        queries, path, k=5, n_probe=4, n_candidates=20
    ).collect()
    assert sorted(map(tuple, with_corpus)) == sorted(map(tuple, from_index))
    # the vector table is genuinely vp-bucketed in BOTH increments
    for mb in ("mb=base", "mb=w2"):
        parts = [
            d for d in _os.listdir(_os.path.join(path, "vectors", mb))
            if d.startswith("vp=")
        ]
        assert len(parts) >= 2, (mb, parts)


def test_int_id_index_prunes_to_correct_vp_partitions(
    spark, sf_dir, tmp_path
):
    """xxhash64 is input-type-sensitive: the vp= bucketing must hash
    the id CAST TO LONG on the write side to match the search side's
    bigint neighbor_id derivation — an index built from an INT id
    column must return the same top-k from its own vector table as
    from a caller-supplied corpus (it used to prune to the wrong vp=
    partitions and silently drop true neighbors)."""
    from pyspark.sql import functions as F

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("vec_id", F.col("vec_id").cast("int"))
    )
    queries = emb.where(F.col("vec_id") < 8)
    path = str(tmp_path / "annint")
    dim = len(emb.select("embedding").first()[0])
    ann_index_build(emb, path, dim, n_cells=8, train_sample=512,
                    vec_buckets=64)
    with_corpus = ann_index_search(
        queries, path, emb, k=5, n_probe=4, n_candidates=20
    ).collect()
    from_index = ann_index_search(
        queries, path, k=5, n_probe=4, n_candidates=20
    ).collect()
    assert sorted(map(tuple, with_corpus)) == sorted(map(tuple, from_index))
    assert len(from_index) == 8 * 5


def test_vector_rescore_read_is_partition_pruned(spark, sf_dir, tmp_path):
    """The pruned vectors read pushes vp as a PARTITION filter and its
    probed file/byte share is strictly below the whole table."""
    import os as _os

    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        probe_economics,
        probed_partition_plan,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "annp")
    dim = len(emb.select("embedding").first()[0])
    ann_index_build(emb, path, dim, n_cells=8, train_sample=512,
                    vec_buckets=16)
    vec_dir = _os.path.join(path, "vectors")
    plan = probed_partition_plan(spark, vec_dir, "vp", [0, 1])
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "vp" in pf[0], plan
    econ = probe_economics(spark, vec_dir, "vp", [0, 1])
    assert 0 < econ["files_probed"] < econ["files_total"], econ
    assert 0 < econ["bytes_probed"] < econ["bytes_total"], econ


def _clustered_vecs(spark, n, dim, centers, seed, id_start=0):
    """Deterministic synthetic vectors around the given centers."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        c = np.asarray(centers[i % len(centers)], dtype=np.float64)
        v = c + 0.05 * rng.standard_normal(dim)
        rows.append((id_start + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_retrain_recovers_recall_on_drifted_shard(spark, tmp_path):
    """ann_index_append freezes the quantizers forever; when a shard
    drifts away from the trained distribution, search recall for
    queries in the drifted region degrades. ann_index_retrain must
    (a) train fresh quantizers on the CURRENT stored vectors,
    (b) re-encode every increment, (c) swap codes+model in one atomic
    manifest commit ONLY when the recall gate passes — and recall on
    the drifted queries must recover."""
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_retrain,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
    )
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        ann_recall,
        cosine_topk_bruteforce,
    )

    dim = 8
    # base distribution: clusters near the first axis directions
    base_centers = [list(np.eye(dim)[j]) for j in range(4)]
    base = _clustered_vecs(spark, 256, dim, base_centers, seed=1)
    # drifted shard: 8 well-separated far-away sub-clusters the frozen
    # coarse cells collapse into one or two cells (so the old ADC scan
    # drowns each query's true sub-cluster in the others' noise), but
    # a retrained quantizer isolates per-cell
    drift_centers = [list(-4.0 * np.eye(dim)[j]) for j in range(dim)]
    shard = _clustered_vecs(
        spark, 128, dim, drift_centers, seed=2, id_start=10_000
    )
    path = str(tmp_path / "annrt")
    ann_index_build(
        base, path, dim, n_cells=16, m=4, k_codes=16,
        train_sample=256, vec_buckets=8,
    )
    ann_index_append(shard, path, "w2")
    queries = shard.where(F.col("vec_id") < 10_016)

    # n_candidates covers two whole post-retrain cells (~16-member
    # sub-clusters), so once the retrained cells isolate the drifted
    # sub-clusters the EXACT rescore makes recall structural — the
    # before/after gap measures cell assignment, not PQ tie-breaks
    def _mean_recall():
        exact = cosine_topk_bruteforce(
            base.unionByName(shard), queries, k=5
        ).select("query_id", "neighbor_id")
        approx = ann_index_search(
            queries, path, k=5, n_probe=2, n_candidates=40
        )
        return float(
            ann_recall(exact, approx).agg(F.avg("recall_at_k")).first()[0]
        )

    r_before = _mean_recall()
    report = ann_index_retrain(
        spark, path, queries=queries, k=5, n_probe=2, n_candidates=40,
        train_sample=384,
    )
    assert report["swapped"], report
    assert report["recall_new"] >= report["recall_old"], report
    r_after = _mean_recall()
    assert r_after >= r_before, (r_before, r_after, report)
    # drift genuinely recovered: full recall after, strictly better
    # than before (the magnitude of the gap is a PQ-geometry artifact
    # — IVF assignment is partially drift-robust because query and
    # corpus vectors mis-assign CONSISTENTLY — so the pinned contract
    # is strict improvement + recovery, not an arbitrary delta)
    assert r_after == 1.0, (r_before, r_after)
    assert r_before < r_after, (r_before, r_after)
    assert report["recall_new"] > report["recall_old"], report
    # codes and model swapped TOGETHER in the manifest
    m = _read_manifest(spark, path)
    assert m["tables"]["codes"] == [f"mb={report['label']}"]
    assert m["tables"]["model"] == [f"mb={report['label']}"]
    # vectors untouched (both increments still live)
    assert sorted(m["tables"]["vectors"]) == ["mb=base", "mb=w2"]
    index_vacuum(spark, path)
    assert _mean_recall() == r_after


def test_retrain_gate_rolls_back_when_no_gain(spark, tmp_path):
    """An impossible min_recall_gain must leave the index EXACTLY as
    it was: no manifest commit, no new dirs, search unchanged."""
    import os as _os

    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_retrain,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
    )

    emb = _emb(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "anng")
    dim = len(emb.select("embedding").first()[0])
    ann_index_build(emb, path, dim, n_cells=8, train_sample=512,
                    vec_buckets=8)
    queries = emb.where(F.col("vec_id") < 8)
    before = sorted(
        map(tuple, ann_index_search(queries, path, k=5).collect())
    )
    v_before = _read_manifest(spark, path)["version"]
    report = ann_index_retrain(
        spark, path, queries=queries, k=5, min_recall_gain=2.0,
    )
    assert not report["swapped"], report
    assert _read_manifest(spark, path)["version"] == v_before
    after = sorted(
        map(tuple, ann_index_search(queries, path, k=5).collect())
    )
    assert before == after
    # the rollback report must not dangle a reference to the deleted
    # increment dirs, and n_vectors (commit-path-only) is not stamped
    assert report["label"] is None, report
    assert "n_vectors" not in report, report
    # rolled-back dirs are gone
    assert not any(
        d.startswith("mb=retrain-")
        for d in _os.listdir(_os.path.join(path, "codes"))
    )


def test_skew_witness_trips_on_planted_drift_and_retrain_rebalances(
    spark, tmp_path
):
    """Hot-cell witness (ann_occupancy_skew): a balanced build stays
    under the threshold (retrain_on_skew is a no-op); planting every
    new vector near ONE frozen centroid trips the witness; the
    triggered retrain passes the recall gate and restores cell
    balance."""
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_retrain_on_skew,
        ann_occupancy_skew,
    )

    dim = 8
    base_centers = [list(np.eye(dim)[j]) for j in range(4)]
    base = _clustered_vecs(spark, 256, dim, base_centers, seed=1)
    path = str(tmp_path / "annsk")
    ann_index_build(
        base, path, dim, n_cells=16, m=4, k_codes=16,
        train_sample=256, vec_buckets=8,
    )
    balanced = ann_occupancy_skew(spark, path)
    assert balanced["total_vectors"] == 256
    # balanced build: no single frozen cell dominates
    rep0 = ann_index_retrain_on_skew(
        spark, path, skew_threshold=max(4.0, balanced["skew"] + 0.1)
    )
    assert not rep0["triggered"] and not rep0["swapped"]

    # drift: every new vector lands in one tight far-away cluster the
    # frozen quantizer maps to a single cell
    drift = _clustered_vecs(
        spark, 512, dim, [list(-4.0 * np.eye(dim)[0])], seed=2,
        id_start=10_000,
    )
    ann_index_append(drift, path, "w2")
    skewed = ann_occupancy_skew(spark, path)
    assert skewed["skew"] > balanced["skew"], (balanced, skewed)
    # nearly all of the drifted mass collapsed into one frozen cell
    assert skewed["max_share"] >= 0.5, skewed

    queries = drift.where(F.col("vec_id") < 10_016)
    report = ann_index_retrain_on_skew(
        spark, path, skew_threshold=4.0, queries=queries,
        k=5, n_probe=4, n_candidates=40, train_sample=384,
    )
    assert report["triggered"] and report["swapped"], report
    assert report["recall_new"] >= report["recall_old"], report
    # the retrained centroids spread the drifted mass back out
    assert report["skew_after"]["skew"] < skewed["skew"], report


def test_search_snapshot_isolated_from_concurrent_append(
    spark, sf_dir, tmp_path
):
    """A search resolves the manifest ONCE — model, codes, and vectors
    all bind to that snapshot, so an append (or retrain) committing
    after the search frame is built cannot mix one version's codes
    with another's quantizers: the in-flight frame answers from
    pre-append state, and only a NEW search sees the increment."""
    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "snap_idx")
    q = emb.where(F.col("vec_id") < 10)
    with cached_scope():
        ann_index_build(base, path, dim=64, n_cells=16, m=4, k_codes=8)
        pre = _topk(ann_index_search(q, path, k=5, n_probe=8,
                                     n_candidates=50))
        lazy = ann_index_search(q, path, k=5, n_probe=8, n_candidates=50)
        ann_index_append(shard, path, "w2")
        assert _topk(lazy) == pre
        post = _topk(ann_index_search(q, path, k=5, n_probe=8,
                                      n_candidates=50))
    assert post != pre  # the new search sees the appended shard


# ---------------------------------------------------------------------------
# identity layer: overlap detection + deletion tombstones
# ---------------------------------------------------------------------------

def test_append_overlapping_ids_fails_loud(spark, sf_dir, tmp_path):
    """Re-ingesting ids already live in the vector table (the partial-
    upstream-failure accident) raises before anything is written — a
    duplicate id would surface as its own nearest neighbor in every
    future search."""
    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "idx")
    with cached_scope():
        ann_index_build(
            base, path, dim=64, n_cells=32, m=4, k_codes=16,
            quantizers="first",
        )
        ann_index_append(shard, path, "w2")
        with pytest.raises(ValueError, match="overlaps ids already live"):
            ann_index_append(shard.limit(3), path, "w3")
        # replay with the SAME label is still legal
        ann_index_append(shard, path, "w2")


def test_delete_search_equals_one_shot_on_reduced_corpus(
    spark, sf_dir, tmp_path
):
    """After ann_index_delete, search over the index equals the
    one-shot IVFADC (same frozen model) over the corpus minus the
    deleted ids — freed candidate slots go to live vectors."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_delete,
    )

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "idx")
    with cached_scope():
        model = ann_index_build(
            emb, path, dim=64, n_cells=32, m=4, k_codes=16,
            quantizers="first",
        )
        queries = emb.where(F.col("vec_id") < 10)
        before = _topk(
            ann_index_search(queries, path, k=5, n_probe=8, n_candidates=50)
        )
        # delete some ids that actually appear among the neighbors
        victims = sorted({v[0] for v in before.values()})[:3]
        dele = spark.createDataFrame(
            [(int(v),) for v in victims] + [(987654,)], "vec_id long"
        )
        rep = ann_index_delete(spark, path, dele, "takedown1")
        assert rep["deleted_vectors"] == 3  # the absent id is ignored
        got = _topk(
            ann_index_search(queries, path, k=5, n_probe=8, n_candidates=50)
        )
        reduced = emb.where(~F.col("vec_id").isin(*victims))
        want = _topk(
            cosine_topk_ivfpq_codes(
                ivfpq_encode(reduced, model),
                model,
                reduced,
                queries,
                k=5,
                n_probe=8,
                n_candidates=50,
            )
        )
    assert got == want and got != before
    assert all(v[0] not in victims for v in got.values())


def test_delete_compact_reingest_lifecycle(spark, sf_dir, tmp_path):
    """delete → compact → re-ingest: compaction physically drops
    tombstoned code/vector rows and clears the tombstone table, after
    which the freed ids append cleanly and search matches the one-shot
    over the final corpus."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_compact,
        ann_index_delete,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
    )

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "idx")
    with cached_scope():
        model = ann_index_build(
            emb, path, dim=64, n_cells=32, m=4, k_codes=16,
            quantizers="first",
        )
        dele = spark.createDataFrame([(0,), (5,)], "vec_id long")
        ann_index_delete(spark, path, dele, "d1")
        # double delete under a new label is a no-op
        assert ann_index_delete(spark, path, dele, "d2") == {
            "deleted_vectors": 0
        }
        # re-ingest before compaction is refused (id still occupied)
        with pytest.raises(ValueError, match="overlaps ids already live"):
            ann_index_append(emb.where(F.col("vec_id") == 0), path, "w2")
        out = ann_index_compact(spark, path)
        assert out.get("tombstones_cleared") is True
        index_vacuum(spark, path)
        assert _read_manifest(spark, path)["tables"]["tombstones"] == []
        ann_index_append(emb.where(F.col("vec_id") == 0), path, "w2")
        queries = emb.where(F.col("vec_id") < 10)
        got = _topk(
            ann_index_search(queries, path, k=5, n_probe=8, n_candidates=50)
        )
        final = emb.where(F.col("vec_id") != 5)
        want = _topk(
            cosine_topk_ivfpq_codes(
                ivfpq_encode(final, model), model, final, queries,
                k=5, n_probe=8, n_candidates=50,
            )
        )
    assert got == want


def test_excluded_compact_keeps_tombstoned_rows_physical(
    spark, sf_dir, tmp_path
):
    """A maintenance fold with exclude_labels keeps tombstones live —
    so it must also keep tombstoned rows PHYSICAL, or a re-ingest of
    the id would pass the overlap guard yet stay invisible and be lost
    at the next full compaction (the physical-drop/tombstone-clear
    atomicity contract)."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_compact,
        ann_index_delete,
    )

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "idx")
    with cached_scope():
        ann_index_build(
            emb.where(F.col("vec_id") < 40), path, dim=64, n_cells=8,
            m=4, k_codes=16, quantizers="first",
        )
        ann_index_append(
            emb.where((F.col("vec_id") >= 40) & (F.col("vec_id") < 60)),
            path, "w1",
        )
        dele = spark.createDataFrame([(0,)], "vec_id long")
        ann_index_delete(spark, path, dele, "d1")
        out = ann_index_compact(spark, path, exclude_labels={"w1"})
        assert out.get("tombstones_cleared") is None
        # id 0 must still occupy the identity layer
        with pytest.raises(ValueError, match="overlaps ids already live"):
            ann_index_append(emb.where(F.col("vec_id") == 0), path, "w2")
        # full compaction frees it
        out2 = ann_index_compact(spark, path)
        assert out2.get("tombstones_cleared") is True
        ann_index_append(emb.where(F.col("vec_id") == 0), path, "w2")
