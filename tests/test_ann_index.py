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
    mbs = {
        p.name
        for p in (tmp_path / "idxc" / "codes").iterdir()
        if p.name.startswith("mb=")
    }
    assert mbs == {"mb=base"}


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
