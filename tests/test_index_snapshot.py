"""Versioned snapshot reads of the persisted index layer
(dedup_index.index_versions / index_snapshot +
bm25_index_search(at_version=...)): a pinned manifest version binds
every table read — postings, additive stats, tombstone visibility —
to that commit, and pruned/vacuumed versions fail loud instead of
silently resolving to something else."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.bm25_index import (
    bm25_index_append,
    bm25_index_build,
    bm25_index_compact,
    bm25_index_delete,
    bm25_index_search,
)
from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    index_snapshot,
    index_vacuum,
    index_versions,
)
from etl_prometheus2clickhouse_spark.operators.text import bm25_search

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox runs past the barn"),
    (3, "lazy dogs sleep all day the dog said"),
    (4, "quick thinking wins the day every day"),
    (5, "a completely unrelated sentence about spark"),
    (6, "quick fox drills and lazy dog naps"),
]


def _docs(spark, pred):
    return spark.createDataFrame(
        [r for r in DOCS if pred(r[0])], "doc_id long, text string"
    )


def _q(spark):
    return spark.createDataFrame(
        [(100, ["quick", "fox"]), (101, ["lazy", "dog"])],
        "query_id long, terms array<string>",
    )


def _search(spark, path, **kw):
    return sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_index_search(_q(spark), path, k=5, **kw).collect()
    )


def _oneshot(spark, docs):
    return sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_search(docs, _q(spark), k=5).collect()
    )


def test_snapshot_pins_appends_and_tombstones(spark, tmp_path):
    path = str(tmp_path / "bm25")
    with cached_scope():
        base = _docs(spark, lambda i: i <= 4)
        bm25_index_build(base, path, term_buckets=8)
        vs = index_versions(spark, path)
        assert [r["version"] for r in vs] == [1]
        v_build = vs[0]["version"]
        # append two more docs (v2), then delete doc 2 (v3+)
        bm25_index_append(_docs(spark, lambda i: i > 4), path, "w2")
        v_append = index_versions(spark, path)[-1]["version"]
        bm25_index_delete(
            spark, path,
            spark.createDataFrame([(2,)], "doc_id long"), "rtbf",
        )
        # latest read: all six docs minus the deleted one
        assert _search(spark, path) == _oneshot(
            spark, _docs(spark, lambda i: i != 2)
        )
        # pinned at the build commit: the original four docs, the
        # later delete's tombstones invisible
        assert _search(spark, path, at_version=v_build) == _oneshot(
            spark, base
        )
        # pinned at the append commit: six docs, delete invisible
        assert _search(spark, path, at_version=v_append) == _oneshot(
            spark, _docs(spark, lambda i: True)
        )
        # snapshot map itself: the build version lists no w2 dirs
        snap = index_snapshot(spark, path, v_build)
        assert all("mb=w2" not in dirs for dirs in snap.values())
        with pytest.raises(ValueError, match="no retained manifest"):
            index_snapshot(spark, path, 999)
        # compaction + vacuum reclaims the old dirs: the pinned read
        # refuses loudly rather than resolving to surviving data
        bm25_index_compact(spark, path)
        index_vacuum(spark, path)
        with pytest.raises(ValueError, match="has been vacuumed"):
            index_snapshot(spark, path, v_build)
        # latest is unaffected
        assert _search(spark, path) == _oneshot(
            spark, _docs(spark, lambda i: i != 2)
        )


def test_ann_search_snapshot(spark, tmp_path):
    """The dense leg pins too: an ANN search at the pre-append version
    equals the search that ran before the append (frozen quantizers —
    appends don't retrain, so the only difference is the snapshot's
    code/vector tables)."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_search,
    )

    path = str(tmp_path / "ann")
    rows = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(16)])
        for i in range(1, 41)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    with cached_scope():
        ann_index_build(
            emb.where(F.col("vec_id") <= 30), path, dim=16, n_cells=4,
            m=4, k_codes=8, quantizers="first",
        )
        v0 = index_versions(spark, path)[-1]["version"]
        q = emb.where(F.col("vec_id") <= 3).selectExpr(
            "vec_id as query_id", "embedding"
        )
        pre = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann_index_search(
                q, path, k=5, id_col="query_id"
            ).collect()
        )
        ann_index_append(emb.where(F.col("vec_id") > 30), path, "w2")
        pinned = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann_index_search(
                q, path, k=5, id_col="query_id", at_version=v0
            ).collect()
        )
        assert pinned == pre
        latest = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann_index_search(
                q, path, k=5, id_col="query_id"
            ).collect()
        )
        assert latest != pre  # the append is visible at latest
