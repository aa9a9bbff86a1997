"""The paragraph index's LEGACY v1 layout (contributor-attributed rows
inside ``paras``, no ``attrib`` table) must keep working after the
round-16 membership/attribution split: probes suppress through the
read-side tombstone anti-join, deletes stay tombstone-only, and
compaction physically drops the tombstoned rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _commit_manifest,
    _delete_path,
    _read_manifest,
    paragraph_increment,
    paragraph_index_build,
    paragraph_index_compact,
    paragraph_index_delete,
)


def _forge_v1(spark, path):
    """Rewrite a fresh v2 index into the pre-split v1 layout: the
    attribution pairs become the ``paras`` rows themselves and the
    ``attrib`` table disappears from disk and manifest — exactly what
    a round-15 build left behind."""
    pairs = spark.read.option(
        "basePath", os.path.join(path, "attrib")
    ).parquet(os.path.join(path, "attrib", "mb=base"))
    rows = pairs.select("hp", "h", "id").collect()
    sdf = spark.createDataFrame(rows, "hp int, h long, id string")
    _delete_path(spark, os.path.join(path, "paras"))
    sdf.repartition(F.col("hp")).write.mode("overwrite").partitionBy(
        "hp"
    ).parquet(os.path.join(path, "paras", "mb=base"))
    _delete_path(spark, os.path.join(path, "attrib"))
    m = _read_manifest(spark, path)
    tables = {k: v for k, v in m["tables"].items() if k != "attrib"}
    _commit_manifest(spark, path, tables)


def test_split_delete_skips_emptied_increments(spark, tmp_path):
    """A delete that empties an increment's membership entirely must
    not break LATER deletes: the one-pass (increment, bucket) hit
    election never reads a file-less directory, and an increment
    holding none of the dead hashes is not rewritten."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_index_delete,
    )

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    seed = mk([(1, "alpha beta\ngamma delta"),
               (2, "gamma delta\nepsilon zeta")])
    w1 = mk([(30, "uniquely w1 paragraph")])
    path = str(tmp_path / "pidx_empty")
    with cached_scope():
        paragraph_index_build(seed, path, index_buckets=8)
        paragraph_increment(
            w1, path, update_index=True, update_label="w1"
        ).write.format("noop").mode("overwrite").save()
        # delete doc 30: w1's only membership hash dies → mb=w1 is
        # left with empty hp= dirs only
        r1 = paragraph_index_delete(
            spark, path, mk([(30, "x")]).select("doc_id"), "d1"
        )
        assert r1["dead_hashes"] == 1
        # a LATER delete over a base-increment hash must not crash on
        # the emptied mb=w1 (and must not rewrite it)
        import os as _os

        w1_mtime = {
            d: _os.stat(_os.path.join(path, "paras", "mb=w1", d)).st_mtime_ns
            for d in _os.listdir(_os.path.join(path, "paras", "mb=w1"))
            if d.startswith("hp=")
        }
        r2 = paragraph_index_delete(
            spark, path, mk([(1, "x")]).select("doc_id"), "d2"
        )
        assert r2["dead_hashes"] == 1  # "alpha beta" lost doc 1
        w1_after = {
            d: _os.stat(_os.path.join(path, "paras", "mb=w1", d)).st_mtime_ns
            for d in _os.listdir(_os.path.join(path, "paras", "mb=w1"))
            if d.startswith("hp=")
        }
        assert w1_after == w1_mtime, "emptied increment was rewritten"
        # the index still answers correctly: both dead paragraphs
        # electable, "gamma delta" still suppressed by doc 2
        shard = mk([(50, "alpha beta\ngamma delta\nuniquely w1 paragraph")])
        post = paragraph_increment(shard, path).collect()[0]
        assert post.n_kept == 2
        assert post.text == "alpha beta\nuniquely w1 paragraph"


def test_v1_layout_probe_delete_compact(spark, tmp_path):
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    seed = mk([
        (1, "alpha beta\ngamma delta"),
        (2, "gamma delta\nepsilon zeta"),
    ])
    shard = mk([(20, "alpha beta\ngamma delta\nfresh paragraph")])
    path = str(tmp_path / "pidx_v1")
    with cached_scope():
        paragraph_index_build(seed, path, index_buckets=8)
        _forge_v1(spark, path)
        # probe over v1 suppresses both indexed paragraphs
        pre = {
            r.doc_id: (r.n_kept, r.text)
            for r in paragraph_increment(shard, path).collect()
        }
        assert pre[20] == (1, "fresh paragraph")
        # delete doc 1: tombstone-only on v1 (no membership rewrite),
        # suppression released via the read-side anti-join
        rep = paragraph_index_delete(
            spark, path, mk([(1, "x")]).select("doc_id"), "d1"
        )
        assert rep["deleted_docs"] == 1
        assert rep["dead_hashes"] == 0 and rep["touched_buckets"] == []
        post = {
            r.doc_id: (r.n_kept, r.text)
            for r in paragraph_increment(shard, path).collect()
        }
        assert post[20] == (2, "alpha beta\nfresh paragraph")
        # v1 increment updates keep the attributed-in-paras layout
        w1 = mk([(30, "brand new para\ngamma delta")])
        paragraph_increment(
            w1, path, update_index=True, update_label="w1"
        ).write.format("noop").mode("overwrite").save()
        inc_cols = spark.read.parquet(
            os.path.join(path, "paras", "mb=w1")
        ).columns
        assert "id" in inc_cols
        assert not os.path.exists(os.path.join(path, "attrib"))
        # compaction physically drops doc 1's rows and clears the
        # tombstones — doc 1's sole hash stays electable after
        out = paragraph_index_compact(spark, path)
        assert out.get("tombstones_cleared") is True
        assert "attrib_rows" not in out
        post2 = {
            r.doc_id: r.n_kept
            for r in paragraph_increment(shard, path).collect()
        }
        assert post2[20] == 2
