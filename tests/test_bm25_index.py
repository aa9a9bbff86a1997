"""Persisted incremental BM25 inverted index (operators/bm25_index.py):
build → append → search must equal the one-shot
:func:`operators.text.bm25_search` on the union corpus EXACTLY (the
module's equivalence contract), with the dedup-index layer's lifecycle
guarantees — replay idempotency, manifest atomicity, compaction +
vacuum, fail-loud geometry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.bm25_index import (
    bm25_index_append,
    bm25_index_build,
    bm25_index_compact,
    bm25_index_search,
)
from etl_prometheus2clickhouse_spark.operators.text import bm25_search


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox"),
    (3, "lazy dogs sleep all day the dog said"),
    (4, "quick thinking wins the day"),
    (5, ""),  # zero-token doc: counts in N/avgdl, no postings
    (6, "fox fox fox den"),
    (7, "a completely unrelated sentence about spark"),
    (8, "the dog and the fox were friends"),
]
SHARD = [
    (9, "new shard doc about a quick dog"),
    (10, "another shard row the fox ignores"),
    (11, "   "),  # whitespace-only: zero tokens too
]
QUERIES = [
    (100, ["quick", "fox"]),
    (101, ["dog", "day", "dog"]),  # duplicate term deduped per query
    (102, ["absent-term"]),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture()
def shard(spark):
    return spark.createDataFrame(SHARD, "doc_id long, text string")


@pytest.fixture()
def queries(spark):
    return spark.createDataFrame(
        QUERIES, "query_id long, terms array<string>"
    )


def _rows(df):
    return sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank) for r in df.collect()
    )


def test_build_search_equals_one_shot(spark, docs, queries, tmp_path):
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(docs, queries, k=5))
    assert got == want and got  # non-vacuous


def test_append_search_equals_one_shot_union(
    spark, docs, shard, queries, tmp_path
):
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    bm25_index_append(shard, path, "w2")
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(docs.unionByName(shard), queries, k=5))
    assert got == want
    # the shard actually changed results (df/N/avgdl moved): non-vacuous
    assert got != _rows(bm25_search(docs, queries, k=5))


def test_append_replay_idempotent(spark, docs, shard, queries, tmp_path):
    """An at-least-once redelivery OVERWRITES its own mb= directory —
    scores and stats identical to a single delivery."""
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    bm25_index_append(shard, path, "w2")
    once = _rows(bm25_index_search(queries, path, k=5))
    bm25_index_append(shard, path, "w2")  # replay
    assert _rows(bm25_index_search(queries, path, k=5)) == once


def test_zero_token_docs_count_in_stats(spark, docs, queries, tmp_path):
    """Docs 5 and 11 emit no postings but must move N and avgdl exactly
    like the one-shot's corpus-wide avg(dl)."""
    path = os.path.join(str(tmp_path), "idx")
    with_empty = docs
    without_empty = docs.where(F.col("doc_id") != 5)
    bm25_index_build(with_empty, path, term_buckets=8)
    got_with = _rows(bm25_index_search(queries, path, k=5))
    bm25_index_build(without_empty, path, term_buckets=8)
    got_without = _rows(bm25_index_search(queries, path, k=5))
    assert got_with != got_without  # N/avgdl really differ
    assert got_with == _rows(bm25_search(with_empty, queries, k=5))
    assert got_without == _rows(bm25_search(without_empty, queries, k=5))


def test_compact_and_vacuum(spark, docs, shard, queries, tmp_path):
    """Folding increments is physical, not semantic: same scores, live
    dirs bounded, superseded dirs reclaimed by vacuum."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        index_vacuum,
    )

    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    bm25_index_append(shard, path, "w2")
    bm25_index_append(
        spark.createDataFrame(
            [(12, "a third increment about dogs")], "doc_id long, text string"
        ),
        path,
        "w3",
    )
    before = _rows(bm25_index_search(queries, path, k=5))
    report = bm25_index_compact(spark, path)
    assert report["posting_rows"] > 0 and report["stats_rows"] == 3
    assert _rows(bm25_index_search(queries, path, k=5)) == before
    deleted = index_vacuum(spark, path)["deleted"]
    assert deleted >= 6  # 3 postings + 3 stats dirs superseded
    assert _rows(bm25_index_search(queries, path, k=5)) == before


def test_label_validation(spark, docs, shard, tmp_path):
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    with pytest.raises(ValueError, match="reserved"):
        bm25_index_append(shard, path, "base")
    with pytest.raises(ValueError, match="filesystem-safe"):
        bm25_index_append(shard, path, "a/b")
    with pytest.raises(ValueError, match="filesystem-safe"):
        bm25_index_append(shard, path, "")
    with pytest.raises(ValueError, match="term_buckets"):
        bm25_index_build(docs, path + "2", term_buckets=0)


def test_probe_reads_only_query_buckets(spark, docs, queries, tmp_path):
    """The postings read must carry the query terms' tp= prefixes as a
    partition filter — bounded probe literals, file listings pruned."""
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    out = bm25_index_search(queries, path, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "tp" in plan and ("PartitionFilters: [" in plan)
    # the filter is non-empty (probe literals present, not a full scan)
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert seg.strip(), f"empty partition filter in:\n{plan}"


def test_search_empty_query_terms(spark, docs, tmp_path):
    """A query frame with zero terms probes nothing and returns an
    empty frame (no full-index scan)."""
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    empty_q = spark.createDataFrame(
        [], "query_id long, terms array<string>"
    )
    assert bm25_index_search(empty_q, path, k=5).count() == 0


def test_corrupt_meta_fails_loud(spark, docs, queries, tmp_path):
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    # append a second meta row behind the manifest's back
    spark.createDataFrame([(99,)], "term_buckets int").write.mode(
        "append"
    ).parquet(os.path.join(path, "meta", "mb=base"))
    with pytest.raises(ValueError, match="corrupt meta"):
        bm25_index_search(queries, path, k=5)


def test_streaming_ingest_kill_and_restart(spark, docs, shard, queries,
                                           tmp_path):
    """Streaming BM25 ingestion under a checkpoint: run over the first
    shard file, stop, land a second file, restart — only unseen input
    is processed, and the search over the grown index equals the
    one-shot bm25_search over everything."""
    from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
        run_streaming_bm25_ingest,
    )

    path = os.path.join(str(tmp_path), "idx")
    src = os.path.join(str(tmp_path), "in")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    bm25_index_build(docs, path, term_buckets=8)
    w1 = shard.where(F.col("doc_id") % 2 == 0)
    w2 = shard.where(F.col("doc_id") % 2 == 1)
    w1.coalesce(1).write.parquet(f"{src}/b0")
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(shard.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    run_streaming_bm25_ingest(stream(), path, ckpt)
    mid = _rows(bm25_index_search(queries, path, k=5))
    assert mid == _rows(bm25_search(docs.unionByName(w1), queries, k=5))
    # restart with the same checkpoint: only w2 is processed
    w2.coalesce(1).write.parquet(f"{src}/b1")
    run_streaming_bm25_ingest(stream(), path, ckpt)
    got = _rows(bm25_index_search(queries, path, k=5))
    assert got == _rows(
        bm25_search(docs.unionByName(shard), queries, k=5)
    )


def test_streaming_ingest_scheduled_maintenance(spark, docs, queries,
                                                tmp_path):
    """max_live_dirs bounds the live postings/stats increment count via
    in-lifecycle compaction + vacuum, without changing search results
    (the in-flight batch is excluded from the fold — the replay
    guard)."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        index_live_increments,
    )
    from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
        run_streaming_bm25_ingest,
    )

    path = os.path.join(str(tmp_path), "idx")
    src = os.path.join(str(tmp_path), "in")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    bm25_index_build(docs, path, term_buckets=8)
    extra = [(100 + i, f"maintenance shard doc {i} fox") for i in range(8)]
    for i, row in enumerate(extra):
        spark.createDataFrame([row], "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{src}/b{i}")
    run_streaming_bm25_ingest(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*"),
        path,
        ckpt,
        max_live_dirs=3,
    )
    live = index_live_increments(spark, path)
    assert max(live["postings"], live["stats"]) <= 4  # fold + in-flight
    want = _rows(
        bm25_search(
            docs.unionByName(
                spark.createDataFrame(extra, "doc_id long, text string")
            ),
            queries,
            k=5,
        )
    )
    assert _rows(bm25_index_search(queries, path, k=5)) == want


def test_search_snapshot_isolated_from_concurrent_append(
    spark, docs, shard, queries, tmp_path
):
    """A search resolves the manifest ONCE: an append landing after the
    search frame is built (but before it materializes) must not mix the
    new increment's postings with the old stats — the frame keeps
    answering from its snapshot, and only a NEW search sees the
    append."""
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    pre = _rows(bm25_index_search(queries, path, k=5))
    lazy = bm25_index_search(queries, path, k=5)  # snapshot pinned here
    bm25_index_append(shard, path, "w2")
    assert _rows(lazy) == pre
    post = _rows(bm25_index_search(queries, path, k=5))
    assert post != pre
    assert post == _rows(bm25_search(docs.unionByName(shard), queries, k=5))
