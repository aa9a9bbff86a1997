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
    # stats fold NETS the additive rows to one (delete rows included)
    assert report["posting_rows"] > 0 and report["stats_rows"] == 1
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


# ---------------------------------------------------------------------------
# identity layer: overlap detection + deletion tombstones + rebucket
# ---------------------------------------------------------------------------

def test_append_overlapping_ids_fails_loud(spark, docs, shard, tmp_path):
    """Re-ingesting a shard whose ids are already live (the partial-
    upstream-failure accident) must raise BEFORE anything is written —
    the documented silent df/N double-count turned into a loud error."""
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    bm25_index_append(shard, path, "w2")
    overlap = spark.createDataFrame(
        [(10, "another shard row the fox ignores"), (12, "fresh doc")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="overlaps ids already live"):
        bm25_index_append(overlap, path, "w3")
    # the failed append registered nothing: search still equals the
    # one-shot over base ∪ first shard
    queries = spark.createDataFrame(
        QUERIES, "query_id long, terms array<string>"
    )
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(docs.unionByName(
        spark.createDataFrame(SHARD, "doc_id long, text string")
    ), queries, k=5))
    assert got == want


def test_append_replay_same_label_passes_guard(
    spark, docs, shard, queries, tmp_path
):
    """An at-least-once replay re-delivers the SAME shard with the SAME
    label: the guard must exclude the increment's own rows, and the
    overwrite keeps the result identical to a single delivery."""
    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    bm25_index_append(shard, path, "w2")
    bm25_index_append(shard, path, "w2")  # replay — must not raise
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(docs.unionByName(shard), queries, k=5))
    assert got == want


def test_delete_search_equals_one_shot_on_reduced_corpus(
    spark, docs, shard, queries, tmp_path
):
    """The takedown contract: after bm25_index_delete, search returns
    EXACTLY the one-shot BM25 over the corpus minus the deleted docs —
    tf, df, N, and avgdl all shrink (docs 1 and 5 cover a postings-
    heavy doc and a zero-token doc, whose deletion moves only N)."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_delete,
    )

    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    bm25_index_append(shard, path, "w2")
    dele = spark.createDataFrame([(1,), (5,), (999,)], "doc_id long")
    rep = bm25_index_delete(spark, path, dele, "takedown1")
    assert rep["deleted_docs"] == 2  # 999 was never in the index
    reduced = docs.unionByName(shard).where(~F.col("doc_id").isin(1, 5))
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(reduced, queries, k=5))
    assert got == want and got
    # deleted ids never surface
    assert all(r[1] != 1 for r in got)


def test_delete_replay_and_double_delete_idempotent(
    spark, docs, queries, tmp_path
):
    """Replaying a delete with the same label recomputes the identical
    negative stats row (overwrite, not compound); deleting an already-
    tombstoned id under a NEW label subtracts nothing."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_delete,
    )

    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    dele = spark.createDataFrame([(1,)], "doc_id long")
    rep1 = bm25_index_delete(spark, path, dele, "d1")
    rep1b = bm25_index_delete(spark, path, dele, "d1")  # replay
    assert rep1 == rep1b
    rep2 = bm25_index_delete(spark, path, dele, "d2")  # double delete
    assert rep2 == {"deleted_docs": 0, "deleted_tokens": 0}
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(docs.where(F.col("doc_id") != 1), queries, k=5))
    assert got == want


def test_compact_drops_tombstones_then_reingest(
    spark, docs, queries, tmp_path
):
    """delete → compact → re-ingest lifecycle: compaction physically
    drops the tombstoned rows (postings AND identity rows), nets the
    stats to one row, clears the tombstone table — and the freed id can
    be appended again."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_delete,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
    )

    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    dele = spark.createDataFrame([(1,)], "doc_id long")
    bm25_index_delete(spark, path, dele, "d1")
    # re-ingesting the tombstoned id BEFORE compaction is refused
    redoc = spark.createDataFrame(
        [(1, "the resurrected document")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="overlaps ids already live"):
        bm25_index_append(redoc, path, "w2")
    out = bm25_index_compact(spark, path)
    assert out.get("tombstones_cleared") is True
    index_vacuum(spark, path)
    m = _read_manifest(spark, path)
    assert m["tables"]["tombstones"] == []
    # search unchanged by the physical rewrite
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(docs.where(F.col("doc_id") != 1), queries, k=5))
    assert got == want
    # the physically-removed id is free again
    bm25_index_append(redoc, path, "w2")
    got2 = _rows(bm25_index_search(queries, path, k=5))
    want2 = _rows(bm25_search(
        docs.where(F.col("doc_id") != 1).unionByName(redoc), queries, k=5
    ))
    assert got2 == want2


def test_rebucket_search_identical_and_prunes_new_geometry(
    spark, docs, shard, queries, tmp_path
):
    """Geometry migration: search results are IDENTICAL across the
    swap, the meta row carries the new bucket count, and the postings
    layout actually moved (new tp= dirs exist under the new live
    increment)."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_rebucket,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
    )

    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=2)
    bm25_index_append(shard, path, "w2")
    before = _rows(bm25_index_search(queries, path, k=5))
    rep = bm25_index_rebucket(spark, path, 16)
    assert rep["term_buckets_old"] == 2 and rep["term_buckets_new"] == 16
    after = _rows(bm25_index_search(queries, path, k=5))
    assert before == after and after
    m = _read_manifest(spark, path)
    assert len(m["tables"]["postings"]) == 1
    assert m["tables"]["postings"] == m["tables"]["meta"]
    assert m["tables"]["postings"][0].startswith("mb=rebucket-")
    index_vacuum(spark, path)
    # appends keep working under the new geometry
    extra = spark.createDataFrame(
        [(20, "a brand new quick fox document")], "doc_id long, text string"
    )
    bm25_index_append(extra, path, "w3")
    got = _rows(bm25_index_search(queries, path, k=5))
    want = _rows(bm25_search(
        docs.unionByName(shard).unionByName(extra), queries, k=5
    ))
    assert got == want


def test_delete_requires_identity_layer(spark, docs, tmp_path):
    """An index whose manifest has no idmeta table (pre-identity-layer
    build) refuses deletes loudly instead of corrupting stats."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_delete,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _commit_manifest, _manifest_tables, _read_manifest,
    )

    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    # simulate a legacy index: drop ids/idmeta from the manifest
    t = _manifest_tables(
        spark, path, ["postings", "stats", "meta", "ids", "idmeta"]
    )
    t.pop("ids", None)
    t.pop("idmeta", None)
    _commit_manifest(spark, path, t)
    dele = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="predates the identity layer"):
        bm25_index_delete(spark, path, dele, "d1")
    # and appends against it skip the guard (legacy semantics) —
    # must not raise
    bm25_index_append(
        spark.createDataFrame([(30, "legacy ok")], "doc_id long, text string"),
        path, "w9",
    )


def test_delete_amid_streaming_ingest(spark, docs, shard, queries, tmp_path):
    """The takedown arrives BETWEEN streaming ingest waves, with
    scheduled maintenance running: tombstones survive the in-flight-
    batch-excluded compaction (excluded increments are not rewritten,
    so the tombstone table must stay live), later batches' overlap
    guards keep passing, and the final search equals the one-shot over
    (base ∪ shard) minus the deleted docs. A later FULL compaction
    clears the tombstones and physically drops the rows."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_delete,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
    )
    from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
        run_streaming_bm25_ingest,
    )

    path = os.path.join(str(tmp_path), "idx")
    src = os.path.join(str(tmp_path), "in")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    bm25_index_build(docs, path, term_buckets=8)
    w1 = shard.where(F.col("doc_id") % 2 == 1)
    w2 = shard.where(F.col("doc_id") % 2 == 0)
    w1.coalesce(1).write.parquet(f"{src}/b0")
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(shard.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    run_streaming_bm25_ingest(stream(), path, ckpt, max_live_dirs=2)
    # the takedown lands between waves: one base doc and one streamed
    dele = spark.createDataFrame([(1,), (9,)], "doc_id long")
    rep = bm25_index_delete(spark, path, dele, "takedown")
    assert rep["deleted_docs"] == 2
    w2.coalesce(1).write.parquet(f"{src}/b1")
    run_streaming_bm25_ingest(stream(), path, ckpt, max_live_dirs=2)
    # maintenance ran with an in-flight exclusion → tombstones LIVE
    m = _read_manifest(spark, path)
    assert m["tables"].get("tombstones"), m["tables"]
    reduced = docs.unionByName(shard).where(~F.col("doc_id").isin(1, 9))
    got = _rows(bm25_index_search(queries, path, k=5))
    assert got == _rows(bm25_search(reduced, queries, k=5)) and got
    # a full (no-exclusion) compaction clears them; results unchanged
    out = bm25_index_compact(spark, path)
    assert out.get("tombstones_cleared") is True
    assert _rows(bm25_index_search(queries, path, k=5)) == got


def test_excluded_compact_keeps_tombstoned_rows_physical(
    spark, docs, shard, queries, tmp_path
):
    """A maintenance fold that keeps tombstones (exclude_labels set)
    must NOT physically drop tombstoned rows: if it did, the id would
    vanish from the identity table while its tombstone stayed live, so
    a re-ingest would pass the overlap guard yet be anti-joined out of
    every search — and silently lost at the next full compaction.
    Contract: physical drop happens ONLY in the pass that also clears
    the tombstone table."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_delete,
    )

    path = os.path.join(str(tmp_path), "idx")
    bm25_index_build(docs, path, term_buckets=8)
    bm25_index_append(shard, path, "w2")
    dele = spark.createDataFrame([(1,)], "doc_id long")
    bm25_index_delete(spark, path, dele, "d1")
    # streaming maintenance fold: w2 is in-flight, tombstones kept
    out = bm25_index_compact(spark, path, exclude_labels={"w2"})
    assert out.get("tombstones_cleared") is None
    # the tombstoned id must still occupy the identity table: a
    # re-ingest is REFUSED (the bug made this pass, then eat the doc)
    redoc = spark.createDataFrame(
        [(1, "the resurrected document")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="overlaps ids already live"):
        bm25_index_append(redoc, path, "w3")
    # search still equals the reduced corpus (tombstone anti-join)
    reduced = docs.unionByName(shard).where(F.col("doc_id") != 1)
    got = _rows(bm25_index_search(queries, path, k=5))
    assert got == _rows(bm25_search(reduced, queries, k=5))
    # the eventual FULL compaction drops rows + clears tombstones in
    # one pass, after which the id is genuinely free
    out2 = bm25_index_compact(spark, path)
    assert out2.get("tombstones_cleared") is True
    bm25_index_append(redoc, path, "w3")
    want = _rows(bm25_search(reduced.unionByName(redoc), queries, k=5))
    assert _rows(bm25_index_search(queries, path, k=5)) == want
