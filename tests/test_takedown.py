"""Corpus-level takedown orchestrator (operators/takedown.py): one
call sequences tombstone commits across every persisted index under a
resumable, auditable record — a crash mid-sequence never leaves the
document half-deleted with nothing recording which indexes committed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.bm25_index import (
    bm25_index_build,
    bm25_index_search,
)
from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    minhash_index_build,
)
from etl_prometheus2clickhouse_spark.operators.semantic_index import (
    semantic_index_build,
)
from etl_prometheus2clickhouse_spark.operators.takedown import (
    takedown,
    takedown_status,
)
from etl_prometheus2clickhouse_spark.operators.text import bm25_search

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox runs past the barn"),
    (3, "lazy dogs sleep all day the dog said"),
    (4, "quick thinking wins the day every day"),
    (5, "a completely unrelated sentence about spark"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _vecs(spark):
    import math

    rows = [
        (i, [math.cos(math.radians(d)), math.sin(math.radians(d))])
        for i, d in [(1, 0.0), (2, 30.0), (3, 60.0), (4, 90.0), (5, 120.0)]
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _build_two(spark, tmp_path):
    bm25 = str(tmp_path / "bm25")
    sem = str(tmp_path / "sem")
    bm25_index_build(_docs(spark), bm25, term_buckets=8)
    semantic_index_build(
        _vecs(spark), sem, n_cells=2, threshold=0.95, centroids="first"
    )
    return bm25, sem


def test_takedown_spans_all_kinds_and_compacts(spark, tmp_path):
    """Happy path across all four kinds + compact + vacuum: every
    index reports its delete, every status reaches 'compacted', and
    the bm25 search equals the one-shot on the reduced corpus (the
    per-index oracle contract composed through the orchestrator)."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_build,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_index_build,
        substring_index_build,
    )

    docs = _docs(spark)
    bm25, sem = _build_two(spark, tmp_path)
    mh = str(tmp_path / "mh")
    ann = str(tmp_path / "ann")
    sub = str(tmp_path / "sub")
    par = str(tmp_path / "par")
    with cached_scope():
        minhash_index_build(docs, mh, threshold=0.5)
        substring_index_build(docs, sub, min_len=5)
        paragraph_index_build(docs, par)
        import math

        rows = [
            (i, [float(i == j % 8) for j in range(64)]) for i in range(1, 6)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        ann_index_build(
            emb, ann, dim=64, n_cells=2, m=4, k_codes=4, quantizers="first"
        )
        dele = spark.createDataFrame([(1,)], "id long")
        out = takedown(
            spark,
            dele,
            [("bm25", bm25), ("semantic", sem), ("minhash", mh),
             ("ann", ann), ("substring", sub), ("paragraph", par)],
            str(tmp_path),
            "gdpr-1",
            compact=True,
            vacuum=True,
        )
        assert out["complete"] and not out["resumed"]
        assert set(out["indexes"]) == {
            "0:bm25", "1:semantic", "2:minhash", "3:ann", "4:substring",
            "5:paragraph",
        }
        assert all(
            v["status"] == "compacted" for v in out["indexes"].values()
        )
        assert out["indexes"]["0:bm25"]["report"]["deleted_docs"] == 1
        assert out["indexes"]["3:ann"]["report"]["deleted_vectors"] == 1
        assert out["indexes"]["4:substring"]["report"]["deleted_docs"] == 1
        assert out["indexes"]["5:paragraph"]["report"]["deleted_docs"] == 1
        # the composed effect is the per-index reduced-corpus contract
        queries = spark.createDataFrame(
            [(100, ["quick", "fox"])], "query_id long, terms array<string>"
        )
        got = sorted(
            (r.query_id, r.doc_id, r.bm25, r.rank)
            for r in bm25_index_search(queries, bm25, k=5).collect()
        )
        want = sorted(
            (r.query_id, r.doc_id, r.bm25, r.rank)
            for r in bm25_search(
                docs.where(F.col("doc_id") != 1), queries, k=5
            ).collect()
        )
        assert got == want
    # audit record survives and shows the terminal state
    st = takedown_status(spark, str(tmp_path), "gdpr-1")
    assert st is not None and all(
        v["status"] == "compacted" for v in st["indexes"].values()
    )


def test_crash_mid_sequence_resumes_without_replaying_done(
    spark, tmp_path, monkeypatch
):
    """Kill the sequence after the first index commits: the record
    says exactly which index committed; a resume with the same label
    skips it (no second delete call) and completes the rest from the
    STAGED ids even when the caller passes no frame at all."""
    import etl_prometheus2clickhouse_spark.operators.bm25_index as bm
    import etl_prometheus2clickhouse_spark.operators.semantic_index as sm

    bm25, sem = _build_two(spark, tmp_path)
    calls = {"bm25": 0, "sem": 0}
    real_bm, real_sm = bm.bm25_index_delete, sm.semantic_index_delete

    def counting_bm(*a, **k):
        calls["bm25"] += 1
        return real_bm(*a, **k)

    def crashing_sm(*a, **k):
        calls["sem"] += 1
        raise RuntimeError("simulated crash before the semantic commit")

    monkeypatch.setattr(bm, "bm25_index_delete", counting_bm)
    monkeypatch.setattr(sm, "semantic_index_delete", crashing_sm)
    dele = spark.createDataFrame([(2,)], "id long")
    idx = [("bm25", bm25), ("semantic", sem)]
    with pytest.raises(RuntimeError, match="simulated crash"):
        takedown(spark, dele, idx, str(tmp_path), "gdpr-2")
    st = takedown_status(spark, str(tmp_path), "gdpr-2")
    assert st["indexes"]["0:bm25"]["status"] == "deleted"
    assert st["indexes"]["1:semantic"]["status"] == "pending"

    # resume: semantic heals, bm25 is NOT re-deleted
    def healed_sm(*a, **k):
        calls["sem"] += 1
        return real_sm(*a, **k)

    monkeypatch.setattr(sm, "semantic_index_delete", healed_sm)
    out = takedown(spark, None, idx, str(tmp_path), "gdpr-2")
    assert out["resumed"] and out["complete"]
    assert calls == {"bm25": 1, "sem": 2}
    assert out["indexes"]["1:semantic"]["report"]["deleted_vectors"] == 1
    # a further call is a no-op pass over a complete record
    out2 = takedown(spark, None, idx, str(tmp_path), "gdpr-2")
    assert out2["complete"] and calls["bm25"] == 1


def test_record_is_defined_by_first_call(spark, tmp_path):
    """A resume naming a different index set fails loud — the staged
    record is the authority; and a first call without ids fails."""
    bm25, sem = _build_two(spark, tmp_path)
    dele = spark.createDataFrame([(3,)], "id long")
    takedown(spark, dele, [("bm25", bm25)], str(tmp_path), "gdpr-3")
    with pytest.raises(ValueError, match="different index set"):
        takedown(
            spark, None, [("bm25", bm25), ("semantic", sem)],
            str(tmp_path), "gdpr-3",
        )
    with pytest.raises(ValueError, match="must name the ids"):
        takedown(spark, None, [("bm25", bm25)], str(tmp_path), "gdpr-9")
    for bad in ("a/b", "..", ".", "", ".hidden", "a b", "-x"):
        with pytest.raises(ValueError, match="label must match"):
            takedown(spark, dele, [("bm25", bm25)], str(tmp_path), bad)
    # a label shaped like a streaming batch would trip the compact
    # phase's own in-flight guard on the takedown's tombstones
    with pytest.raises(ValueError, match="streaming batch pattern"):
        takedown(spark, dele, [("bm25", bm25)], str(tmp_path), "b7")
    with pytest.raises(ValueError, match="unknown index kind"):
        takedown(spark, dele, [("lucene", bm25)], str(tmp_path), "gdpr-4")
    with pytest.raises(ValueError, match="requires compact=True"):
        takedown(
            spark, dele, [("bm25", bm25)], str(tmp_path), "gdpr-10",
            vacuum=True,
        )


def test_resume_with_divergent_ids_fails_loud(spark, tmp_path):
    """A resume that passes a DIFFERENT ids frame must not silently
    report complete without deleting the new ids — the staged set is
    the record's identity, same as the index plan."""
    bm25, _ = _build_two(spark, tmp_path)
    idx = [("bm25", bm25)]
    dele = spark.createDataFrame([(3,)], "id long")
    takedown(spark, dele, idx, str(tmp_path), "gdpr-6")
    with pytest.raises(ValueError, match="diverge from the staged"):
        takedown(
            spark, spark.createDataFrame([(4,)], "id long"),
            idx, str(tmp_path), "gdpr-6",
        )
    # resuming with the SAME set (even a re-built frame) is fine
    out = takedown(
        spark, spark.createDataFrame([(3,)], "id long"),
        idx, str(tmp_path), "gdpr-6",
    )
    assert out["resumed"] and out["complete"]


def test_compact_report_exposed_in_audit_views(spark, tmp_path):
    """The compaction phase's report (what it physically reclaimed) is
    visible in both the takedown() return and takedown_status()."""
    bm25, _ = _build_two(spark, tmp_path)
    dele = spark.createDataFrame([(2,)], "id long")
    out = takedown(
        spark, dele, [("bm25", bm25)], str(tmp_path), "gdpr-7",
        compact=True,
    )
    assert out["indexes"]["0:bm25"]["compact_report"] is not None
    st = takedown_status(spark, str(tmp_path), "gdpr-7")
    assert st["indexes"]["0:bm25"]["compact_report"] is not None
    # delete-only records omit the key rather than carrying null
    takedown(
        spark, spark.createDataFrame([(3,)], "id long"),
        [("bm25", bm25)], str(tmp_path), "gdpr-8",
    )
    st8 = takedown_status(spark, str(tmp_path), "gdpr-8")
    assert "compact_report" not in st8["indexes"]["0:bm25"]


def test_crash_mid_compact_phase_resumes(spark, tmp_path, monkeypatch):
    """A crash AFTER all deletes landed but during the compaction
    phase: the record says which indexes compacted; the resume
    compacts only the remainder — deletes are never re-run."""
    import etl_prometheus2clickhouse_spark.operators.bm25_index as bm
    import etl_prometheus2clickhouse_spark.operators.semantic_index as sm

    bm25, sem = _build_two(spark, tmp_path)
    calls = {"del": 0, "cmp_bm": 0, "cmp_sm": 0}
    real_del = bm.bm25_index_delete
    real_cbm, real_csm = bm.bm25_index_compact, sm.semantic_index_compact

    monkeypatch.setattr(
        bm, "bm25_index_delete",
        lambda *a, **k: (calls.__setitem__("del", calls["del"] + 1),
                         real_del(*a, **k))[1],
    )
    monkeypatch.setattr(
        bm, "bm25_index_compact",
        lambda *a, **k: (calls.__setitem__("cmp_bm", calls["cmp_bm"] + 1),
                         real_cbm(*a, **k))[1],
    )

    def crashing_csm(*a, **k):
        calls["cmp_sm"] += 1
        raise RuntimeError("simulated crash mid-compaction")

    monkeypatch.setattr(sm, "semantic_index_compact", crashing_csm)
    dele = spark.createDataFrame([(2,)], "id long")
    idx = [("bm25", bm25), ("semantic", sem)]
    with pytest.raises(RuntimeError, match="mid-compaction"):
        takedown(spark, dele, idx, str(tmp_path), "gdpr-5", compact=True)
    st = takedown_status(spark, str(tmp_path), "gdpr-5")
    assert st["indexes"]["0:bm25"]["status"] == "compacted"
    assert st["indexes"]["1:semantic"]["status"] == "deleted"

    monkeypatch.setattr(
        sm, "semantic_index_compact",
        lambda *a, **k: (calls.__setitem__("cmp_sm", calls["cmp_sm"] + 1),
                         real_csm(*a, **k))[1],
    )
    out = takedown(spark, None, idx, str(tmp_path), "gdpr-5", compact=True)
    assert out["resumed"] and out["complete"]
    # deletes ran once per index; the bm25 compact was NOT re-run
    assert calls == {"del": 1, "cmp_bm": 1, "cmp_sm": 2}
    assert all(
        v["status"] == "compacted" for v in out["indexes"].values()
    )


def test_compact_refuses_in_flight_streaming_batch(spark, tmp_path):
    """The curation_stream replay guard, honored by takedown: an index
    whose live increments carry a streaming batch label (b<digits>)
    must not be compacted by the takedown's compact phase — folding an
    uncommitted batch double-counts its rows on replay. The index
    stays at 'deleted' and the takedown resumes cleanly once the
    stream has committed and compacted."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_append,
        bm25_index_compact,
    )

    bm25, _ = _build_two(spark, tmp_path)
    with cached_scope():
        # fabricate an in-flight micro-batch increment
        extra = spark.createDataFrame(
            [(9, "streaming batch doc about foxes")],
            "doc_id long, text string",
        )
        bm25_index_append(extra, bm25, "b7")
        dele = spark.createDataFrame([(2,)], "id long")
        idx = [("bm25", bm25)]
        with pytest.raises(RuntimeError, match="refusing to compact"):
            takedown(
                spark, dele, idx, str(tmp_path), "gdpr-live",
                compact=True,
            )
        st = takedown_status(spark, str(tmp_path), "gdpr-live")
        assert st["indexes"]["0:bm25"]["status"] == "deleted"
        # caller-supplied exclusion set refuses the same way
        bm25_index_compact(spark, bm25)  # the stream commits + folds b7
        with pytest.raises(RuntimeError, match="refusing to compact"):
            takedown(
                spark, None, idx, str(tmp_path), "gdpr-live",
                compact=True,
                exclude_labels={"base"},
            )
        # stream committed: the resume completes the compaction
        out = takedown(
            spark, None, idx, str(tmp_path), "gdpr-live", compact=True
        )
        assert out["resumed"] and out["complete"]
        assert out["indexes"]["0:bm25"]["status"] == "compacted"


def test_takedown_verify_reports_residuals(spark, tmp_path, monkeypatch):
    """The auditor's closing step: takedown_verify counts staged ids
    still visible to each index's reads — non-zero exactly on the
    index a crash left pending; clean after the resume and still
    clean after compaction."""
    import etl_prometheus2clickhouse_spark.operators.semantic_index as sm
    from etl_prometheus2clickhouse_spark.operators.takedown import (
        takedown_verify,
    )

    bm25, sem = _build_two(spark, tmp_path)
    real_sm = sm.semantic_index_delete
    monkeypatch.setattr(
        sm, "semantic_index_delete",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("simulated crash")
        ),
    )
    dele = spark.createDataFrame([(2,)], "id long")
    idx = [("bm25", bm25), ("semantic", sem)]
    with pytest.raises(RuntimeError, match="simulated crash"):
        takedown(spark, dele, idx, str(tmp_path), "v-1")
    rep = takedown_verify(spark, str(tmp_path), "v-1")
    assert not rep["clean"]
    assert rep["indexes"]["0:bm25"]["residual_ids"] == 0  # tombstoned
    assert rep["indexes"]["1:semantic"]["residual_ids"] == 1  # pending
    monkeypatch.setattr(sm, "semantic_index_delete", real_sm)
    takedown(spark, None, idx, str(tmp_path), "v-1")
    rep2 = takedown_verify(spark, str(tmp_path), "v-1")
    assert rep2["clean"] and all(
        v["residual_ids"] == 0 for v in rep2["indexes"].values()
    )
    # physically reclaimed state stays clean
    takedown(spark, None, idx, str(tmp_path), "v-1", compact=True)
    assert takedown_verify(spark, str(tmp_path), "v-1")["clean"]
    with pytest.raises(ValueError, match="no takedown record"):
        takedown_verify(spark, str(tmp_path), "no-such-label")


def test_takedown_list_sweeps_all_records(spark, tmp_path):
    from etl_prometheus2clickhouse_spark.operators.takedown import (
        takedown_list,
    )

    assert takedown_list(spark, str(tmp_path)) == []
    bm25, sem = _build_two(spark, tmp_path)
    takedown(
        spark, spark.createDataFrame([(3,)], "id long"),
        [("bm25", bm25)], str(tmp_path), "case-a",
    )
    takedown(
        spark, spark.createDataFrame([(4,)], "id long"),
        [("semantic", sem)], str(tmp_path), "case-b",
    )
    recs = takedown_list(spark, str(tmp_path))
    assert [r["label"] for r in recs] == ["case-a", "case-b"]
    assert all(
        v["status"] == "deleted"
        for r in recs for v in r["indexes"].values()
    )
