"""Corpus-level takedown orchestrator: one call that honors a
right-to-be-forgotten request across EVERY persisted index.

Deletion exists per index (``bm25_index_delete``, ``ann_index_delete``,
``semantic_index_delete``, ``minhash_index_delete``,
``substring_index_delete``, ``paragraph_index_delete`` — each
tombstone-committed, replay-idempotent under its label, oracled
against the one-shot on the reduced corpus) and per materialized
output (``shards_delete`` / ``dispositions_delete`` in
:mod:`.shards` — physical at delete time, replay-idempotent). What a real deployment needs on top is
the SEQUENCE: a takedown touches four analytics indexes plus the serve
indexes, and a crash mid-sequence must not leave the document live in
some indexes and gone from others with nothing recording which.

This module adds exactly that coordination layer:

- the requested ids are STAGED once (parquet under the takedown
  record's own directory) so every resume deletes the same set the
  original request named, not whatever frame the caller happens to
  hold;
- a versioned state file (same atomic create-then-rename commit as the
  index manifests, first-writer-wins) records per-index progress —
  ``pending`` → ``deleted`` [→ ``compacted``];
- each per-index step reuses the index's OWN delete under the
  takedown's label, so a crash between a delete and its state commit
  is healed by the per-index replay contract (same label ⇒ overwrite,
  idempotent — pinned by each index's pytest);
- optional compaction (+ vacuum) per index physically reclaims the
  rows after all deletes land, under the same resumable bookkeeping.

The state file is also the AUDIT record: which indexes have committed
the takedown and when (by state version), queryable long after.

100 TB shape: the orchestrator adds no data-plane work of its own —
every read and write inside it is the per-index delete/compact, each
already partition-pruned to the delete set's own buckets and
byte-witnessed in ``scripts/scale_smoke.py``. The staged id set is
delete-request-sized, never corpus-sized.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _hadoop_fs,
    index_vacuum,
)

_STATE_DIR = "_takedown"


def _kind_fns(kind: str):
    """(delete_fn, compact_fn) for one index kind — imported lazily to
    keep module import acyclic; the registry IS the supported surface."""
    if kind == "bm25":
        from etl_prometheus2clickhouse_spark.operators.bm25_index import (
            bm25_index_compact,
            bm25_index_delete,
        )

        return bm25_index_delete, bm25_index_compact
    if kind == "ann":
        from etl_prometheus2clickhouse_spark.operators.ann_index import (
            ann_index_compact,
            ann_index_delete,
        )

        return ann_index_delete, ann_index_compact
    if kind == "semantic":
        from etl_prometheus2clickhouse_spark.operators.semantic_index import (
            semantic_index_compact,
            semantic_index_delete,
        )

        return semantic_index_delete, semantic_index_compact
    if kind == "minhash":
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            minhash_index_compact,
            minhash_index_delete,
        )

        return minhash_index_delete, minhash_index_compact
    if kind == "substring":
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            substring_index_compact,
            substring_index_delete,
        )

        return substring_index_delete, substring_index_compact
    if kind == "paragraph":
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            paragraph_index_compact,
            paragraph_index_delete,
        )

        return paragraph_index_delete, paragraph_index_compact
    if kind == "shards":
        from etl_prometheus2clickhouse_spark.operators.shards import (
            shards_compact,
            shards_delete,
        )

        return shards_delete, shards_compact
    if kind == "dispositions":
        from etl_prometheus2clickhouse_spark.operators.shards import (
            dispositions_compact,
            dispositions_delete,
        )

        return dispositions_delete, dispositions_compact
    raise ValueError(
        f"takedown: unknown index kind {kind!r} — supported: "
        "bm25, ann, semantic, minhash, substring, paragraph, "
        "shards, dispositions"
    )


def _state_root(takedown_path: str, label: str) -> str:
    return os.path.join(takedown_path, _STATE_DIR, label)


def _read_state(spark: SparkSession, root: str) -> "dict | None":
    """Latest committed state version (max v*.json), or None."""
    jvm, fs, hdir = _hadoop_fs(spark, root)
    if not fs.exists(hdir):
        return None
    best_v, best_path = -1, None
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                v = int(name[1:-5])
            except ValueError:
                continue
            if v > best_v:
                best_v, best_path = v, st.getPath()
    if best_path is None:
        return None
    stream = fs.open(best_path)
    try:
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    out = json.loads(data.decode("utf-8"))
    out["version"] = best_v
    return out


def _commit_state(spark: SparkSession, root: str, state: dict) -> int:
    """Atomic create-then-rename commit of the next state version —
    the index-manifest discipline (first writer wins; rename to an
    existing name fails)."""
    jvm, fs, hdir = _hadoop_fs(spark, root)
    fs.mkdirs(hdir)
    cur = _read_state(spark, root)
    next_v = (cur["version"] + 1) if cur else 1
    payload = json.dumps(
        {k: v for k, v in state.items() if k != "version"}, sort_keys=True
    ).encode("utf-8")
    tmp = jvm.org.apache.hadoop.fs.Path(
        os.path.join(root, f".tmp-{uuid.uuid4().hex}")
    )
    out = fs.create(tmp, True)
    try:
        out.write(payload)
    finally:
        out.close()
    dst = jvm.org.apache.hadoop.fs.Path(
        os.path.join(root, f"v{next_v:08d}.json")
    )
    if not fs.rename(tmp, dst):
        fs.delete(tmp, False)
        raise IOError(
            f"takedown state commit lost the race for version {next_v} "
            f"at {root!r} — single-writer contract violated"
        )
    return next_v


def _live_labels(spark: SparkSession, index_path: str) -> "set[str]":
    """Every live ``mb=`` increment label across the index's tables —
    what the compact guard inspects for in-flight batches."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _list_index_tables,
        _manifest_tables,
    )

    tables = _manifest_tables(
        spark, index_path, _list_index_tables(spark, index_path)
    )
    return {
        d[3:]
        for dirs in tables.values()
        for d in dirs
        if d.startswith("mb=")
    }


def takedown(
    spark: SparkSession,
    ids: "DataFrame | None",
    indexes: "list[tuple[str, str]]",
    takedown_path: str,
    label: str,
    id_col: str = "id",
    compact: bool = False,
    vacuum: bool = False,
    exclude_labels: "set[str] | None" = None,
) -> dict:
    """Tombstone ``ids`` out of every index in ``indexes`` — a list of
    ``(kind, path)`` pairs, kinds ``bm25 | ann | semantic | minhash |
    substring | paragraph`` (the serve indexes are the same kinds at
    their own paths) plus the MATERIALIZED outputs ``shards`` (a
    :func:`.sampling.write_training_shards` table — the published
    training data itself) and ``dispositions`` (the streaming funnel's
    audit table), whose deletes are physical at delete time
    (:mod:`.shards`) — under ONE resumable record at
    ``takedown_path/_takedown/<label>``.

    First call: stages the id set (parquet, OVERWRITE — re-staging on
    a pre-first-commit crash is idempotent), commits the ``pending``
    state, then walks the indexes in order, re-committing state after
    each index's tombstone lands. A crash anywhere leaves a record
    saying exactly which indexes have committed; calling again with
    the SAME label resumes from it — completed indexes are skipped,
    the in-flight one re-runs its per-index delete under the same
    label (replay-idempotent by that index's own contract), and the
    staged ids (not the caller's frame, which may have drifted) define
    the set. The passed ``indexes`` must match the staged record —
    a takedown is defined by its first call; divergence fails loud.

    ``compact=True`` runs each index's compaction (physically dropping
    the tombstoned rows and clearing its tombstone table) after ALL
    deletes have landed, under the same resumable bookkeeping;
    ``vacuum=True`` additionally reclaims superseded directories (run
    it outside any reader grace window — the per-index retention
    contract).

    WRITER CONTRACT for the compact phase: every streaming-lifecycle
    compaction excludes the in-flight micro-batch's increments
    (folding an uncommitted batch double-counts its rows on replay —
    ``curation_stream``'s guard), so takedown REFUSES to compact an
    index whose live increments carry a streaming batch label
    (``b<digits>``) or any label in ``exclude_labels`` — the index
    stays at ``deleted`` (tombstones anti-joined on every read,
    semantics already correct) and the call fails loud. Resume
    ``takedown(compact=True)`` once the stream has committed and
    compacted its batch, or run the takedown against a stopped
    stream. Already-compacted indexes are never re-run by the resume.

    Returns ``{label, resumed, indexes: {name: {status, report}},
    complete}`` where ``name`` is ``"<pos>:<kind>"``.
    """
    # allowlist, not blocklist: '..' or '.' would resolve the state
    # root to _takedown's parent and scribble state into takedown_path
    # itself — mirror the per-index label checks
    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", label or ""):
        raise ValueError(
            "takedown: label must match [A-Za-z0-9][A-Za-z0-9._-]* "
            f"(and not be '.'/'..'), got {label!r}"
        )
    if re.fullmatch(r"b\d+", label):
        raise ValueError(
            f"takedown: label {label!r} matches the streaming batch "
            "pattern b<digits> — the compact phase's in-flight guard "
            "would refuse the takedown's OWN tombstone increments and "
            "it could never reach 'compacted'; pick another label"
        )
    if not indexes:
        raise ValueError("takedown: needs at least one (kind, path) index")
    if vacuum and not compact:
        raise ValueError(
            "takedown: vacuum=True requires compact=True — vacuum "
            "reclaims directories superseded BY compaction; without it "
            "there is nothing to reclaim and the flag would be a "
            "silent no-op"
        )
    plan = [
        {"name": f"{i}:{kind}", "kind": kind, "path": p}
        for i, (kind, p) in enumerate(indexes)
    ]
    for e in plan:
        _kind_fns(e["kind"])  # validate kinds before any write
    root = _state_root(takedown_path, label)
    ids_dir = os.path.join(root, "ids")
    state = _read_state(spark, root)
    resumed = state is not None
    if state is None:
        if ids is None:
            raise ValueError(
                f"takedown: no staged record at {root!r} and no ids "
                "frame — a first call must name the ids to delete"
            )
        # stage the request: the id set this record will always mean
        ids.select(id_col).distinct().write.mode("overwrite").parquet(
            ids_dir
        )
        state = {
            "label": label,
            "id_col": id_col,
            "indexes": [
                {**e, "status": "pending", "report": None} for e in plan
            ],
        }
        _commit_state(spark, root, state)
    else:
        staged_plan = [
            {"name": e["name"], "kind": e["kind"], "path": e["path"]}
            for e in state["indexes"]
        ]
        if staged_plan != plan:
            raise ValueError(
                f"takedown: the staged record at {root!r} names a "
                f"different index set ({staged_plan}) than this call "
                f"({plan}) — a takedown is defined by its first call; "
                "use a new label for a different scope"
            )
        id_col = state["id_col"]
    staged_ids = spark.read.parquet(ids_dir)
    if resumed and ids is not None:
        # a resume that silently ignored a DIVERGENT caller frame would
        # report complete=True without ever deleting the new ids — the
        # id set, like the index plan, is defined by the first call
        passed = ids.select(id_col).distinct()
        extra = passed.join(staged_ids, id_col, "left_anti").count()
        missing = staged_ids.join(passed, id_col, "left_anti").count()
        if extra or missing:
            raise ValueError(
                f"takedown: the ids passed on resume diverge from the "
                f"staged set at {root!r} ({extra} not staged, "
                f"{missing} staged but not passed) — a takedown is "
                "defined by its first call; use a new label for a "
                "different id set"
            )

    done_statuses = (
        {"deleted", "compacted"} if not compact else {"compacted"}
    )
    for entry in state["indexes"]:
        delete_fn, _ = _kind_fns(entry["kind"])
        if entry["status"] == "pending":
            # per-index label = the takedown label: a resume replays
            # the SAME delete (overwrite-idempotent per that index's
            # contract), never compounds it
            entry["report"] = delete_fn(
                spark, entry["path"], staged_ids, label, id_col=id_col
            )
            entry["status"] = "deleted"
            _commit_state(spark, root, state)
    if compact:
        for entry in state["indexes"]:
            if entry["status"] == "deleted":
                # in-flight guard (the curation_stream discipline):
                # folding an uncommitted micro-batch's increments
                # double-counts its rows on replay, so an index whose
                # live labels look like a streaming batch (b<digits>)
                # or are named by the caller is refused — it stays at
                # 'deleted' (reads already anti-join the tombstones)
                # and this call resumes cleanly after the stream
                # commits and compacts
                live = _live_labels(spark, entry["path"])
                inflight = sorted(
                    x
                    for x in live
                    if re.fullmatch(r"b\d+", x)
                    or (exclude_labels and x in exclude_labels)
                )
                if inflight:
                    raise RuntimeError(
                        f"takedown {label!r}: refusing to compact "
                        f"{entry['name']} at {entry['path']!r} — live "
                        f"increment labels {inflight} look like "
                        "in-flight streaming batches (or were named "
                        "in exclude_labels); compacting them could "
                        "fold an uncommitted batch. The index stays "
                        "at 'deleted' (tombstones suppress on every "
                        "read); resume takedown(compact=True) after "
                        "the stream has committed and compacted, or "
                        "run against a stopped stream"
                    )
                _, compact_fn = _kind_fns(entry["kind"])
                entry["compact_report"] = compact_fn(spark, entry["path"])
                if vacuum:
                    index_vacuum(spark, entry["path"])
                entry["status"] = "compacted"
                _commit_state(spark, root, state)
    return {
        "label": label,
        "resumed": resumed,
        "complete": all(e["status"] in done_statuses
                        for e in state["indexes"]),
        "indexes": {
            e["name"]: _entry_view(e) for e in state["indexes"]
        },
    }


def _entry_view(e: dict) -> dict:
    """Per-index audit dict: delete report always, compact report when
    the compaction phase has run (what it physically reclaimed)."""
    view = {"status": e["status"], "report": e["report"]}
    if e.get("compact_report") is not None:
        view["compact_report"] = e["compact_report"]
    return view


def takedown_status(
    spark: SparkSession, takedown_path: str, label: str
) -> "dict | None":
    """The audit view: the latest committed state of one takedown
    record (per-index status + reports + state version), or ``None``
    if no record exists under this label."""
    state = _read_state(spark, _state_root(takedown_path, label))
    if state is None:
        return None
    return {
        "label": state["label"],
        "version": state["version"],
        "indexes": {
            e["name"]: _entry_view(e) for e in state["indexes"]
        },
    }


def _residual_ids(
    spark: SparkSession, kind: str, path: str, staged: DataFrame,
    id_col: str,
) -> int:
    """How many staged ids are still VISIBLE to reads of one index —
    0 is the verified-takedown condition. 'Visible' honors each
    kind's own read contract: tombstone kinds count ids present in
    the identity/content store and NOT suppressed by a live
    tombstone; physical kinds (shards/dispositions) count rows
    actually on disk. Point-in-time: a legitimately re-ingested id
    (delete → compact → re-ingest) counts as visible again."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _IDS_TABLE,
        _anti_tombstones,
        _id_str,
        _ids_buckets,
        _ip,
        _read_id_table_probed,
        _read_increment_table,
        _read_meta,
        _read_tombstones,
    )

    if kind in ("bm25", "semantic", "substring", "paragraph"):
        idb = _ids_buckets(spark, path, None)
        if idb is None:
            raise ValueError(
                f"takedown_verify: index at {path!r} has no identity "
                "layer — cannot verify"
            )
        want = staged.select(_id_str(id_col).alias("id")).distinct()
        present = _read_id_table_probed(
            spark, path, _IDS_TABLE, want, idb, None
        ).select("id").join(want, "id", "leftsemi")
        visible = _anti_tombstones(
            present, _read_tombstones(spark, path, None), "id"
        )
        return int(visible.distinct().count())
    if kind == "minhash":
        meta = _read_meta(spark, path)
        want = staged.select(F.col(id_col).alias("id")).distinct()
        ips = [
            r.ip
            for r in want.select(
                _ip(F.col("id"), meta["index_buckets"]).alias("ip")
            ).distinct().collect()
        ]
        sh = _read_increment_table(spark, path, "shingles")
        present = (
            sh.where(F.col("ip").isin(ips) if ips else F.lit(False))
            .select("id")
            .join(want, "id", "leftsemi")
        )
        visible = _anti_tombstones(
            present, _read_tombstones(spark, path, None), "id"
        )
        return int(visible.distinct().count())
    if kind == "ann":
        from etl_prometheus2clickhouse_spark.operators.ann_index import (
            _model_row,
            _pinned_live,
            _read_pinned_table,
        )

        live = _pinned_live(spark, path)
        row = _model_row(spark, path, live)
        want = staged.select(F.col(id_col).alias("id")).distinct()
        probe = [
            r.vp
            for r in want.select(
                _ip(F.col("id").cast("long"), int(row.vec_buckets))
                .alias("vp")
            ).distinct().collect()
        ]
        present = (
            _read_pinned_table(spark, path, "vectors", live)
            .where(F.col("vp").isin(probe) if probe else F.lit(False))
            .select("id")
            .join(want, "id", "leftsemi")
        )
        visible = _anti_tombstones(
            present, _read_tombstones(spark, path, live), "id"
        )
        return int(visible.distinct().count())
    if kind == "shards":
        from etl_prometheus2clickhouse_spark.operators.shards import (
            _spec_candidate_shards,
            read_shards_meta,
        )

        want = staged.select(F.col(id_col).alias(id_col)).distinct()
        meta = read_shards_meta(spark, path)
        if meta is not None and meta.get("key_spec"):
            cand = _spec_candidate_shards(want, id_col, meta)
            jvm, fs, _ = _hadoop_fs(spark, path)
            dirs = [
                os.path.join(path, f"__shard={s}")
                for s in cand
                if fs.exists(
                    jvm.org.apache.hadoop.fs.Path(
                        os.path.join(path, f"__shard={s}")
                    )
                )
            ]
            if not dirs:
                return 0
            tbl = spark.read.option("basePath", path).parquet(*dirs)
        else:
            tbl = spark.read.option("basePath", path).parquet(path)
        return int(
            tbl.select(id_col).join(
                F.broadcast(want), id_col, "leftsemi"
            ).distinct().count()
        )
    if kind == "dispositions":
        from pyspark.errors import AnalysisException

        want = staged.select(
            F.col(id_col).alias("doc_id")
        ).distinct()
        try:
            tbl = spark.read.option("basePath", path).parquet(path)
        except AnalysisException:
            return 0
        return int(
            tbl.select("doc_id").join(
                F.broadcast(want), "doc_id", "leftsemi"
            ).distinct().count()
        )
    raise ValueError(f"takedown_verify: unknown kind {kind!r}")


def takedown_verify(
    spark: SparkSession, takedown_path: str, label: str
) -> dict:
    """Compliance VERIFICATION: prove the takedown actually took.
    Re-reads the staged id set and counts, per index, the ids still
    visible to that index's reads (tombstone suppression honored for
    the tombstone kinds; bytes-on-disk for the physical kinds).
    Returns ``{label, clean, indexes: {name: {status,
    residual_ids}}}`` — ``clean`` iff every residual is zero. An
    auditor runs this after the delete (tombstone suppression in
    effect) and again after compact+vacuum (bytes gone); a non-zero
    residual means a step was skipped, a crash was never resumed, or
    the id was re-ingested since."""
    root = _state_root(takedown_path, label)
    state = _read_state(spark, root)
    if state is None:
        raise ValueError(
            f"takedown_verify: no takedown record {label!r} at "
            f"{takedown_path!r}"
        )
    staged = spark.read.parquet(os.path.join(root, "ids"))
    id_col = state["id_col"]
    out, clean = {}, True
    for e in state["indexes"]:
        n = _residual_ids(spark, e["kind"], e["path"], staged, id_col)
        clean = clean and n == 0
        out[e["name"]] = {"status": e["status"], "residual_ids": n}
    return {"label": label, "clean": clean, "indexes": out}


def takedown_list(spark: SparkSession, takedown_path: str) -> "list[dict]":
    """Every takedown record under ``takedown_path`` (label + latest
    per-index status summary) — the compliance-audit sweep view."""
    jvm, fs, hdir = _hadoop_fs(
        spark, os.path.join(takedown_path, _STATE_DIR)
    )
    if not fs.exists(hdir):
        return []
    out = []
    for st in fs.listStatus(hdir):
        if not st.isDirectory():
            continue
        label = st.getPath().getName()
        rec = takedown_status(spark, takedown_path, label)
        if rec is not None:
            out.append(rec)
    return sorted(out, key=lambda r: r["label"])


__all__ = [
    "takedown",
    "takedown_list",
    "takedown_status",
    "takedown_verify",
]
