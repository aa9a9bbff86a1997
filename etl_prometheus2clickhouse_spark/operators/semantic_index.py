"""Incremental SemDeDup against a PERSISTED cell-partitioned vector
index — the embedding-family member of the incremental dedup layer
(operators/dedup_index.py for text; operators/ann_index.py for
similarity SEARCH; this module for similarity DEDUP).

:func:`operators.similarity.semantic_dedup` (Abbas et al.,
arXiv:2303.09540) is one-shot: it re-clusters and re-compares the full
corpus every run. A daily embedding pipeline instead needs to dedup a
NEW shard against everything already ingested without rescanning it.
Layout under ``<path>``:

- ``vectors/mb=<increment>/cell=<c>/…`` — ``(id, vec)`` UNIT vectors,
  PARTITIONED by the ingestion increment and the frozen-centroid cell.
  A shard probe prunes ``cell=`` directories at file listing to the
  cells the shard itself lands in (the band-index ``bb=`` discipline);
  an update OVERWRITES its own ``mb=`` directory, so a replayed
  increment is idempotent, and increments become live only through the
  manifest commit (the dedup-index atomicity contract).
- ``model`` — one row: the JSON centroid matrix plus the pinned
  ``threshold`` — geometry is index state, not a probe parameter, so a
  build can never be probed with mismatched parameters (the
  sketch-geometry fail-loud contract).

Equivalence contract (STRONGER than the MinHash index's): the
increment's dispositions for the shard's own rows are EXACTLY the
one-shot ``semantic_dedup`` of corpus∪shard restricted to the shard —
no banding-recall or bucket-cap caveat, because (a) cells come from the
FROZEN stored centroids, so assignment is identical, and (b) ALL prior
vectors (duplicates included — the one-shot's lower-id relation ranges
over every vector, not just the kept ones) are in the index, so
``dup_of = min{lower id, same cell, cos ≥ threshold}`` sees the same
candidate set both ways. Corpus-LEVEL equivalence (no stored row would
flip) additionally needs shards to arrive in ascending id order — the
id-ordered keep-first contract shared by every increment in this layer:
decisions already persisted are monotone, never un-made.

Scale shape: the probe reads only the shard's own cells (partition
filter, ≤ ``n_cells`` literals); within a cell the pair work is
|shard ∩ cell| × |corpus ∩ cell| with |cell| ≈ n/n_cells — the paper
runs 50k clusters over 5B embeddings for exactly this bound, so
``n_cells`` must scale with the corpus (the 100 TB knob). Vectors are
stored unit-normalized, so the verify is a dot product, and the emitted
columns are float-free (ids + booleans): no rounding surface in the
result. Re-clustering under distribution drift is an explicit
lifecycle event (rebuild), not something an increment silently absorbs
— the ann_index_append contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.localframe import local_df
from pyspark.sql import types as T

from etl_prometheus2clickhouse_spark.operators.dedup import (
    _register_cached,
    _with_cached_deps,
)
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _anti_tombstones,
    _compact_increment_table,
    _delete_path,
    _id_str,
    _ids_buckets,
    _ip,
    _ids_init,
    _ids_overlap_guard,
    _ids_write,
    _manifest_add,
    _pinned_live,
    _read_id_table_probed,
    _read_pinned_table,
    _read_tombstones,
    _set_manifest_table,
    _tomb_write,
)
from etl_prometheus2clickhouse_spark.operators.similarity import (
    _as_double,
    _dot,
    _train_centroids,
    _unit,
)


def _model_json(C: np.ndarray, threshold: float) -> str:
    """Serialize the frozen geometry: the (dim × n_cells) centroid
    matrix and the pinned duplicate threshold. JSON floats round-trip
    exactly (shortest-repr), so a loaded model assigns cells
    bit-identically."""
    return json.dumps(
        {
            "kind": "semantic",
            "version": 1,
            "dim": int(C.shape[0]),
            "n_cells": int(C.shape[1]),
            "threshold": float(threshold),
            "centroids": C.tolist(),
        }
    )


def _model_from_json(s: str) -> tuple[np.ndarray, float]:
    d = json.loads(s)
    if d.get("kind") != "semantic":
        raise ValueError(
            f"not a semantic index payload (kind={d.get('kind')!r})"
        )
    C = np.asarray(d["centroids"], dtype=np.float64)
    if C.shape != (d["dim"], d["n_cells"]):
        raise ValueError(
            f"semantic model shape {C.shape} != "
            f"({d['dim']}, {d['n_cells']})"
        )
    return C, float(d["threshold"])


def _cell_udf(C: np.ndarray):
    """argmax-dot cell assignment — the identical kernel (and the
    identical first-max tie-break) as semantic_dedup's in-line UDF
    (operators/similarity.py:1829), per-Arrow-batch GEMM against the
    broadcast centroid matrix."""

    @F.pandas_udf(T.IntegerType())
    def _cell(vs: pd.Series) -> pd.Series:
        mask = vs.notna().to_numpy()
        res = np.zeros(len(vs), dtype=np.int32)
        if mask.any():
            sims = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in vs[mask]]
            ) @ C
            res[mask] = sims.argmax(axis=1)
        return pd.Series(res)

    return _cell


def _read_model(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None" = None,
) -> tuple[np.ndarray, float]:
    rows = (
        _read_pinned_table(spark, path, "model", live)
        .select("model_json")
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(
            f"semantic index at {path!r} has a corrupt model table "
            f"({len(rows)} rows, expected 1)"
        )
    return _model_from_json(rows[0].model_json)


def _write_cell_vectors(
    cells: DataFrame, path: str, label: str
) -> None:
    """Land ``(cell, id, vec)`` rows in the increment's own ``mb=``
    directory, clustered on the partition key first (one file per
    ``cell=`` directory instead of tasks × cells tiny files — the
    band-index small-files lesson)."""
    cells.select("cell", "id", "vec").repartition(
        F.col("cell")
    ).write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "vectors", f"mb={label}")
    )


def semantic_index_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    threshold: float = 0.95,
    train_sample: int = 4096,
    seed: int = 42,
    centroids: str = "kmeans",
    id_buckets: int = 64,
) -> None:
    """Train centroids on the corpus (driver-side k-means on a bounded
    deterministic sample — the :func:`_train_centroids` contract;
    ``centroids="first"`` is the SQL-expressible quantizer for the
    parity oracle), assign every corpus vector, and persist model +
    cell-partitioned unit vectors + the ``ip=``-bucketed identity
    table (the vectors are CELL-partitioned, so they cannot serve as
    the append-overlap probe — the BM25 ``ids`` discipline applies).
    A build is a semantic overwrite of the whole index (stale
    increments cleared first)."""
    spark = corpus.sparkSession
    _delete_path(spark, path)
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    sample = vecs.orderBy("id").limit(train_sample).select("vec").collect()
    X = np.asarray([r.vec for r in sample], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("semantic_index_build: empty corpus")
    n_cells = min(n_cells, len(X))
    if centroids == "first":
        C = X[:n_cells].T
    else:
        C = _train_centroids(X, n_cells, seed=seed).T
    cells = vecs.withColumn("cell", _cell_udf(C)(F.col("vec")))
    _write_cell_vectors(cells, path, "base")
    local_df(
        spark, [(_model_json(C, threshold),)], "model_json string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "model", "mb=base")
    )
    _ids_write(
        vecs.select(_id_str("id").alias("id")), path, "base", id_buckets
    )
    _ids_init(spark, path, id_buckets)
    _manifest_add(
        spark, path, ["vectors", "model", "ids", "idmeta"], "base"
    )


def semantic_increment(
    shard: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    update_index: bool = False,
    update_label: str | None = None,
) -> DataFrame:
    """Semantically dedup a NEW shard against the persisted index:
    assign cells with the FROZEN stored centroids, probe ONLY the
    shard's own ``cell=`` partitions, and mark each shard vector whose
    6-dp-rounded cosine to a LOWER-ID cell-mate (stored or same-shard)
    reaches the pinned threshold.

    Output: one row per SHARD vector — ``(id, cell, dup_of, kept)``,
    the :func:`operators.similarity.semantic_dedup` schema; for the
    shard's rows it equals the one-shot over corpus∪shard EXACTLY
    (module docstring has the argument).

    ``update_index=True`` lands ALL the shard's vectors (duplicates
    included — tomorrow's lower-id relation must range over them) in
    the increment's own ``mb=<update_label>`` directory; OVERWRITE +
    the probe's own-label exclusion make an at-least-once replay
    idempotent in both the index and the dispositions."""
    if update_index:
        if not update_label or any(c in update_label for c in "/=%"):
            raise ValueError(
                "semantic_increment: update_index=True needs a "
                f"filesystem-safe update_label, got {update_label!r}"
            )
        if update_label == "base":
            raise ValueError(
                "semantic_increment: update_label 'base' is reserved "
                "for the build increment"
            )
    spark = shard.sparkSession
    # one manifest resolution for BOTH the frozen centroids and the
    # stored-vector read: a retrain committing between them would
    # otherwise assign cells with the OLD model while probing vectors
    # partitioned by the NEW one — wrong cells pruned, silent misses
    live = _pinned_live(spark, path)
    C, threshold = _read_model(spark, path, live)
    id_buckets = _ids_buckets(spark, path, live)
    vecs = shard.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    cells = vecs.withColumn("cell", _cell_udf(C)(F.col("vec"))).persist()
    _register_cached(cells)

    # the probe set: the distinct cells the shard itself lands in —
    # bounded by n_cells literals, pushed as a PARTITION filter so the
    # stored-vector read prunes file listings to those directories.
    # ONE collect serves both probe sets (cells AND the guard's id
    # buckets) and MATERIALIZES the cache, so the guard join and the
    # identity write below reuse the one shard scan (the append's
    # fixed job count was the round-14 regression: three extra shard
    # scans + two probe collects per append). The pair-distinct
    # collect is bounded by n_cells × id_buckets rows of two ints.
    need_guard = update_index and id_buckets is not None
    probe_pairs = (
        cells.select(
            "cell",
            (
                _ip(_id_str("id"), id_buckets)
                if need_guard else F.lit(0)
            ).alias("ip"),
        )
        .distinct()
        .collect()
    )
    probe_cells = sorted({r.cell for r in probe_pairs})
    if need_guard:
        # id-overlap detection before anything is written: an
        # overlapping update would give the one-shot's lower-id
        # relation two rows for one identity (self-duplicate at cos
        # 1.0). Pruned to the shard's own ip= buckets; the increment's
        # own replayed label is excluded, so at-least-once replays
        # pass.
        new_ids = cells.select(_id_str("id").alias("id")).distinct()
        probe_ips = sorted({r.ip for r in probe_pairs})
        stored_ids = _read_id_table_probed(
            spark, path, "ids", new_ids, id_buckets, live,
            exclude_label=update_label, probe=probe_ips,
        ).select("id")
        _ids_overlap_guard(
            spark, path, new_ids, stored_ids, "semantic_increment"
        )
    stored = _read_pinned_table(spark, path, "vectors", live)
    if update_index:
        # at-least-once replay: a failed first attempt's own mb= rows
        # would make every shard vector its own stored twin (cos 1.0)
        # and mark the whole shard duplicate — the dedup_increment
        # replay-exclusion contract
        stored = stored.where(F.col("mb") != F.lit(update_label))
    stored = stored.where(
        F.col("cell").isin(probe_cells) if probe_cells else F.lit(False)
    )
    # deleted vectors must not suppress new shard rows — the one-shot's
    # lower-id relation on the REDUCED corpus never sees them
    stored = _anti_tombstones(
        stored, _read_tombstones(spark, path, live), "id"
    ).select("cell", "id", "vec")

    # dup_of(x) = min{y < x, same cell, round(cos,6) ≥ threshold} with
    # y ranging over stored ∪ shard — exactly the one-shot's relation
    # restricted to shard rows. Both sides are pre-filtered to
    # qualifying pairs before the min aggregate: nothing quadratic
    # survives the stage (the semantic_dedup scale shape).
    s = cells.select(
        F.col("cell"), F.col("id").alias("id_b"), F.col("vec").alias("vec_b")
    )
    old = stored.select(
        F.col("cell"), F.col("id").alias("id_a"), F.col("vec").alias("vec_a")
    )
    new_a = cells.select(
        F.col("cell"), F.col("id").alias("id_a"), F.col("vec").alias("vec_a")
    )
    qualifying = (
        old.unionByName(new_a)
        .join(s, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(_dot(F.col("vec_a"), F.col("vec_b")), 6)
            >= F.lit(threshold)
        )
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    out = cells.join(qualifying, cells.id == qualifying.id_b, "left").select(
        F.col("id").alias(id_col),
        F.col("cell").cast("int").alias("cell"),
        F.col("dup_of").cast("long").alias("dup_of"),
        F.col("dup_of").isNull().alias("kept"),
    )
    if update_index:
        _write_cell_vectors(cells, path, update_label)
        if id_buckets is not None:
            # from the CACHED frame — no shard re-scan for the id rows
            _ids_write(
                cells.select(_id_str("id").alias("id")),
                path, update_label, id_buckets,
            )
        # data dirs land first, the manifest commit makes them live — a
        # crash between the two leaves invisible (replay-overwritten)
        # directories, never a half-registered increment
        _manifest_add(
            spark, path,
            ["vectors"] + (["ids"] if id_buckets is not None else []),
            update_label,
        )
    return _with_cached_deps(out, [cells])


def _pair_colocation(
    X: np.ndarray, C: np.ndarray, threshold: float
) -> float:
    """Fraction of the sample's true duplicate pairs (6-dp-rounded
    cosine ≥ threshold, the increment's own cut) that land in the SAME
    cell under centroid matrix ``C`` — SemDeDup's recall axis: a
    cross-cell near-dup pair is an accepted miss, and distribution
    drift under frozen centroids silently grows that miss rate.
    Driver-side on the bounded retrain sample (the centroid-training
    budget), 1.0 when the sample has no qualifying pairs."""
    S = np.round(X @ X.T, 6)
    iu = np.triu_indices(len(X), k=1)
    hit = S[iu] >= threshold
    n_pairs = int(hit.sum())
    if n_pairs == 0:
        return 1.0
    cells = (X @ C).argmax(axis=1)
    same = cells[iu[0]] == cells[iu[1]]
    return float((hit & same).sum() / n_pairs)


def semantic_index_retrain(
    spark: SparkSession,
    path: str,
    min_colocation_gain: float = 0.0,
    train_sample: int = 4096,
    seed: int = 43,
) -> dict:
    """The re-cluster lifecycle event the frozen-centroid contract
    defers to: train NEW centroids on the CURRENT stored vector
    distribution (the index is self-contained), re-assign every stored
    vector, and SWAP vectors + model in one atomic manifest commit —
    gated on the duplicate-pair CO-LOCATION rate (old vs new centroids
    on the same bounded sample): a retrain that does not improve the
    fraction of true near-dup pairs sharing a cell by at least
    ``min_colocation_gain`` is rolled back (new dirs deleted, nothing
    committed) and reported, not silently kept.

    Geometry (n_cells, threshold) is inherited from the stored model.
    PAST dispositions are unaffected — they live with the caller; a
    retrain changes which FUTURE pairs get compared (the cross-cell
    miss set), which is exactly the drift this event exists to repair.
    Returns ``{swapped, colocation_old, colocation_new, label,
    n_vectors}``; superseded dirs are reclaimed by
    :func:`.dedup_index.index_vacuum`."""
    import uuid

    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _commit_manifest,
        _manifest_tables,
    )

    # one manifest resolution for model + vectors: a retrain committing
    # between the two reads would pair one version's n_cells with the
    # other version's cell assignments (the search/increment pinning
    # contract applied to the lifecycle readers)
    live = _pinned_live(spark, path)
    C_old, threshold = _read_model(spark, path, live)
    vecs = _anti_tombstones(
        _read_pinned_table(spark, path, "vectors", live),
        _read_tombstones(spark, path, live),
        "id",
    ).select("id", "vec")
    sample = vecs.orderBy("id").limit(train_sample).select("vec").collect()
    X = np.asarray([r.vec for r in sample], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("semantic_index_retrain: empty vector table")
    n_cells = C_old.shape[1]
    C_new = _train_centroids(X, min(n_cells, len(X)), seed=seed).T
    report: dict = {
        "colocation_old": _pair_colocation(X, C_old, threshold),
        "colocation_new": _pair_colocation(X, C_new, threshold),
        "n_vectors": vecs.count(),
        "swapped": True,
    }
    if (
        report["colocation_new"]
        < report["colocation_old"] + min_colocation_gain
    ):
        report["swapped"] = False
        report["label"] = None
        return report
    label = f"retrain-{uuid.uuid4().hex[:8]}"
    report["label"] = label
    reassigned = vecs.withColumn("cell", _cell_udf(C_new)(F.col("vec")))
    _write_cell_vectors(reassigned, path, label)
    local_df(
        spark, [(_model_json(C_new, threshold),)], "model_json string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "model", f"mb={label}")
    )
    tables = _manifest_tables(spark, path, ["vectors", "model"])
    tables["vectors"] = [f"mb={label}"]
    tables["model"] = [f"mb={label}"]
    _commit_manifest(spark, path, tables)
    return report


def semantic_cell_occupancy(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None" = None,
) -> DataFrame:
    """Per-cell vector counts of the live vector table — one row per
    frozen centroid (bounded by n_cells). ``semantic_increment``'s
    pair work is |shard∩cell| × |corpus∩cell|, so a hot cell under
    distribution drift is THE quantity that breaks the Σ|cell|² bound
    the module's 100 TB argument rests on; this is the witness that
    watches it."""
    return (
        _anti_tombstones(
            _read_pinned_table(spark, path, "vectors", live),
            _read_tombstones(spark, path, live),
            "id",
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def semantic_occupancy_skew(spark: SparkSession, path: str) -> dict:
    """Skew summary of :func:`semantic_cell_occupancy` (largest cell's
    share × n_cells; 1.0 balanced, n_cells degenerate). Bounded
    collect."""
    live = _pinned_live(spark, path)
    C, _thr = _read_model(spark, path, live)
    n_cells = int(C.shape[1])
    occ = semantic_cell_occupancy(spark, path, live).collect()
    total = sum(r.n_vectors for r in occ)
    biggest = max(occ, key=lambda r: r.n_vectors) if occ else None
    max_share = (biggest.n_vectors / total) if total else 0.0
    return {
        "n_cells": n_cells,
        "occupied_cells": len(occ),
        "total_vectors": total,
        "max_cell": int(biggest.cell) if biggest else None,
        "max_share": max_share,
        "skew": max_share * n_cells,
    }


def semantic_retrain_on_skew(
    spark: SparkSession,
    path: str,
    skew_threshold: float = 4.0,
    **retrain_kwargs,
) -> dict:
    """Fire the (co-location-gated, reversible)
    :func:`semantic_index_retrain` when the occupancy-skew witness
    trips. NOTE the dedup-semantics caveat the gate enforces: past
    dispositions stay with the caller; a swap changes which FUTURE
    pairs share a cell — exactly the drift repair this event exists
    for."""
    before = semantic_occupancy_skew(spark, path)
    report: dict = {
        "skew_before": before,
        "triggered": before["skew"] >= skew_threshold,
        "swapped": False,
    }
    if not report["triggered"]:
        return report
    report.update(semantic_index_retrain(spark, path, **retrain_kwargs))
    if report["swapped"]:
        report["skew_after"] = semantic_occupancy_skew(spark, path)
    return report


def semantic_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "vec_id",
) -> dict:
    """Tombstone vectors out of the live index — the takedown
    lifecycle event. After the commit the stored-side candidate set of
    every future :func:`semantic_increment` excludes the deleted ids
    (the one-shot's lower-id relation on the REDUCED corpus), and
    occupancy/retrain read only live vectors. Past dispositions stay
    with the caller — deletion changes which FUTURE pairs exist, it
    never un-makes a persisted decision (the layer's monotonicity
    contract). Compaction physically drops tombstoned rows and clears
    the table; until then the id stays occupied for the overlap guard
    (delete → compact → re-ingest). Returns ``{deleted_vectors}``."""
    if not label or any(c in label for c in "/=%"):
        raise ValueError(
            "semantic_index_delete needs a filesystem-safe label, "
            f"got {label!r}"
        )
    live = _pinned_live(spark, path)
    id_buckets = _ids_buckets(spark, path, live)
    if id_buckets is None:
        raise ValueError(
            f"semantic_index_delete: the index at {path!r} predates "
            "the identity layer (no idmeta table) — rebuild it once "
            "with semantic_index_build to enable deletes"
        )
    want = ids.select(_id_str(id_col).alias("id")).distinct()
    present = _read_id_table_probed(
        spark, path, "ids", want, id_buckets, live,
    ).select("id").join(want, "id", "leftsemi")
    tomb_prior = None
    if live is not None and live.get("tombstones"):
        prior = [d for d in live["tombstones"] if d != f"mb={label}"]
        if prior:
            root = os.path.join(path, "tombstones")
            tomb_prior = spark.read.option("basePath", root).parquet(
                *[os.path.join(root, d) for d in prior]
            ).select("id")
    # persisted: the count and the tombstone write both consume the
    # pruned resolve join — one computation, not two
    effective = _anti_tombstones(present, tomb_prior, "id").persist()
    try:
        n = effective.count()
        _tomb_write(spark, path, effective, label, id_buckets)
    finally:
        effective.unpersist()
    _manifest_add(spark, path, ["tombstones"], label)
    return {"deleted_vectors": int(n)}


def semantic_index_compact(
    spark: SparkSession, path: str,
    exclude_labels: set[str] | None = None,
) -> dict:
    """Fold accumulated ``mb=`` increments into one directory via the
    manifest swap (atomic for readers; run :func:`.dedup_index.
    index_vacuum` afterwards to reclaim superseded dirs). Decisions
    are unchanged — the increment layout is physical, not semantic.
    ``exclude_labels`` is the streaming replay guard (see
    :func:`.dedup_index._compact_increment_table`): the model/idmeta
    tables are never folded.

    Deletion integration: the vector/identity folds PHYSICALLY DROP
    tombstoned rows, then the tombstone table is cleared LAST (a
    reader in between anti-joins still-live tombstones — a no-op on
    the reduced rows). With ``exclude_labels`` tombstones are kept."""
    live = _pinned_live(spark, path)
    tomb = _read_tombstones(spark, path, live)

    def _drop_tombstoned(rows: DataFrame) -> DataFrame:
        return _anti_tombstones(rows, tomb, "id")

    # physical drop only when tombstones clear in the same pass (see
    # bm25_index_compact): dropping rows while tombstones stay live
    # would let a re-ingest pass the overlap guard yet stay invisible
    drop = _drop_tombstoned if not exclude_labels else None

    out = {
        "vector_rows": _compact_increment_table(
            spark, path, "vectors", "cell", exclude_labels=exclude_labels,
            transform=drop,
        )
    }
    if (live or {}).get("ids") or _ids_buckets(spark, path, live):
        out["id_rows"] = _compact_increment_table(
            spark, path, "ids", "ip", exclude_labels=exclude_labels,
            transform=drop,
        )
    if tomb is not None and not exclude_labels:
        _set_manifest_table(spark, path, "tombstones", [])
        out["tombstones_cleared"] = True
    return out
