"""Incremental ANN over a PERSISTED IVFADC index — the embedding-family
sibling of operators/dedup_index.py.

``cosine_topk_ivfpq_codes`` already scans a cell-partitioned code table;
what a daily embedding pipeline additionally needs is (a) the MODEL
persisted next to the table (codes without their quantizers are not
interpretable — the BPE-model-persistence contract) and (b) an APPEND
path: encode a new shard with the SAME stored model and land it in the
table without touching yesterday's codes. Layout under ``<path>``:

- ``codes/mb=<increment>/cell=<c>/…`` — (id, codes) rows, PARTITIONED
  by the ingestion increment and the coarse cell. A query's probe set
  prunes ``cell=`` directories at file listing (the scale_smoke
  witness); an append OVERWRITES its own ``mb=`` directory, so a
  replayed append is idempotent (the dedup-index discipline);
- ``vectors/mb=<increment>/vp=<p>/…`` — (id, vec) raw-vector rows,
  PARTITIONED by the increment and ``vp = pmod(xxhash64(id),
  vec_buckets)``: the exact-rescore side table. A search derives its
  candidates' prefixes (bounded — candidates are queries ×
  n_candidates) and reads ONLY those ``vp=`` partitions, so the final
  rescore never scans the full raw-vector corpus; also the re-encode
  source for :func:`ann_index_retrain`;
- ``model`` — one row carrying the JSON-serialized IVFPQModel
  (coarse quantizer + PQ codebooks + the residual flag) plus
  ``vec_buckets``. JSON floats round-trip exactly (shortest-repr),
  and the derived ``cnorm2`` is recomputed from identical codebooks
  with identical numpy ops, so a loaded model encodes and scores
  bit-identically.

Equivalence contract (the catalog oracle): searching the grown table
with the stored model equals the one-shot ``cosine_topk_ivfpq`` over
the full corpus with the same (base-corpus-trained) model — appends
never re-train, exactly like a production IVF deployment between
periodic re-trains.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.localframe import local_df

from etl_prometheus2clickhouse_spark.operators.dedup import (
    _register_cached,
)
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _anti_tombstones,
    _delete_path,
    _id_str,
    _ids_overlap_guard,
    _ip,
    _manifest_add,
    _pinned_live,
    _read_pinned_table,
    _read_tombstones,
    _set_manifest_table,
    _tomb_write,
)
from etl_prometheus2clickhouse_spark.operators.similarity import (
    _IVFPQ_TOPK_SCHEMA,
    IVFPQModel,
    PQModel,
    _as_double,
    _ivfpq_code_candidates,
    _pq_rescore_topk,
    _unit,
    ivfpq_encode,
    ivfpq_train,
)


def ivfpq_model_to_json(model: IVFPQModel) -> str:
    """Serialize the trained index model. ``cnorm2`` is derived state
    (recomputed on load from the same codebooks with the same ops) and
    deliberately not stored."""
    return json.dumps(
        {
            "kind": "ivfpq",
            "version": 1,
            "dim": model.pq.dim,
            "m": model.pq.m,
            "k_codes": model.pq.k_codes,
            "residuals": bool(model.residuals),
            "coarse": model.coarse.tolist(),
            "codebooks": model.pq.codebooks.tolist(),
        }
    )


def ivfpq_model_from_json(s: str) -> IVFPQModel:
    d = json.loads(s)
    if d.get("kind") != "ivfpq":
        raise ValueError(
            f"not an IVFPQ model payload (kind={d.get('kind')!r})"
        )
    B = np.asarray(d["codebooks"], dtype=np.float64)
    return IVFPQModel(
        np.asarray(d["coarse"], dtype=np.float64),
        PQModel(d["dim"], d["m"], d["k_codes"], B, (B**2).sum(axis=2)),
        bool(d["residuals"]),
    )


def _write_codes(
    shard: DataFrame,
    model: IVFPQModel,
    path: str,
    label: str,
    id_col: str,
    vec_col: str,
) -> None:
    codes = ivfpq_encode(shard, model, id_col=id_col, vec_col=vec_col)
    # cluster on the partition key first (one file per cell directory
    # instead of tasks × cells tiny files — the band-index lesson)
    codes.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(path, "codes", f"mb={label}"))


def _write_vectors(
    shard: DataFrame,
    path: str,
    label: str,
    id_col: str,
    vec_col: str,
    vec_buckets: int,
) -> None:
    """Persist the shard's RAW vectors next to the codes, PARTITIONED
    by ``vp = pmod(xxhash64(id), vec_buckets)`` — the verify-side
    sibling of the dedup index's ``ip=`` shingle layout: the final
    exact rescore reads only the partitions the (bounded) candidate
    ids hash into, so search cost stays candidate-proportional instead
    of rescanning the full raw-vector corpus. Also what makes
    :func:`ann_index_retrain` self-contained (re-encoding needs the
    raw vectors, not just the codes).

    The ``vp`` derivation hashes the id CAST TO LONG: Spark's
    ``xxhash64`` is input-type-sensitive (the same value as int vs
    bigint hashes differently), and the search side derives candidate
    prefixes from ``neighbor_id``, which the code table stores as
    bigint — without the cast an index built from an int id column
    would prune to the WRONG ``vp=`` partitions and silently drop
    true neighbors."""
    (
        shard.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        )
        .withColumn("vp", _ip(F.col("id").cast("long"), vec_buckets))
        .repartition(F.col("vp"))
        .write.mode("overwrite")
        .partitionBy("vp")
        .parquet(os.path.join(path, "vectors", f"mb={label}"))
    )


def ann_index_build(
    corpus: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    m: int = 4,
    k_codes: int = 16,
    train_sample: int = 4096,
    seed: int = 42,
    quantizers: str = "kmeans",
    residuals: bool = False,
    vec_buckets: int = 64,
) -> IVFPQModel:
    """Train on the corpus, persist model + cell-partitioned codes +
    id-bucketed raw vectors. A build is a semantic overwrite of the
    whole index (stale increments cleared first)."""
    spark = corpus.sparkSession
    _delete_path(spark, path)
    model = ivfpq_train(
        corpus,
        dim,
        n_cells=n_cells,
        m=m,
        k_codes=k_codes,
        id_col=id_col,
        vec_col=vec_col,
        train_sample=train_sample,
        seed=seed,
        quantizers=quantizers,
        residuals=residuals,
    )
    _write_codes(corpus, model, path, "base", id_col, vec_col)
    _write_vectors(corpus, path, "base", id_col, vec_col, vec_buckets)
    _write_model(spark, path, model, vec_buckets, "base")
    _manifest_add(spark, path, ["codes", "vectors", "model"], "base")
    return model


def _write_model(
    spark: SparkSession, path: str, model: IVFPQModel, vec_buckets: int,
    label: str,
) -> None:
    """One model row per ``mb=`` increment dir — manifest-tracked like
    the code table, so a retrain can swap codes AND model in ONE
    atomic manifest commit (a reader never pairs new codes with the
    old quantizers or vice versa)."""
    local_df(
        spark,
        [(ivfpq_model_to_json(model), vec_buckets)],
        "model_json string, vec_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "model", f"mb={label}")
    )


def _model_row(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None" = None,
):
    tbl = _read_pinned_table(spark, path, "model", live)
    if "vec_buckets" not in tbl.columns:
        # model row written before the vp=-bucketed raw-vector side
        # table existed: no bucket geometry to read — searches against
        # such an index must pass their own corpus (the original
        # contract); expose that as vec_buckets = None, fail-loud at
        # the rescore read if a pruned read is attempted
        tbl = tbl.withColumn("vec_buckets", F.lit(None).cast("int"))
    rows = tbl.select("model_json", "vec_buckets").collect()
    if len(rows) != 1:
        raise ValueError(
            f"ANN index at {path!r} has a corrupt model table "
            f"({len(rows)} rows, expected 1)"
        )
    return rows[0]


def ann_index_model(spark: SparkSession, path: str) -> IVFPQModel:
    return ivfpq_model_from_json(_model_row(spark, path).model_json)


def ann_index_append(
    shard: DataFrame,
    path: str,
    update_label: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Encode a new shard with the STORED model and land it in the
    shard's own ``mb=`` increment (overwrite — replay-idempotent).
    No re-training: drift between the frozen quantizers and a shifted
    embedding distribution is the deployment's re-train trigger, not
    something an append silently absorbs.

    Id-disjointness is DETECTED: the shard's ids probe the index's own
    ``vp=``-bucketed vector table (a partition filter — the table IS
    the identity store, every live vector has a row there) and an
    overlap fails loud before anything is written — a re-ingested id
    would otherwise surface as its own duplicate neighbor in every
    future search. The probe excludes the increment's own label, so an
    at-least-once replay of THIS append still passes."""
    if not update_label or any(c in update_label for c in "/=%"):
        raise ValueError(
            "ann_index_append needs a filesystem-safe update_label, "
            f"got {update_label!r}"
        )
    if update_label == "base":
        raise ValueError(
            "ann_index_append: update_label 'base' is reserved for the "
            "build increment"
        )
    spark = shard.sparkSession
    live = _pinned_live(spark, path)
    row = _model_row(spark, path, live)
    model = ivfpq_model_from_json(row.model_json)
    if row.vec_buckets is None:
        raise ValueError(
            f"ANN index at {path!r} predates the persisted vector "
            "table: appends must keep the rescore side complete — "
            "rebuild the index once with ann_index_build"
        )
    vec_buckets = int(row.vec_buckets)
    # cached: the append consumes the caller's shard THREE times (id
    # probe, codes write, vectors write) and the caller's lineage can
    # be an arbitrarily expensive derivation (the funnel's hashed
    # kept-vector frame) — one computation, three cache reads
    shard = shard.persist()
    new_ids = shard.select(F.col(id_col).alias("id")).distinct().persist()
    try:
        probe = [
            r.vp
            for r in new_ids.select(
                _ip(F.col("id").cast("long"), vec_buckets).alias("vp")
            ).distinct().collect()
        ]
        if probe:
            stored = (
                _read_pinned_table(spark, path, "vectors", live)
                .where(F.col("mb") != F.lit(update_label))
                .where(F.col("vp").isin(probe))
                .select("id")
            )
            _ids_overlap_guard(
                spark, path, new_ids, stored, "ann_index_append"
            )
        _write_codes(shard, model, path, update_label, id_col, vec_col)
        _write_vectors(
            shard, path, update_label, id_col, vec_col, vec_buckets
        )
    finally:
        new_ids.unpersist()
        shard.unpersist()
    _manifest_add(spark, path, ["codes", "vectors"], update_label)


def ann_index_search(
    queries: DataFrame,
    path: str,
    corpus: DataFrame | None = None,
    k: int = 10,
    n_probe: int = 8,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
    at_version: "int | None" = None,
) -> DataFrame:
    """ADC search over ALL increments of the persisted table with the
    stored model: probe cells prune ``cell=`` partition directories;
    the exact top-k rescore reads the index's own id-bucketed vector
    table pruned to the CANDIDATES' ``vp=`` partitions (candidates are
    bounded at queries × n_candidates, so their distinct prefixes are
    a handful of literals — never a full raw-vector scan). Passing
    ``corpus`` overrides the rescore source with a caller-supplied
    raw-vector frame (same values — the vector table is a copy of the
    ingested vectors).

    The manifest is resolved ONCE per search and model, codes, and
    vectors all read from that snapshot — the one-commit retrain swap
    guarantees a reader never pairs new codes with old quantizers only
    if the reader binds every table to one resolution (the
    ``_read_pinned_table`` contract).

    ``at_version`` pins the search to a RETAINED manifest version
    (:func:`.dedup_index.index_snapshot` — the time-travel read):
    model, codes, vectors, and tombstone visibility all bind to that
    commit, so the result is the one-shot search on the corpus as of
    that version. Note the rescore's ``corpus`` override bypasses the
    pin for raw vectors — omit it when snapshotting."""
    if n_candidates < k:
        raise ValueError("n_candidates must be >= k")
    spark = queries.sparkSession
    if at_version is not None:
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            index_snapshot,
        )

        live = index_snapshot(spark, path, at_version)
    else:
        live = _pinned_live(spark, path)
    row = _model_row(spark, path, live)
    model = ivfpq_model_from_json(row.model_json)
    table = _read_pinned_table(spark, path, "codes", live).select(
        "id", "cell", "codes"
    )
    # deleted vectors are anti-joined out BEFORE candidate generation,
    # so their freed candidate slots go to live vectors — exactly the
    # one-shot on the reduced corpus (the rescore side needs no filter:
    # it only scores candidate ids)
    table = _anti_tombstones(
        table, _read_tombstones(spark, path, live), "id"
    )
    res = _ivfpq_code_candidates(
        table, model, queries, id_col, vec_col,
        n_probe, n_candidates, max_queries, "ann_index_search",
    )
    if res is None:
        return spark.createDataFrame([], _IVFPQ_TOPK_SCHEMA)
    cand, q_ids, q_unit = res
    if corpus is not None:
        vecs = corpus.select(
            F.col(id_col).alias("id"),
            _unit(_as_double(vec_col)).alias("vec"),
        )
    else:
        if row.vec_buckets is None:
            raise ValueError(
                f"ANN index at {path!r} predates the persisted vector "
                "table (no vec_buckets in its model row): pass "
                "`corpus` for the exact rescore, or rebuild the index "
                "to get the pruned rescore reads"
            )
        cand = cand.persist()
        _register_cached(cand)
        # cast matches _write_vectors' vp derivation — xxhash64 is
        # type-sensitive, both sides must hash LONG ids
        cand_vps = [
            r.vp
            for r in cand.select(
                _ip(
                    F.col("neighbor_id").cast("long"), int(row.vec_buckets)
                ).alias("vp")
            )
            .distinct()
            .collect()
        ]
        vecs = (
            _read_pinned_table(spark, path, "vectors", live)
            .where(
                F.col("vp").isin(cand_vps) if cand_vps else F.lit(False)
            )
            .select("id", _unit(_as_double("vec")).alias("vec"))
        )
    return _pq_rescore_topk(vecs, cand, q_ids, q_unit, k)


def ann_index_retrain(
    spark: SparkSession,
    path: str,
    queries: DataFrame | None = None,
    k: int = 10,
    n_probe: int = 8,
    n_candidates: int = 50,
    min_recall_gain: float = 0.0,
    train_sample: int = 4096,
    seed: int = 43,
    quantizers: str = "kmeans",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> dict:
    """The re-train lifecycle event :func:`ann_index_append`'s frozen-
    model contract defers to: train NEW quantizers on the CURRENT
    vector distribution (the persisted id-bucketed vector table — the
    index is self-contained), re-encode every stored vector into a
    fresh versioned code increment, and SWAP codes + model in one
    atomic manifest commit — gated, when ``queries`` is given, on an
    :func:`operators.similarity.ann_recall` comparison of the old and
    new model on the same query set against the exact brute-force
    ground truth. A retrain that does not improve mean recall by at
    least ``min_recall_gain`` is rolled back (new dirs deleted,
    nothing committed) and reported, not silently kept.

    Geometry (n_cells, m, k_codes, residuals) is inherited from the
    stored model — retrain refreshes the quantizers for a drifted
    distribution, it does not change the index shape. Returns a report
    dict: ``swapped``, ``recall_old``/``recall_new`` (when gated),
    ``label``, ``n_vectors``. Superseded code/model dirs are
    reclaimed by :func:`operators.dedup_index.index_vacuum`."""
    import uuid

    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _commit_manifest,
        _manifest_tables,
    )
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        ann_recall,
        cosine_topk_bruteforce,
    )

    # one manifest resolution for model + vectors: a commit landing
    # between the two reads would pair one version's quantizers with
    # the other version's vector set (the search-path pinning contract
    # applied to the lifecycle readers)
    live = _pinned_live(spark, path)
    row = _model_row(spark, path, live)
    old_model = ivfpq_model_from_json(row.model_json)
    if row.vec_buckets is None:
        raise ValueError(
            f"ANN index at {path!r} predates the persisted vector "
            "table: retrain needs the stored raw vectors — rebuild "
            "the index once with ann_index_build"
        )
    vec_buckets = int(row.vec_buckets)
    vecs = _anti_tombstones(
        _read_pinned_table(spark, path, "vectors", live),
        _read_tombstones(spark, path, live),
        "id",
    ).select("id", "vec")
    new_model = ivfpq_train(
        vecs,
        old_model.pq.dim,
        n_cells=old_model.coarse.shape[1],
        m=old_model.pq.m,
        k_codes=old_model.pq.k_codes,
        id_col="id",
        vec_col="vec",
        train_sample=train_sample,
        seed=seed,
        quantizers=quantizers,
        residuals=old_model.residuals,
    )
    label = f"retrain-{uuid.uuid4().hex[:8]}"
    codes = ivfpq_encode(vecs, new_model, id_col="id", vec_col="vec")
    codes.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(path, "codes", f"mb={label}"))
    _write_model(spark, path, new_model, vec_buckets, label)
    # n_vectors is stamped only on the commit path below — counting the
    # full vector table before the gate decides would waste a scan on a
    # rolled-back retrain
    report: dict = {"label": label, "swapped": True}
    if queries is not None:
        corpus = vecs.select(
            F.col("id").alias(id_col), F.col("vec").alias(vec_col)
        )
        exact = cosine_topk_bruteforce(
            corpus, queries, id_col=id_col, vec_col=vec_col, k=k
        ).select("query_id", "neighbor_id")

        def _mean_recall(approx: DataFrame) -> float:
            r = ann_recall(exact, approx).agg(
                F.avg("recall_at_k").alias("r")
            ).first()
            return float(r.r) if r.r is not None else 0.0

        old_approx = ann_index_search(
            queries, path, k=k, n_probe=n_probe,
            n_candidates=n_candidates, id_col=id_col, vec_col=vec_col,
            max_queries=max_queries,
        )
        new_codes = spark.read.parquet(
            os.path.join(path, "codes", f"mb={label}")
        ).select("id", "cell", "codes")
        res = _ivfpq_code_candidates(
            new_codes, new_model, queries, id_col, vec_col,
            n_probe, n_candidates, max_queries, "ann_index_retrain",
        )
        if res is None:
            raise ValueError("ann_index_retrain: empty query set")
        cand, q_ids, q_unit = res
        new_approx = _pq_rescore_topk(
            vecs.select("id", _unit(_as_double("vec")).alias("vec")),
            cand, q_ids, q_unit, k,
        )
        report["recall_old"] = _mean_recall(old_approx)
        report["recall_new"] = _mean_recall(new_approx)
        if report["recall_new"] < report["recall_old"] + min_recall_gain:
            # roll back: delete the uncommitted dirs, keep everything
            # as it was — the gate is the point of the lifecycle
            _delete_path(spark, os.path.join(path, "codes", f"mb={label}"))
            _delete_path(spark, os.path.join(path, "model", f"mb={label}"))
            report["swapped"] = False
            # the increment dirs named by `label` no longer exist —
            # don't hand callers a dangling reference
            report["label"] = None
            return report
    tables = _manifest_tables(spark, path, ["codes", "vectors", "model"])
    tables["codes"] = [f"mb={label}"]
    tables["model"] = [f"mb={label}"]
    _commit_manifest(spark, path, tables)
    report["n_vectors"] = vecs.count()
    return report


__all__ = [
    "ivfpq_model_to_json",
    "ivfpq_model_from_json",
    "ann_index_build",
    "ann_index_model",
    "ann_index_append",
    "ann_index_search",
    "ann_index_delete",
    "ann_index_retrain",
    "ann_cell_occupancy",
    "ann_occupancy_skew",
    "ann_index_retrain_on_skew",
]


def ann_cell_occupancy(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None" = None,
) -> DataFrame:
    """Per-cell vector counts of the live code table — one row per
    coarse cell (sketch-sized: bounded by n_cells, never the corpus).
    The telemetry the hot-cell skew witness reads after every append:
    IVFADC probe work is |queries∩cell| × |corpus∩cell|, so a frozen
    centroid silently absorbing the distribution under drift is the
    failure mode the retrain lifecycle exists to repair."""
    return (
        _anti_tombstones(
            _read_pinned_table(spark, path, "codes", live),
            _read_tombstones(spark, path, live),
            "id",
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def ann_occupancy_skew(spark: SparkSession, path: str) -> dict:
    """Skew summary of :func:`ann_cell_occupancy`: ``skew`` is the
    largest cell's share × n_cells — 1.0 when perfectly balanced,
    n_cells when one centroid holds everything. A bounded collect
    (≤ n_cells rows)."""
    live = _pinned_live(spark, path)
    row = _model_row(spark, path, live)
    model = ivfpq_model_from_json(row.model_json)
    n_cells = int(model.coarse.shape[1])
    occ = ann_cell_occupancy(spark, path, live).collect()
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


def ann_index_retrain_on_skew(
    spark: SparkSession,
    path: str,
    skew_threshold: float = 4.0,
    queries: DataFrame | None = None,
    **retrain_kwargs,
) -> dict:
    """Fire the (gated, reversible) :func:`ann_index_retrain` when the
    occupancy-skew witness trips — the scheduled maintenance face of
    the model lifecycle: appends freeze the quantizers, the witness
    watches what freezing costs, and the retrain only swaps if the
    recall gate (when ``queries`` is given) holds. Returns the skew
    report before (and, when swapped, after) plus the retrain report;
    ``triggered=False`` means the index was still balanced and nothing
    ran."""
    before = ann_occupancy_skew(spark, path)
    report: dict = {
        "skew_before": before,
        "triggered": before["skew"] >= skew_threshold,
        "swapped": False,
    }
    if not report["triggered"]:
        return report
    report.update(
        ann_index_retrain(spark, path, queries=queries, **retrain_kwargs)
    )
    if report["swapped"]:
        report["skew_after"] = ann_occupancy_skew(spark, path)
    return report


def ann_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "vec_id",
) -> dict:
    """Tombstone vectors out of the live index — the takedown /
    right-to-be-forgotten lifecycle event. After the commit,
    :func:`ann_index_search` returns EXACTLY the one-shot search on the
    reduced corpus with the same frozen model: the deleted codes are
    anti-joined out BEFORE candidate generation (their candidate slots
    go to live vectors), and occupancy/retrain read only live vectors.
    Physical bytes are reclaimed by :func:`ann_index_compact`, which
    drops tombstoned code/vector rows and clears the tombstone table;
    until then the id stays "occupied" for the append-overlap guard
    (delete → compact → re-ingest). The delete set is resolved against
    the ``vp=``-pruned vector table, so ids never in the index are
    ignored and a replayed delete (same label) is idempotent. Returns
    ``{deleted_vectors}``."""
    if not label or any(c in label for c in "/=%"):
        raise ValueError(
            f"ann_index_delete needs a filesystem-safe label, got {label!r}"
        )
    live = _pinned_live(spark, path)
    row = _model_row(spark, path, live)
    if row.vec_buckets is None:
        raise ValueError(
            f"ANN index at {path!r} predates the persisted vector "
            "table: deletes need the identity-bearing vector table — "
            "rebuild the index once with ann_index_build"
        )
    vec_buckets = int(row.vec_buckets)
    want = ids.select(F.col(id_col).alias("id")).distinct()
    probe = [
        r.vp
        for r in want.select(
            _ip(F.col("id").cast("long"), vec_buckets).alias("vp")
        ).distinct().collect()
    ]
    present = (
        _read_pinned_table(spark, path, "vectors", live)
        .where(F.col("vp").isin(probe) if probe else F.lit(False))
        .select("id")
        .join(want, "id", "leftsemi")
    )
    # already-tombstoned ids are not re-counted; PRIOR tombstones only,
    # so a replayed delete does not see its own first attempt
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
        _tomb_write(
            spark, path, effective.select(_id_str("id").alias("id")),
            label, vec_buckets,
        )
    finally:
        effective.unpersist()
    _manifest_add(spark, path, ["tombstones"], label)
    return {"deleted_vectors": int(n)}


def ann_index_compact(
    spark: SparkSession, path: str,
    exclude_labels: set[str] | None = None,
) -> dict:
    """Fold accumulated code-table increments back into ``mb=base``
    (operators/dedup_index.py:_compact_increment_table — the shared
    maintenance pass): physical rewrite only, search results unchanged
    (pytest-pinned). The model table is already a single artifact.

    Deletion integration: the folds PHYSICALLY DROP tombstoned
    code/vector rows, then the tombstone table is cleared LAST — a
    reader between the commits sees old rows + live tombstones
    (anti-joined out) or reduced rows + harmless tombstones, never a
    resurrected vector. With ``exclude_labels`` (an in-flight streaming
    batch) tombstones are kept, since excluded increments were not
    rewritten."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _compact_increment_table,
    )

    live = _pinned_live(spark, path)
    tomb = _read_tombstones(spark, path, live)

    def _drop_tombstoned(rows: DataFrame) -> DataFrame:
        return _anti_tombstones(rows, tomb, "id")

    # physical drop only when tombstones clear in the same pass (see
    # bm25_index_compact): dropping rows while tombstones stay live
    # would let a re-ingest pass the overlap guard yet stay invisible
    drop = _drop_tombstoned if not exclude_labels else None

    out = {
        "codes_rows": _compact_increment_table(
            spark, path, "codes", "cell", exclude_labels=exclude_labels,
            transform=drop,
        ),
        "vectors_rows": _compact_increment_table(
            spark, path, "vectors", "vp", exclude_labels=exclude_labels,
            transform=drop,
        ),
    }
    if tomb is not None and not exclude_labels:
        _set_manifest_table(spark, path, "tombstones", [])
        out["tombstones_cleared"] = True
    return out
