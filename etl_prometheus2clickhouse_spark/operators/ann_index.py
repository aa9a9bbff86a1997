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
- ``model`` — one row carrying the JSON-serialized IVFPQModel
  (coarse quantizer + PQ codebooks + the residual flag). JSON floats
  round-trip exactly (shortest-repr), and the derived ``cnorm2`` is
  recomputed from identical codebooks with identical numpy ops, so a
  loaded model encodes and scores bit-identically.

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

from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _delete_path,
)
from etl_prometheus2clickhouse_spark.operators.similarity import (
    IVFPQModel,
    PQModel,
    cosine_topk_ivfpq_codes,
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
) -> IVFPQModel:
    """Train on the corpus, persist model + cell-partitioned codes.
    A build is a semantic overwrite of the whole index (stale
    increments cleared first)."""
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
    spark.createDataFrame(
        [(ivfpq_model_to_json(model),)], "model_json string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "model")
    )
    return model


def ann_index_model(spark: SparkSession, path: str) -> IVFPQModel:
    rows = spark.read.parquet(os.path.join(path, "model")).collect()
    if len(rows) != 1:
        raise ValueError(
            f"ANN index at {path!r} has a corrupt model table "
            f"({len(rows)} rows, expected 1)"
        )
    return ivfpq_model_from_json(rows[0].model_json)


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
    something an append silently absorbs."""
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
    model = ann_index_model(spark, path)
    _write_codes(shard, model, path, update_label, id_col, vec_col)


def ann_index_search(
    queries: DataFrame,
    path: str,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int = 8,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> DataFrame:
    """ADC search over ALL increments of the persisted table with the
    stored model: probe cells prune ``cell=`` partition directories,
    candidates are exact-rescored against ``corpus`` (the raw-vector
    side, needed only for the final top-k rescore)."""
    spark = queries.sparkSession
    model = ann_index_model(spark, path)
    table = spark.read.parquet(os.path.join(path, "codes")).select(
        "id", "cell", "codes"
    )
    return cosine_topk_ivfpq_codes(
        table,
        model,
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        n_probe=n_probe,
        n_candidates=n_candidates,
        max_queries=max_queries,
    )


__all__ = [
    "ivfpq_model_to_json",
    "ivfpq_model_from_json",
    "ann_index_build",
    "ann_index_model",
    "ann_index_append",
    "ann_index_search",
]


def ann_index_compact(spark: SparkSession, path: str) -> dict:
    """Fold accumulated code-table increments back into ``mb=base``
    (operators/dedup_index.py:_compact_increment_table — the shared
    maintenance pass): physical rewrite only, search results unchanged
    (pytest-pinned). The model table is already a single artifact."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _compact_increment_table,
    )

    return {
        "codes_rows": _compact_increment_table(
            spark, os.path.join(path, "codes"), "cell"
        )
    }
