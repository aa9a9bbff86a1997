"""Takedown for the MATERIALIZED pipeline outputs: training shards
and the streaming funnel's dispositions table.

The per-index deletes (bm25/ann/semantic/minhash/substring/paragraph)
remove a document from the engine's *metadata*; the data a compliance
request is actually about lives in what the pipeline *published* — the
training shard directories written by
:func:`.sampling.write_training_shards` and the append-only
``(doc_id, disposition)`` audit table the streaming curation funnel
maintains. This module closes that gap with the same lifecycle
contract as the persisted indexes:

- ``shards_delete`` / ``dispositions_delete`` physically rewrite ONLY
  the partitions containing the staged ids, through the engine's
  crash-safe staged-swap protocol (stage under a dot-directory readers
  never list → rename to a ``.commit-*`` marker = the durable point of
  no return → per-partition delete + rename → drop the marker; every
  crash window is decidable from directory state alone and healed by
  the next writer);
- deletion is PHYSICAL at delete time (no tombstone phase): shards and
  dispositions are consumed by external readers — training jobs, audit
  SQL — that read raw parquet and cannot be asked to anti-join a
  tombstone table, so "deleted" must mean the bytes are gone;
  ``*_compact`` are therefore documented no-ops kept only so the
  registry contract (delete then compact) is uniform across kinds;
- replay under the same label is idempotent: the rewrite is an
  anti-join against the staged set, and removing already-absent rows
  rewrites a partition to identical content.

100 TB shape — the affected-partition set, never the corpus:

- **shards**: the shard id is a pure hash function of the row
  (``floor(mix_key / width)`` with ``mix_key`` the deterministic
  per-copy key of :func:`.sampling.mix_corpora` /
  :func:`.sampling.mix_epochs`), so when the writer recorded its key
  spec (``write_training_shards(..., key_spec=...)``) the affected
  shard set is RECOMPUTED from the delete ids with the same exact
  wide-integer expressions — delete-set-sized compute, zero corpus
  bytes read to plan the rewrite. The set is a superset (an id is
  tried under every source, membership of sources it never belonged
  to included), bounded by ``|ids| x sources x copies`` shards.
  Without a spec the fallback is a column-pruned scan of
  ``(id_col, __shard)`` only — loudly reported in the return value.
- **dispositions**: rows are slim ``(doc_id, disposition)`` metadata
  partitioned by micro-batch id — there is no pure function from
  doc_id to batch, so the affected-partition scan reads the doc_id
  column only (a semi-join against the broadcast delete set), which is
  orders of magnitude below the corpus it audits.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _hadoop_fs,
    recover_partition_swap,
)
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    swap_partitions as _swap_partitions,
)
from etl_prometheus2clickhouse_spark.operators.sampling import (
    _MODULUS,
    _MULT,
    _MULT2,
)

_META_FILE = "_shards_meta.json"


# ---------------------------------------------------------------- meta


def write_shards_meta(
    spark: SparkSession,
    path: str,
    order_col: str,
    n_shards: int,
    key_spec: "dict | None" = None,
) -> None:
    """Record the shard geometry (and, when given, the mix key spec)
    beside the written shards as ``_shards_meta.json`` — an
    underscore-prefixed file, invisible to parquet readers.

    ``key_spec`` makes takedown scan-free (see module docstring):
    ``{"kind": "mix_corpora", "salt": s, "sources": [{"name": n,
    "rate": r}, ...]}`` or ``{"kind": "mix_epochs", "salt": s,
    "sources": [{"name": n, "epochs": e}, ...]}`` — sources in the
    same ORDER they were passed to the mix (the per-source salt is
    ``salt + position``)."""
    if key_spec is not None:
        kind = key_spec.get("kind")
        if kind not in ("mix_corpora", "mix_epochs"):
            raise ValueError(
                f"key_spec kind must be mix_corpora|mix_epochs, got {kind!r}"
            )
        field = "rate" if kind == "mix_corpora" else "epochs"
        if "salt" not in key_spec or not key_spec.get("sources"):
            raise ValueError("key_spec needs 'salt' and non-empty 'sources'")
        for s in key_spec["sources"]:
            if field not in s:
                raise ValueError(
                    f"key_spec source {s.get('name')!r} missing {field!r}"
                )
    width = -(-_MODULUS // n_shards)
    meta = {
        "order_col": order_col,
        "n_shards": int(n_shards),
        "width": int(width),
        "key_spec": key_spec,
    }
    jvm, fs, _ = _hadoop_fs(spark, path)
    dst = jvm.org.apache.hadoop.fs.Path(os.path.join(path, _META_FILE))
    out = fs.create(dst, True)
    try:
        out.write(json.dumps(meta, sort_keys=True).encode("utf-8"))
    finally:
        out.close()


def read_shards_meta(spark: SparkSession, path: str) -> "dict | None":
    jvm, fs, _ = _hadoop_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, _META_FILE))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


# staged-swap machinery: ONE copy of the crash-recovery state machine
# lives in dedup_index (recover_partition_swap / swap_partitions — the
# components-table protocol generalized over the partition prefix);
# imported at the top and re-exported in __all__ for the
# shards/dispositions callers and their tests.


def _count_or_zero(
    spark: SparkSession, base: str, parts: "list[str]"
) -> int:
    """Row count across partition dirs, 0 when every one was emptied
    (a no-file read cannot infer a schema)."""
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.option("basePath", base)
            .parquet(*[os.path.join(base, p) for p in parts])
            .count()
        )
    except AnalysisException:
        return 0


# ------------------------------------------------------ training shards


def _spec_candidate_shards(
    ids: DataFrame, id_col: str, meta: dict
) -> "list[int]":
    """Affected-shard superset recomputed from the delete ids with the
    mix key spec — the same exact ``decimal(38,0)`` arithmetic as
    :func:`.sampling.mix_corpora` / :func:`.sampling.mix_epochs`, so
    every shard that can hold a copy of a staged id is named without
    reading a byte of the corpus. Distributed (no driver-side id
    collect); the collect is the distinct shard-id set, bounded by
    ``n_shards``."""
    spec = meta["key_spec"]
    width = int(meta["width"])
    salt = int(spec["salt"])
    wide = F.col(id_col).cast("decimal(38,0)")
    parts = []
    for i, src in enumerate(spec["sources"]):
        bucket = (
            (wide * F.lit(_MULT) + F.lit(salt + i)) % F.lit(_MODULUS)
        ).cast("long")
        if spec["kind"] == "mix_corpora":
            rate = float(src["rate"])
            key = (
                (wide * F.lit(_MULT) + F.lit(salt + i + 7919))
                % F.lit(_MODULUS)
            ).cast("long")
            parts.append(
                ids.where(bucket < F.lit(float(rate) * _MODULUS)).select(
                    key.alias("k")
                )
            )
        else:  # mix_epochs
            e = float(src["epochs"])
            whole = int(math.floor(e))
            frac = e - whole
            n_copies = (
                F.lit(whole)
                + F.when(
                    bucket < F.lit(frac) * F.lit(float(_MODULUS)), F.lit(1)
                ).otherwise(F.lit(0))
            ).cast("int")
            key = (
                (
                    wide * F.lit(_MULT)
                    + F.lit(salt + i + 7919)
                    + F.col("copy").cast("decimal(38,0)") * F.lit(_MULT2)
                )
                % F.lit(_MODULUS)
            ).cast("long")
            parts.append(
                ids.select(
                    F.col(id_col),
                    F.when(
                        n_copies >= 1,
                        F.sequence(F.lit(1), n_copies, F.lit(1)),
                    ).alias("__copies"),
                )
                .select(F.col(id_col), F.explode("__copies").alias("copy"))
                .select(key.alias("k"))
            )
    allk = parts[0]
    for p in parts[1:]:
        allk = allk.unionByName(p)
    shard = (F.col("k") / F.lit(width)).cast("int")
    return sorted(
        r.s for r in allk.select(shard.alias("s")).distinct().collect()
    )


def shards_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "doc_id",
) -> dict:
    """Physically remove every copy of the ``ids`` rows from a
    :func:`.sampling.write_training_shards` table, rewriting ONLY the
    affected ``__shard=`` directories (crash-safe staged swap;
    within-shard ``order_col`` sort preserved). With a recorded key
    spec the affected set is computed without reading the corpus
    (module docstring); otherwise a column-pruned ``(id_col, __shard)``
    scan finds it. Idempotent under replay — the takedown
    orchestrator's per-index delete contract."""
    recover_partition_swap(spark, path, "__shard=")
    meta = read_shards_meta(spark, path)
    dele = ids.select(id_col).distinct()
    order_col = meta["order_col"] if meta else "mix_key"
    if meta is not None and meta.get("key_spec"):
        # zero corpus bytes (and zero file listings) to plan the
        # rewrite — the id column check happens on the affected-shard
        # read below
        affected = _spec_candidate_shards(dele, id_col, meta)
        planned_via = "key_spec"
    else:
        table = spark.read.option("basePath", path).parquet(path)
        if id_col not in table.columns:
            raise ValueError(
                f"shards table at {path!r} has no column {id_col!r} — "
                f"columns: {table.columns}"
            )
        affected = sorted(
            r.s
            for r in table.join(F.broadcast(dele), id_col, "semi")
            .select(F.col("__shard").alias("s"))
            .distinct()
            .collect()
        )
        planned_via = "scan"
    jvm, fs, _ = _hadoop_fs(spark, path)
    affected = [
        s
        for s in affected
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(path, f"__shard={s}")
            )
        )
    ]
    if not affected:
        return {
            "deleted_rows": 0,
            "affected_shards": [],
            "planned_via": planned_via,
            "label": label,
        }
    from pyspark.errors import AnalysisException

    try:
        sub = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, f"__shard={s}") for s in affected]
        )
        before = sub.count()
    except AnalysisException:
        # every affected dir was emptied by a previous delete (zero
        # parquet files — nothing left to infer a schema from, and
        # nothing left to delete): the replay/resume contract must
        # still complete
        return {
            "deleted_rows": 0,
            "affected_shards": [int(s) for s in affected],
            "planned_via": planned_via,
            "label": label,
        }
    kept = sub.join(F.broadcast(dele), id_col, "left_anti")

    def _write(staged: str) -> None:
        (
            kept.repartition(len(affected), F.col("__shard"))
            .sortWithinPartitions("__shard", order_col)
            .write.mode("overwrite")
            .partitionBy("__shard")
            .parquet(staged)
        )

    _swap_partitions(spark, path, "__shard", affected, _write)
    after = _count_or_zero(
        spark, path, [f"__shard={s}" for s in affected]
    )
    return {
        "deleted_rows": int(before - after),
        "affected_shards": [int(s) for s in affected],
        "planned_via": planned_via,
        "label": label,
    }


def shards_append(
    spark: SparkSession,
    path: str,
    rows: DataFrame,
    label: str,
) -> dict:
    """Merge a new batch of mixture rows into an existing
    :func:`.sampling.write_training_shards` table — the incremental
    face of the final write step (a curation pipeline publishes
    batches daily; rewriting the whole table per batch is the thing
    this module exists to avoid). The batch's shard ids derive from
    its own ``order_col`` values (``floor(key / width)`` from the
    recorded geometry — no spec lookup needed, the keys are IN the
    frame), so ONLY the receiving ``__shard=`` directories are
    re-merged (read + union + sorted rewrite) through the same
    crash-safe staged swap as :func:`shards_delete`.

    Replay contract: the merge drops exact-duplicate rows, and mix
    rows are unique by construction (``(id, source[, copy])`` is a
    key and every emitted column is a pure function of it), so
    replaying a crashed append under any label converges to the same
    table — idempotent without an append log. Do NOT use this to
    re-deliver intentionally-duplicated rows; epoch replication must
    come through ``mix_epochs``'s ``copy`` column, which
    disambiguates them.

    100 TB shape: work is receiving-shard-bounded — a batch whose
    keys land in B shards reads and rewrites those B directories
    only, never the table."""
    recover_partition_swap(spark, path, "__shard=")
    meta = read_shards_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"shards_append: no _shards_meta.json at {path!r} — the "
            "table predates the recorded geometry; rewrite it once "
            "with write_training_shards"
        )
    order_col, width = meta["order_col"], int(meta["width"])
    if "__shard" in rows.columns:
        raise ValueError("shards_append reserves column '__shard'")
    new = rows.withColumn(
        "__shard", (F.col(order_col) / F.lit(width)).cast("int")
    )
    affected = sorted(
        r.s for r in new.select(
            F.col("__shard").alias("s")
        ).distinct().collect()
    )
    if not affected:
        return {"appended_rows": 0, "affected_shards": [], "label": label}
    jvm, fs, _ = _hadoop_fs(spark, path)
    existing = [
        s
        for s in affected
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(path, f"__shard={s}")
            )
        )
    ]
    from pyspark.errors import AnalysisException

    try:
        old = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, f"__shard={s}") for s in existing]
        ) if existing else None
    except AnalysisException:  # every receiving shard emptied before
        old = None
    before = old.count() if old is not None else 0
    merged = (
        new if old is None
        else old.unionByName(new).dropDuplicates()
    )

    def _write(staged: str) -> None:
        (
            merged.repartition(len(affected), F.col("__shard"))
            .sortWithinPartitions("__shard", order_col)
            .write.mode("overwrite")
            .partitionBy("__shard")
            .parquet(staged)
        )

    _swap_partitions(spark, path, "__shard", affected, _write)
    after = _count_or_zero(
        spark, path, [f"__shard={s}" for s in affected]
    )
    return {
        "appended_rows": int(after - before),
        "affected_shards": [int(s) for s in affected],
        "label": label,
    }


def shards_compact(
    spark: SparkSession, path: str, exclude_labels: "set[str] | None" = None
) -> dict:
    """No-op by design: :func:`shards_delete` is physical at delete
    time (external readers consume raw parquet and cannot anti-join a
    tombstone table), so there is nothing left to reclaim. Present so
    the takedown registry's delete→compact sequence is uniform."""
    recover_partition_swap(spark, path, "__shard=")
    return {"note": "shards deletion is physical at delete time"}


# -------------------------------------------------------- dispositions


def dispositions_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "doc_id",
) -> dict:
    """Physically remove the staged ids' rows from the streaming
    funnel's dispositions table (``mb=``-partitioned
    ``(doc_id, disposition)`` audit rows), rewriting only the batch
    partitions that contain them. The affected-partition scan reads
    the ``doc_id`` column only — dispositions are slim metadata, there
    is no pure function from doc_id to batch id. Idempotent under
    replay.

    Single-writer contract: run against a STOPPED stream (or between
    micro-batches) — the staged swap and a concurrent batch append to
    the same ``mb=`` dir would race."""
    recover_partition_swap(spark, path, "mb=")
    from pyspark.errors import AnalysisException

    dele = ids.select(F.col(id_col).alias("doc_id")).distinct()
    try:
        table = spark.read.option("basePath", path).parquet(path)
    except AnalysisException:
        return {"deleted_rows": 0, "affected_batches": [], "label": label}
    affected = sorted(
        r.b
        for r in table.join(F.broadcast(dele), "doc_id", "semi")
        .select(F.col("mb").alias("b"))
        .distinct()
        .collect()
    )
    if not affected:
        return {"deleted_rows": 0, "affected_batches": [], "label": label}
    sub = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, f"mb={b}") for b in affected]
    )
    before = sub.count()
    kept = sub.join(F.broadcast(dele), "doc_id", "left_anti")

    def _write(staged: str) -> None:
        (
            kept.repartition(len(affected), F.col("mb"))
            .sortWithinPartitions("mb", "doc_id")
            .write.mode("overwrite")
            .partitionBy("mb")
            .parquet(staged)
        )

    _swap_partitions(spark, path, "mb", affected, _write)
    after = _count_or_zero(spark, path, [f"mb={b}" for b in affected])
    return {
        "deleted_rows": int(before - after),
        "affected_batches": [int(b) for b in affected],
        "label": label,
    }


def dispositions_compact(
    spark: SparkSession, path: str, exclude_labels: "set[str] | None" = None
) -> dict:
    """No-op by design (same rationale as :func:`shards_compact`);
    batch-directory folding is the streaming retention module's
    concern, not takedown's."""
    recover_partition_swap(spark, path, "mb=")
    return {"note": "dispositions deletion is physical at delete time"}


__all__ = [
    "dispositions_compact",
    "dispositions_delete",
    "read_shards_meta",
    "recover_partition_swap",
    "shards_append",
    "shards_compact",
    "shards_delete",
    "write_shards_meta",
]
