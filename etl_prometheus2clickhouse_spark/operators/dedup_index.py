"""Incremental near-dup dedup against a PERSISTED MinHash band index.

The one-shot faces in :mod:`operators.dedup` re-read the full corpus
every run. A production crawl pipeline instead receives a new shard
daily and must dedup it against the existing corpus WITHOUT rescanning
100 TB. This module persists the three artifacts that make that
possible — the same build-once / probe-many economics as the PQ code
table (operators/similarity.py ``pq_encode``):

- ``<path>/bands``      — one row per (document, LSH band):
  ``(bb, band, bucket, id)``, PARTITIONED BY ``mb`` (the ingestion
  increment that wrote the rows — ``base`` for the build, the caller's
  label for each update) and ``bb`` (a hash prefix of the band-bucket
  key), so a shard probe prunes file listings down to the partitions
  its own buckets land in before any I/O, and an update OVERWRITES its
  own ``mb=`` directory — replay-idempotent, which is what lets the
  streaming curation face (streaming/curation_stream.py) update the
  index from an at-least-once ``foreachBatch``;
- ``<path>/shingles``   — ``(ip, id, sh)``: each document's distinct
  shingle-hash set, the exact-verify side table (candidates are always
  rescored with exact Jaccard — same soundness contract as
  ``minhash_lsh_pairs``); same ``mb=`` increment layout, PARTITIONED
  inside each increment by ``ip = pmod(xxhash64(id), index_buckets)``
  so the verify read prunes to the candidate ids' prefixes — increment
  cost is shard-proportional on the verify path too, not just the
  band probe;
- ``<path>/components`` — ``(nb, node, component)``: the corpus's
  CURRENT resolved duplicate clusters (min-reachable-id labels over
  all pairs seen so far). Only clustered docs appear — singletons are
  implicit. PARTITIONED by ``nb = pmod(xxhash64(node), index_buckets)``
  — keyed by NODE, not label, because a merge relabels rows but never
  moves them (nodes don't change), so an increment rewrites exactly
  the partitions holding touched clusters' members: the endpoint
  lookup prunes to the (bounded) new-pair endpoints' prefixes, the
  closure recompute runs over touched clusters' edges ∪ new pairs
  only, and untouched partitions are neither read for closure nor
  rewritten. The one non-partition-pruned read is the touched-cluster
  member extraction (a broadcast semi-join on ``component``, which
  row-group statistics skip — rows are written sorted by component);
- ``<path>/meta``       — one row pinning the geometry (shingle n,
  num_hashes, bands, threshold, max_bucket, index_buckets). An
  increment reads its geometry from here and a build can never be
  probed with mismatched parameters (fail-loud, the sketch-geometry
  contract of operators/sketch.py).

``dedup_increment`` then probes ONLY the shard's own buckets:

1. shingle + sign + band the shard (identical expressions — banding is
   the shared :func:`operators.dedup.band_buckets`);
2. read ``bands`` filtered to the shard's ``bb`` prefixes — a
   PARTITION filter (asserted on the plan by scripts/scale_smoke.py),
   so probe I/O scales with the SHARD, not the corpus;
3. candidates = shard×index bucket matches ∪ shard×shard bucket
   matches, capped by COMBINED (index + shard) bucket size;
4. exact-verify candidates against the stored + shard shingle sets;
5. merge: connected components over (stored component edges ∪ new
   verified pairs) — the closure of old closure edges plus new pairs
   equals the closure of all pairs, so the result is EXACTLY the
   one-shot ``resolve_near_duplicates`` of the corpus∪shard union
   (the catalog oracle, green at sf0.001/0.01/0.1);
6. optionally append the shard's band/shingle rows and replace the
   components table, so tomorrow's shard probes today's corpus.

Known, documented divergence from the one-shot under a BINDING
``max_bucket``: the one-shot drops a bucket whose union size exceeds
the cap — including old-old pairs already resolved when the bucket was
smaller. Incremental dedup is monotone: decisions already persisted
are never un-made, so it keeps those pairs. On the reference corpus
the cap never binds (recall-1.0 tuning, see ``q_minhash_lsh``); at a
real 100 TB deployment monotone is the semantics you want anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.localframe import local_df
from etl_prometheus2clickhouse_spark.partitioning import spread
from etl_prometheus2clickhouse_spark.operators.dedup import (
    _minhash_sig_udf,
    _register_cached,
    _with_cached_deps,
    band_buckets,
    dup_components_auto,
    jaccard_distinct,
    shingle_hashes,
)

_META_COLS = [
    "n",
    "num_hashes",
    "bands",
    "threshold",
    "max_bucket",
    "index_buckets",
]


def _bb(bucket_col, index_buckets: int):
    """Partition prefix of a band bucket: a POSITIVE mod of the (already
    uniform) 64-bit bucket hash. Bounded fan-out (``index_buckets``
    directories) with uniform occupancy; a shard's probe set is the
    distinct ``bb`` of its own band rows — at most ``index_buckets``
    literals, pushed as a partition filter."""
    return F.pmod(bucket_col, F.lit(index_buckets)).cast("int")


def _plan_proves_empty(df: DataFrame) -> bool:
    """True iff the OPTIMIZED plan proves ``df`` has zero rows (an
    empty LocalRelation / limit-0 — the ``corpus.limit(0)`` and
    ``createDataFrame([], schema)`` shapes callers pass for
    annotate-only runs). Pure plan inspection: no job runs, and a
    False (including on any inspection failure) only means the general
    path runs — never a semantic change."""
    try:
        mx = df._jdf.queryExecution().optimizedPlan().maxRows()
        return bool(mx.isDefined()) and int(mx.get()) == 0
    except Exception:
        return False


def _ip(id_col, index_buckets: int):
    """Partition prefix of a document id — the ``bb`` discipline applied
    to the VERIFY-side stores: shingle rows land in
    ``ip = pmod(xxhash64(id), index_buckets)`` directories, and a probe
    derives its candidate ids' prefixes (bounded: candidates are
    bucket-capped) and pushes them as a partition filter, so the
    exact-verify read scales with the CANDIDATE SET, not the corpus."""
    return F.pmod(F.xxhash64(id_col), F.lit(index_buckets)).cast("int")


def _write_id_bucketed(df: DataFrame, id_expr, index_buckets: int,
                       dest: str, cols: list[str]) -> None:
    """Write ``df`` partitioned by the id-prefix ``ip`` (clustered on
    the partition key first — the band-table small-files lesson)."""
    df.select(
        _ip(id_expr, index_buckets).alias("ip"), *cols
    ).repartition(F.col("ip")).write.mode("overwrite").partitionBy(
        "ip"
    ).parquet(dest)


def _shingle_sig_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    index_buckets: int,
    spread_input: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(id, sh) shingle table and (bb, band, bucket, id) band table for
    ``docs`` — one corpus scan, shingles persisted because both the
    band derivation and the verify join consume them.

    ``spread_input`` is set only by the corpus-sized BUILD path: a
    single-split corpus scan would otherwise shingle serially.
    Increment shards stay un-spread — they are shard-sized, and the
    downstream bucketed writes re-repartition anyway, so the extra
    exchange is pure fixed cost there (measured 1.2-1.4× on the
    lifecycle faces)."""
    if spread_input:
        docs = spread(docs)
    sh = docs.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), n).alias("sh"),
    ).persist()
    _register_cached(sh)
    return sh, _bands_from_shingles(sh, num_hashes, bands, index_buckets)


def _bands_from_shingles(
    sh: DataFrame, num_hashes: int, bands: int, index_buckets: int
) -> DataFrame:
    """(bb, band, bucket, id) band rows derived from an ``(id, sh)``
    shingle table — signatures are a pure function of the shingle SET,
    which is why a stored index can be re-banded without ever
    re-reading corpus text (:func:`minhash_index_reband`)."""
    rows_per_band = num_hashes // bands
    return (
        sh.withColumn("sig", _minhash_sig_udf(num_hashes, 42)(F.col("sh")))
        .select(
            "id",
            F.explode(
                band_buckets(F.col("sig"), bands, rows_per_band)
            ).alias("b"),
        )
        .select(
            _bb(F.col("b.bucket"), index_buckets).alias("bb"),
            F.col("b.band").alias("band"),
            F.col("b.bucket").alias("bucket"),
            "id",
        )
    )


def minhash_index_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 1000,
    index_buckets: int = 64,
) -> None:
    """Build the persisted index from the initial corpus: band rows
    (partitioned by ``bb``), shingle sets, the corpus's own resolved
    components (via the one-shot candidate → exact-verify → closure
    flow over the band table), and the geometry row."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    spark = corpus.sparkSession
    # a BUILD is a semantic overwrite of the whole index: clear any
    # prior layout first (per-table mode("overwrite") only replaces
    # the directories it writes — stale increment dirs or a previous
    # partition layout at the same path would otherwise survive and
    # conflict at partition discovery)
    _delete_path(spark, path)
    sh, banded = _shingle_sig_bands(
        corpus, id_col, text_col, n, num_hashes, bands, index_buckets,
        spread_input=True,
    )
    banded = banded.persist()
    _register_cached(banded)
    # cluster rows on the partition key before the partitioned write:
    # without it every write task emits one file per bb directory it
    # sees (tasks × index_buckets tiny files — measured 2.7× slower
    # build and a 32× file-count blowup at sf0.1); with it each bb
    # lands in exactly one task → index_buckets files total
    banded.repartition(F.col("bb")).write.mode("overwrite").partitionBy(
        "bb"
    ).parquet(os.path.join(path, "bands", "mb=base"))
    _write_id_bucketed(
        sh, F.col("id"), index_buckets,
        os.path.join(path, "shingles", "mb=base"), ["id", "sh"],
    )

    # corpus-internal pairs → components (same cap + verify semantics
    # as minhash_lsh_pairs, over the just-built band table)
    sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    sized = banded.join(sizes, ["band", "bucket"]).where(
        F.col("bucket_n") <= max_bucket
    )
    a, b = sized.alias("a"), sized.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = _verify_pairs(cand, sh, sh, threshold)
    comp = dup_components_auto(pairs)
    _write_components(comp, os.path.join(path, "components"), index_buckets)
    meta = local_df(
        spark,
        [(n, num_hashes, bands, float(threshold), max_bucket, index_buckets)],
        "n int, num_hashes int, bands int, threshold double, "
        "max_bucket int, index_buckets int",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta")
    )
    _manifest_add(spark, path, ["bands", "shingles"], "base")


def _write_components(
    comp: DataFrame, comp_dir: str, index_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write (node, component) rows partitioned by the NODE prefix and
    sorted by component within each file (so the touched-cluster
    member extraction's ``component IN (...)`` predicate skips row
    groups on footer statistics)."""
    (
        comp.select(
            _ip(F.col("node"), index_buckets).alias("nb"),
            "node",
            "component",
        )
        .repartition(F.col("nb"))
        .sortWithinPartitions("component")
        .write.mode(mode)
        .partitionBy("nb")
        .parquet(comp_dir)
    )


def _read_components(
    spark: SparkSession, comp_dir: str, id_type: str
) -> DataFrame:
    """(nb, node, component) — empty-safe: a corpus with zero duplicate
    pairs writes a partitioned table with no part files at all, which
    Spark cannot infer a schema from. PURE — a reader that ran
    recovery would race an in-flight writer's staged swap; writers
    call :func:`_recover_components` themselves before reading. A
    table MISSING the ``nb`` partition column is a structural error
    and fails loudly — treating it as empty would silently un-make
    every stored dedup decision."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(comp_dir)
    except AnalysisException:
        return spark.createDataFrame(
            [], f"nb int, node {id_type}, component {id_type}"
        )
    missing = {"nb", "node", "component"} - set(df.columns)
    if missing:
        raise ValueError(
            f"components table at {comp_dir!r} is missing columns "
            f"{sorted(missing)}: not this module's nb-partitioned "
            "layout — rebuild the index (or backfill nb = "
            "pmod(xxhash64(node), index_buckets) once)"
        )
    return df.select("nb", "node", "component")


def recover_partition_swap(
    spark: SparkSession, path: str, part_prefix: str
) -> None:
    """Finish (or discard) an interrupted staged partition swap — ONE
    copy of the crash-recovery state machine, shared by the components
    table (``nb=``), the paragraph membership rewrites (``hp=``), and
    the shards/dispositions tables (``__shard=``/``mb=``).

    The writer stages recomputed partitions under a dot-directory
    (invisible to parquet readers), then RENAMES the staged root to a
    ``.commit-*`` marker before any live directory is deleted — so
    every crash window is decidable from the directory state alone: a
    ``.staged-*`` root means the swap never reached the point of no
    return (discard it — the live table is untouched and the work
    replays); a ``.commit-*`` root means the new content is fully
    durable (roll FORWARD: finish the per-partition swap). Both
    recoveries are idempotent."""
    jvm, fs, root = _hadoop_fs(spark, path)
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(".staged-"):
            fs.delete(st.getPath(), True)
        elif name.startswith(".commit-"):
            for part in fs.listStatus(st.getPath()):
                pname = part.getPath().getName()
                if not pname.startswith(part_prefix):
                    continue
                live = jvm.org.apache.hadoop.fs.Path(
                    os.path.join(path, pname)
                )
                if fs.exists(live):
                    fs.delete(live, True)
                if not fs.rename(part.getPath(), live):
                    raise IOError(
                        f"partition swap recovery: rename of {pname} "
                        f"under {path!r} reported failure"
                    )
            fs.delete(st.getPath(), True)


def swap_partitions(
    spark: SparkSession,
    path: str,
    part_col: str,
    affected: "list",
    writer_fn,
) -> None:
    """Crash-safe replacement of the ``part_col=<v>`` directories in
    ``affected``: ``writer_fn(staged_dir)`` writes the new content
    partitioned by ``part_col``; then stage → ``.commit-*`` → per-
    partition delete+rename → drop the marker (the protocol
    :func:`recover_partition_swap` heals). Partitions the writer
    emitted no rows for are staged as explicit empty directories so
    every affected value has a rename source — a delete can empty a
    partition entirely."""
    import uuid

    jvm, fs, _ = _hadoop_fs(spark, path)
    tag = uuid.uuid4().hex[:8]
    staged = os.path.join(path, f".staged-{tag}")
    writer_fn(staged)
    for v in affected:
        p = jvm.org.apache.hadoop.fs.Path(
            os.path.join(staged, f"{part_col}={v}")
        )
        if not fs.exists(p):
            fs.mkdirs(p)
    commit = jvm.org.apache.hadoop.fs.Path(
        os.path.join(path, f".commit-{tag}")
    )
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staged), commit):
        raise IOError(
            f"partition swap: staging rename to {commit} reported "
            f"failure; live table untouched, staged content at "
            f"{staged!r}"
        )
    for v in affected:
        live = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path, f"{part_col}={v}")
        )
        if fs.exists(live):
            fs.delete(live, True)
        src = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path, f".commit-{tag}", f"{part_col}={v}")
        )
        if not fs.rename(src, live):
            raise IOError(
                f"partition swap: rename of {part_col}={v} into place "
                f"reported failure; recovery completes it from "
                f".commit-{tag}"
            )
    fs.delete(commit, True)


def _recover_components(spark: SparkSession, comp_dir: str) -> None:
    """Components-table writer-touch recovery — the shared protocol at
    the ``nb=`` prefix (see :func:`recover_partition_swap`)."""
    recover_partition_swap(spark, comp_dir, "nb=")


def _closure_with_new_pairs(
    comp_tbl: DataFrame, new_pairs: DataFrame, index_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """TOUCHED-CLUSTER closure merge (shared by :func:`dedup_increment`
    and :func:`minhash_index_reband`) — closure(touched clusters'
    closure edges ∪ new pairs) == closure(all pairs) restricted to
    touched ∪ new nodes, because untouched clusters share no node with
    any new pair (their labels cannot change). The components table is
    partitioned by nb = prefix(node):

    1. endpoint-label lookup prunes to the endpoints' nb prefixes
       (bounded: endpoints come from capped candidate pairs);
    2. member extraction is a broadcast semi-join on component
       (row-group-skipped — files are component-sorted);
    3. the closure recompute sees ONLY that subgraph.

    Returns ``(comp_new, touched)``: the recomputed (node, component)
    labels and the touched component ids."""
    ends = (
        new_pairs.select(F.col("id_a").alias("node"))
        .unionByName(new_pairs.select(F.col("id_b").alias("node")))
        .distinct()
        .persist()
    )
    _register_cached(ends)
    end_nbs = [
        r.nb
        for r in ends.select(
            _ip(F.col("node"), index_buckets).alias("nb")
        ).distinct().collect()
    ]
    touched = (
        comp_tbl.where(
            F.col("nb").isin(end_nbs) if end_nbs else F.lit(False)
        )
        .join(ends, "node")
        .select("component")
        .distinct()
    )
    members = (
        comp_tbl.join(F.broadcast(touched), "component")
        .select("node", "component")
        .persist()
    )
    _register_cached(members)
    sub_edges = members.select(
        F.col("node").alias("id_a"), F.col("component").alias("id_b")
    ).unionByName(new_pairs)
    return dup_components_auto(sub_edges), touched


def _rewrite_touched_components(
    spark: SparkSession,
    comp_dir: str,
    comp_tbl: DataFrame,
    comp_new: DataFrame,
    touched: DataFrame,
    index_buckets: int,
    extra_affected: "list[int] | None" = None,
) -> None:
    """Swap ONLY the ``nb=`` partitions holding recomputed rows,
    CRASH-SAFE: (1) stage the new content under a dot-directory
    readers never list; (2) rename it to a ``.commit-*`` marker — the
    atomic point of no return, so the content is fully durable before
    any live directory is deleted; (3) per-partition delete + rename
    into place; (4) drop the marker. A crash in any window is repaired
    by :func:`_recover_components` on the next read (roll back before
    the marker, roll forward after). The previous delete-then-append
    protocol lost the affected partitions' rows irrecoverably on a
    crash between the two."""
    import uuid

    comp_new_nb = comp_new.withColumn(
        "nb", _ip(F.col("node"), index_buckets)
    )
    affected = sorted(
        {r.nb for r in comp_new_nb.select("nb").distinct().collect()}
        # a DELETION can shrink a touched component to nothing in some
        # partition — those partitions receive no comp_new rows but
        # must still be rewritten to drop the old rows; the caller
        # passes their prefixes explicitly
        | set(extra_affected or [])
    )
    if not affected:
        return
    # no pin needed: the staged write below is this frame's ONLY
    # consumer and it completes before any live directory is deleted,
    # so the untouched slice's read of the about-to-be-swapped
    # directories always sees them intact (single-writer contract;
    # _recover_components already healed any prior crash)
    content = (
        comp_tbl.where(F.col("nb").isin(affected))
        .join(F.broadcast(touched), "component", "left_anti")
        .select("nb", "node", "component")
        .unionByName(comp_new_nb.select("nb", "node", "component"))
    )
    jvm, fs, _ = _hadoop_fs(spark, comp_dir)
    tag = uuid.uuid4().hex[:8]
    staged = os.path.join(comp_dir, f".staged-{tag}")
    _write_components(
        content.select("node", "component"), staged, index_buckets
    )
    # a DELETION can empty an affected partition entirely — the
    # parquet write skips it, but the swap (and its crash recovery)
    # must still replace the live directory; stage an explicit empty
    # partition dir so every affected prefix has a rename source
    for x in affected:
        p = jvm.org.apache.hadoop.fs.Path(
            os.path.join(staged, f"nb={x}")
        )
        if not fs.exists(p):
            fs.mkdirs(p)
    commit = jvm.org.apache.hadoop.fs.Path(
        os.path.join(comp_dir, f".commit-{tag}")
    )
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staged), commit):
        raise IOError(
            f"components swap: staging rename to {commit} reported "
            "failure; live table untouched, staged content at "
            f"{staged!r}"
        )
    for x in affected:
        live = jvm.org.apache.hadoop.fs.Path(
            os.path.join(comp_dir, f"nb={x}")
        )
        if fs.exists(live):
            fs.delete(live, True)
        src = jvm.org.apache.hadoop.fs.Path(
            os.path.join(comp_dir, f".commit-{tag}", f"nb={x}")
        )
        if not fs.rename(src, live):
            raise IOError(
                f"components swap: rename of nb={x} into place "
                f"reported failure; recovery completes it from "
                f".commit-{tag}"
            )
    fs.delete(commit, True)


def _delete_path(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API — works for
    any filesystem the session can write (local, HDFS, object
    stores), unlike a driver-local shutil."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(
        spark._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
    )
    fs.delete(hpath, True)


def _read_meta(spark: SparkSession, path: str) -> dict:
    # a re-banded index's meta is manifest-tracked (geometry and band
    # table must swap in ONE commit); a built index's meta is the
    # original plain directory
    m = _read_manifest(spark, path)
    if m is not None and "meta" in m["tables"]:
        rows = _read_increment_table(spark, path, "meta").collect()
    else:
        rows = spark.read.parquet(os.path.join(path, "meta")).collect()
    if len(rows) != 1:
        raise ValueError(
            f"minhash index at {path!r} has a corrupt meta table "
            f"({len(rows)} rows, expected 1)"
        )
    return {k: rows[0][k] for k in _META_COLS}


def _verify_pairs(
    cand: DataFrame, sh_a: DataFrame, sh_b: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard rescore of candidate (id_a, id_b) pairs against
    two shingle tables (id_a looked up in ``sh_a`` ∪ ``sh_b`` — the
    union, because a new-new pair has both sides in the shard while a
    new-old pair straddles the stores). The two stores must be
    id-disjoint (callers guarantee it: the build passes ONE table, the
    increment excludes its own replayed ``mb=`` rows) — a duplicated
    id would multiply each pair's verify join 2×2 and feed duplicate
    edges to the closure."""
    both = sh_a if sh_b is sh_a else sh_a.unionByName(sh_b)
    v = cand.join(
        both.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
        "id_a",
    ).join(
        both.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
        "id_b",
    )
    return v.select(
        "id_a",
        "id_b",
        jaccard_distinct(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
    ).where(F.col("jaccard_sim") >= threshold)


def dedup_increment(
    corpus: DataFrame,
    shard: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    update_index: bool = False,
    update_label: str | None = None,
) -> DataFrame:
    """Dedup a NEW shard against the persisted index without touching
    the old corpus text: probe → cap → exact-verify → merge closures.

    ``corpus`` is used ONLY for the output annotation (its rows carry
    no shingling/banding/verify work — the scale contract); ``shard``
    must carry ``text_col``. Output: every corpus∪shard row (their
    common columns) + ``component_id`` + ``is_canonical`` — exactly
    ``resolve_near_duplicates`` of the union. Pass an EMPTY ``corpus``
    to annotate only the shard (the streaming per-batch shape).

    ``update_index=True`` writes the shard's band + shingle rows into
    the increment directories ``mb=<update_label>`` (OVERWRITE — a
    replayed increment with the same label is idempotent, never a
    duplicate append) and replaces the components table (recomputed
    from the full closure, also idempotent), so the NEXT shard probes
    an index that already knows this one (pinned by a three-wave
    pytest and a replay pytest).

    EVALUATION CONTRACT (``update_index=True``): the returned frame's
    plan pins the POST-rewrite components files; the next update
    increment's partition swap deletes them. Materialize the result
    (action, write, or ``localCheckpoint`` — the streaming body does
    the latter) BEFORE running another update increment against the
    same index, or the stale plan fails loudly with
    ``FileNotFoundException``."""
    if update_index:
        if not update_label or any(c in update_label for c in "/=%"):
            raise ValueError(
                "dedup_increment: update_index=True needs a filesystem-"
                f"safe update_label, got {update_label!r}"
            )
        if update_label == "base":
            raise ValueError(
                "dedup_increment: update_label 'base' is reserved for "
                "the build increment"
            )
    spark = shard.sparkSession
    if not update_index and _plan_proves_empty(shard):
        # ANNOTATE-ONLY fast path for a provably-empty shard (the
        # dedup_delete / funnel verification shape — corpus annotated
        # against the stored components): an empty shard generates no
        # probes, no candidates and no pairs, so the general path's
        # guard/probe/verify actions are all no-op jobs that still pay
        # full planning + scheduling fixed cost (~0.1-1 s each).
        # comp_new is None by construction, so the output below equals
        # the general path's exactly.
        comp_dir = os.path.join(path, "components")
        id_type = shard.schema[id_col].dataType.simpleString()
        _recover_components(spark, comp_dir)
        comp = _read_components(spark, comp_dir, id_type).select(
            "node", "component"
        )
        common = [c for c in corpus.columns if c in set(shard.columns)]
        union_docs = corpus.select(*common).unionByName(
            shard.select(*common)
        )
        comp_keyed = comp.withColumnRenamed("node", id_col)
        return (
            union_docs.join(comp_keyed, id_col, "left")
            .withColumn(
                "component_id",
                F.coalesce(F.col("component"), F.col(id_col)),
            )
            .drop("component")
            .withColumn(
                "is_canonical", F.col(id_col) == F.col("component_id")
            )
        )
    meta = _read_meta(spark, path)
    n, num_hashes, bands = meta["n"], meta["num_hashes"], meta["bands"]
    threshold, max_bucket = meta["threshold"], meta["max_bucket"]
    index_buckets = meta["index_buckets"]
    tomb = _read_tombstones(spark, path, None)

    sh_new, banded_new = _shingle_sig_bands(
        shard, id_col, text_col, n, num_hashes, bands, index_buckets
    )
    banded_new = banded_new.persist()
    _register_cached(banded_new)

    # ONE combined collect feeds both driver-side prune lists — the
    # shard's band partition prefixes (the probe set, pushed down as a
    # PARTITION filter on the bands read) and, for an update, its id
    # prefixes (the overlap guard's shingle prune). Driver actions in
    # this protocol carry ~0.1-1 s of planning/scheduling fixed cost
    # each (measured), so the two lists share a single job, which also
    # materializes the sh_new/banded_new caches exactly once.
    tagged = banded_new.select(F.col("bb").alias("v"), F.lit(0).alias("t"))
    if update_index:
        tagged = tagged.unionByName(
            sh_new.select(
                _ip(F.col("id"), index_buckets).alias("v"),
                F.lit(1).alias("t"),
            )
        )
    _pg = tagged.distinct().collect()
    probe_bbs = [r.v for r in _pg if r.t == 0]
    guard_ips = [r.v for r in _pg if r.t == 1]

    if update_index:
        # id-overlap detection before anything is written: the shingle
        # table IS the identity store (every indexed doc has rows
        # there, ip=-bucketed) and an overlapping update would break
        # _verify_pairs' id-disjoint union (2×2 join fanout, duplicate
        # closure edges). Pruned to the shard's own ip= buckets; the
        # increment's own replayed label is excluded. Legacy FLAT
        # shingle stores (no ip column) keep their original
        # no-detection semantics until compacted/rebuilt.
        sh_guard = _read_increment_table(spark, path, "shingles")
        if "ip" in sh_guard.columns and guard_ips:
            stored_ids = (
                sh_guard.where(F.col("mb") != F.lit(update_label))
                .where(F.col("ip").isin(guard_ips))
                .select("id")
            )
            _ids_overlap_guard(
                spark, path,
                sh_new.select("id").distinct(), stored_ids,
                "dedup_increment",
            )
    bands_tbl = _anti_tombstones(
        # deleted docs' band rows must not generate candidates — the
        # one-shot on the reduced corpus never sees them
        _read_increment_table(spark, path, "bands"), tomb, "id",
    )
    if update_index:
        # at-least-once replay: a failed first attempt may already have
        # written this increment's own mb= rows — probing them would
        # double-count the shard in the combined bucket-size cap (a
        # bucket near max_bucket could be dropped ONLY on replay)
        bands_tbl = bands_tbl.where(F.col("mb") != F.lit(update_label))
    probed = bands_tbl.where(F.col("bb").isin(probe_bbs)).persist()
    _register_cached(probed)

    # combined (index + shard) bucket sizes — the cap sees the bucket
    # as the one-shot over the union would (for buckets the shard
    # touches; untouched buckets generate no new pairs)
    sizes = (
        probed.select("band", "bucket")
        .unionByName(banded_new.select("band", "bucket"))
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .where(F.col("bucket_n") <= max_bucket)
    )
    old_ok = probed.join(sizes, ["band", "bucket"]).select(
        "band", "bucket", "id"
    )
    new_ok = banded_new.join(sizes, ["band", "bucket"]).select(
        "band", "bucket", "id"
    )

    # new-old candidates (orientation: lower id first, matching the
    # one-shot's a.id < b.id over the union) + new-new candidates
    cross = (
        new_ok.alias("s")
        .join(
            old_ok.alias("o"),
            (F.col("s.band") == F.col("o.band"))
            & (F.col("s.bucket") == F.col("o.bucket"))
            & (F.col("s.id") != F.col("o.id")),
        )
        .select(
            F.least("s.id", "o.id").alias("id_a"),
            F.greatest("s.id", "o.id").alias("id_b"),
        )
    )
    s_a, s_b = new_ok.alias("a"), new_ok.alias("b")
    inner = (
        s_a.join(
            s_b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cand = (
        cross.unionByName(inner)
        .dropDuplicates(["id_a", "id_b"])
        .persist()
    )
    _register_cached(cand)

    # the exact-verify read is pruned to the CANDIDATES' id-prefix
    # partitions: candidates are bucket-capped (bounded), so their
    # distinct prefixes are at most index_buckets literals — pushed as
    # a partition filter exactly like the bands probe, making increment
    # cost shard-proportional on the verify path too
    cand_ips = [
        r.ip
        for r in cand.select(_ip(F.col("id_a"), index_buckets).alias("ip"))
        .unionByName(
            cand.select(_ip(F.col("id_b"), index_buckets).alias("ip"))
        )
        .distinct()
        .collect()
    ]
    sh_old = _anti_tombstones(
        _read_increment_table(spark, path, "shingles"), tomb, "id"
    )
    shingles_bucketed = "ip" in sh_old.columns
    if update_index:
        # same replay exclusion as the bands probe: keeps the verify
        # union id-disjoint (the _verify_pairs contract) on replay
        sh_old = sh_old.where(F.col("mb") != F.lit(update_label))
    if shingles_bucketed:
        sh_old = sh_old.where(
            F.col("ip").isin(cand_ips) if cand_ips else F.lit(False)
        )
    elif cand_ips:
        # pre-ip-bucketed shingle layout: no partition filter possible
        # — the verify reads the whole store, exactly that layout's
        # original behavior (minhash_index_compact upgrades the store
        # to the bucketed layout and the pruned read comes back)
        pass
    else:
        sh_old = sh_old.where(F.lit(False))
    sh_old = sh_old.select("id", "sh")
    new_pairs = (
        _verify_pairs(cand, sh_old, sh_new, threshold)
        .select("id_a", "id_b")
        .persist()
    )
    _register_cached(new_pairs)

    # TOUCHED-CLUSTER closure merge (shared helper — see
    # _closure_with_new_pairs for the bounded-work argument); the
    # rewrite below touches ONLY the partitions holding recomputed
    # rows — untouched partitions are never read or written.
    comp_dir = os.path.join(path, "components")
    id_type = shard.schema[id_col].dataType.simpleString()
    _recover_components(spark, comp_dir)  # writer touch: heal a crashed swap first
    comp_tbl = _read_components(spark, comp_dir, id_type)
    # ZERO-NEW-PAIR fast path: a shard that verifies no duplicate pair
    # cannot touch any cluster — skip the closure recompute AND the
    # components partition swap entirely (the common case for a clean
    # daily shard; checked on the PERSISTED pair frame, so the verify
    # job runs exactly once either way)
    if new_pairs.isEmpty():
        comp_new = touched = None
    else:
        # eager either route (driver union-find or checkpointed
        # rounds); bounded by the touched subgraph, not the corpus
        comp_new, touched = _closure_with_new_pairs(
            comp_tbl, new_pairs, index_buckets
        )

    if update_index:
        # band and shingle rows OVERWRITE this increment's own mb=
        # directory (never a bare append); the components rewrite
        # recomputes the same touched labels on replay (the merged
        # cluster IS the touched set the second time) — all writes
        # are idempotent under foreachBatch's at-least-once replay
        banded_new.repartition(F.col("bb")).write.mode(
            "overwrite"
        ).partitionBy("bb").parquet(
            os.path.join(path, "bands", f"mb={update_label}")
        )
        if shingles_bucketed:
            _write_id_bucketed(
                sh_new, F.col("id"), index_buckets,
                os.path.join(path, "shingles", f"mb={update_label}"),
                ["id", "sh"],
            )
        else:
            # match the store's existing FLAT depth: mixing ip=
            # directories into a pre-bucketed table root wedges
            # Spark's partition discovery ('conflicting partition
            # column names') — a legacy store stays flat (whole-store
            # verify reads) until rebuilt
            sh_new.select("id", "sh").write.mode("overwrite").parquet(
                os.path.join(path, "shingles", f"mb={update_label}")
            )
        # data dirs land first, the manifest commit makes them live —
        # a crash between the two leaves invisible (replay-overwritten)
        # directories, never a half-registered increment
        _manifest_add(spark, path, ["bands", "shingles"], update_label)
        if comp_new is None:
            # no new pairs → the components table is already correct;
            # the read predates the (skipped) rewrite, so the plan
            # pins files nothing will delete this increment
            comp = comp_tbl.select("node", "component")
        else:
            _rewrite_touched_components(
                spark, comp_dir, comp_tbl, comp_new, touched,
                index_buckets,
            )
            # annotation reads the POST-rewrite table — consistent
            # with what the next increment will probe. NOTE the
            # evaluation contract: this read is LAZY, so evaluate (or
            # localCheckpoint, as the streaming body does) the
            # returned frame BEFORE running another update increment
            # against the same index — a later increment's partition
            # swap replaces the files this plan points at, which
            # fails loudly (FileNotFoundException) under default
            # configs.
            comp = _read_components(spark, comp_dir, id_type).select(
                "node", "component"
            )
    elif comp_new is None:
        comp = comp_tbl.select("node", "component")
    else:
        untouched = comp_tbl.join(
            F.broadcast(touched), "component", "left_anti"
        ).select("node", "component")
        comp = comp_new.unionByName(untouched)

    common = [c for c in corpus.columns if c in set(shard.columns)]
    union_docs = corpus.select(*common).unionByName(shard.select(*common))
    comp_keyed = comp.withColumnRenamed("node", id_col)
    out = (
        union_docs.join(comp_keyed, id_col, "left")
        .withColumn(
            "component_id", F.coalesce(F.col("component"), F.col(id_col))
        )
        .drop("component")
        .withColumn("is_canonical", F.col(id_col) == F.col("component_id"))
    )
    return _with_cached_deps(out, [sh_new, banded_new, probed])


def minhash_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "doc_id",
) -> dict:
    """Tombstone documents out of the band index — the takedown
    lifecycle event, and the one delete in the layer that must REPAIR
    state rather than just mask rows: removing a node can change its
    cluster's labels (the deleted doc may have been the canonical
    min-id) or SPLIT the cluster (it may have been the only bridge), so
    the touched components are re-clustered from scratch on the
    REDUCED member set:

    1. resolve the delete set against the ``ip=``-pruned shingle store
       (absent ids ignored; prior tombstones not re-counted);
    2. commit tombstones — every future probe's band/shingle reads
       anti-join them immediately (bytes reclaimed at compaction);
    3. recompute the touched components: surviving members' band rows
       are re-derived from their STORED shingles (purity — no corpus
       text), bucket-capped against the reduced GLOBAL bucket sizes,
       exact-verified, and re-closed; the partition swap drops deleted
       nodes and relabels/splits survivors — EXACTLY the one-shot
       clustering of the reduced corpus restricted to those components.

    The touched set covers CAP RELEASE too: a bucket over
    ``max_bucket`` only because of deleted members falls under the cap
    on the reduced corpus, newly admitting pairs among docs outside the
    deleted docs' own components — every component holding a member of
    such a released bucket is re-clustered as well (detected from the
    deleted docs' own band buckets, delete-set-proportional reads).

    Work is bounded by the touched clusters (pruned shingle/band reads
    + cluster-sized pair verify), never the corpus. Crash between the
    tombstone commit and the swap is repaired by REPLAYING the delete
    (fully idempotent — a replay after a completed swap finds no
    touched components and no-ops). Returns ``{deleted_docs,
    touched_components, new_pairs}``."""
    if not label or any(c in label for c in "/=%"):
        raise ValueError(
            "minhash_index_delete needs a filesystem-safe label, "
            f"got {label!r}"
        )
    meta = _read_meta(spark, path)
    num_hashes, bands_n = meta["num_hashes"], meta["bands"]
    threshold, max_bucket = meta["threshold"], meta["max_bucket"]
    index_buckets = meta["index_buckets"]
    sh_tbl = _read_increment_table(spark, path, "shingles")
    if "ip" not in sh_tbl.columns:
        raise ValueError(
            f"minhash_index_delete: the index at {path!r} has a legacy "
            "flat shingle store — run minhash_index_compact once (it "
            "upgrades the layout) to enable deletes"
        )
    want = ids.select(F.col(id_col).alias("id")).distinct()
    want_ips = [
        r.ip
        for r in want.select(
            _ip(F.col("id"), index_buckets).alias("ip")
        ).distinct().collect()
    ]
    present = (
        sh_tbl.where(
            F.col("ip").isin(want_ips) if want_ips else F.lit(False)
        )
        .select("id")
        .join(want, "id", "leftsemi")
        .distinct()
    )
    # prior tombstones only — a replayed delete must not see its own
    # first attempt's rows as already deleted
    tomb_prior = None
    m = _read_manifest(spark, path)
    if m is not None and m["tables"].get(_TOMB_TABLE):
        prior = [
            d for d in m["tables"][_TOMB_TABLE] if d != f"mb={label}"
        ]
        if prior:
            root = os.path.join(path, _TOMB_TABLE)
            tomb_prior = spark.read.option("basePath", root).parquet(
                *[os.path.join(root, d) for d in prior]
            ).select("id")
    effective = _anti_tombstones(present, tomb_prior, "id").persist()
    _register_cached(effective)
    n_deleted = effective.count()

    # tombstones go live FIRST: from this commit on, every probe's
    # band/shingle reads exclude the deleted docs; the component
    # repair below is replay-idempotent if a crash lands between
    _tomb_write(
        spark, path, effective.select(_id_str("id").alias("id")),
        label, index_buckets,
    )
    _manifest_add(spark, path, [_TOMB_TABLE], label)

    comp_dir = os.path.join(path, "components")
    id_type = ids.schema[id_col].dataType.simpleString()
    _recover_components(spark, comp_dir)
    comp_tbl = _read_components(spark, comp_dir, id_type)
    dele_nodes = effective.withColumnRenamed("id", "node")
    # the components prune reuses want_ips: effective ⊆ want, so
    # want's prefixes are a SUPERSET prune (the dele_nodes join below
    # filters exactly) — one driver collect instead of two
    del_nbs = want_ips
    touched_del = (
        comp_tbl.where(
            F.col("nb").isin(del_nbs) if del_nbs else F.lit(False)
        )
        .join(dele_nodes, "node")
        .select("component")
        .distinct()
    )
    # cap-release detection: a bucket that was over max_bucket ONLY
    # because of deleted members falls under the cap on the reduced
    # corpus — admitting candidate pairs among docs entirely OUTSIDE
    # the deleted docs' own components. Every component holding a
    # member of such a RELEASED bucket joins the touched set, so the
    # re-cluster below re-examines those pairs exactly as the one-shot
    # on the reduced corpus admits them. All reads are pruned to the
    # deleted docs' own band buckets — delete-set-proportional work.
    del_sh = (
        sh_tbl.where(
            F.col("ip").isin(want_ips) if want_ips else F.lit(False)
        )
        .select("id", "sh")
        .join(effective, "id", "leftsemi")
    )
    del_bands = _bands_from_shingles(
        del_sh, num_hashes, bands_n, index_buckets
    )
    del_bbs = [
        r.bb for r in del_bands.select("bb").distinct().collect()
    ]
    released_comps = touched_del.limit(0)
    rel_members = dele_nodes.limit(0)
    if del_bbs:
        pruned = _anti_tombstones(
            _read_increment_table(spark, path, "bands").where(
                F.col("bb").isin(del_bbs)
            ),
            tomb_prior,
            "id",
        )
        marked = pruned.join(
            effective.withColumnRenamed("id", "__del_id"),
            F.col("id") == F.col("__del_id"),
            "left",
        )
        released = (
            marked.groupBy("band", "bucket")
            .agg(
                F.count(F.lit(1)).alias("pre_n"),
                F.sum(
                    F.when(F.col("__del_id").isNotNull(), 1).otherwise(0)
                ).alias("del_n"),
            )
            .where(
                (F.col("pre_n") > max_bucket)
                & (F.col("pre_n") - F.col("del_n") <= max_bucket)
            )
            .select("band", "bucket")
        )
        rel_members = (
            pruned.join(released, ["band", "bucket"])
            .join(dele_nodes, pruned["id"] == dele_nodes["node"],
                  "left_anti")
            .select(F.col("id").alias("node"))
            .distinct()
            .persist()
        )
        _register_cached(rel_members)
        rel_nbs = [
            r.nb
            for r in rel_members.select(
                _ip(F.col("node"), index_buckets).alias("nb")
            ).distinct().collect()
        ]
        if rel_nbs:
            released_comps = (
                comp_tbl.where(F.col("nb").isin(rel_nbs))
                .join(rel_members, "node")
                .select("component")
                .distinct()
            )
    touched = touched_del.unionByName(released_comps).distinct().persist()
    _register_cached(touched)
    members_all = comp_tbl.join(F.broadcast(touched), "component").persist()
    _register_cached(members_all)
    # released-bucket members may be SINGLETONS (no component rows at
    # all — exactly how the cap suppressed their pairs); they join the
    # survivor set directly so the re-cluster ranges over them too
    member_nodes = (
        members_all.select("node").unionByName(rel_members).distinct()
    )
    survivors = member_nodes.join(dele_nodes, "node", "left_anti").select(
        F.col("node").alias("id")
    )
    # ONE combined collect for the four driver-side facts this repair
    # needs (touched-component count, released-member count, survivor
    # id prefixes, touched-member nb prefixes) — each separate action
    # costs ~0.1-1 s of planning/scheduling fixed cost, and all four
    # frames are delete-set-bounded by construction
    _facts = (
        touched.select(
            F.lit("t").alias("t"), F.lit(None).cast("string").alias("v")
        )
        .unionByName(rel_members.select(
            F.lit("r").alias("t"), F.lit(None).cast("string").alias("v")
        ))
        .unionByName(survivors.select(
            F.lit("i").alias("t"),
            _ip(F.col("id"), index_buckets).cast("string").alias("v"),
        ).distinct())
        .unionByName(members_all.select(
            F.lit("n").alias("t"), F.col("nb").cast("string").alias("v")
        ).distinct())
        .collect()
    )
    n_touched = sum(1 for r in _facts if r.t == "t")
    n_released = sum(1 for r in _facts if r.t == "r")
    if n_touched == 0 and n_released == 0:
        return {
            "deleted_docs": int(n_deleted),
            "touched_components": 0,
            "released_members": 0,
            "new_pairs": 0,
        }
    # re-cluster the survivors exactly as the one-shot on the reduced
    # corpus would see them: band rows from STORED shingles, the
    # bucket cap against reduced GLOBAL sizes, exact-verify, closure
    mem_ips = [int(r.v) for r in _facts if r.t == "i"]
    extra_nbs = [int(r.v) for r in _facts if r.t == "n"]
    mem_sh = (
        sh_tbl.where(
            F.col("ip").isin(mem_ips) if mem_ips else F.lit(False)
        )
        .select("id", "sh")
        .join(survivors, "id", "leftsemi")
        .persist()
    )
    _register_cached(mem_sh)
    mem_bands = _bands_from_shingles(
        mem_sh, num_hashes, bands_n, index_buckets
    ).persist()
    _register_cached(mem_bands)
    probe_bbs = [
        r.bb for r in mem_bands.select("bb").distinct().collect()
    ]
    global_bands = (
        _read_increment_table(spark, path, "bands")
        .where(F.col("bb").isin(probe_bbs) if probe_bbs else F.lit(False))
    )
    global_bands = _anti_tombstones(global_bands, tomb_prior, "id")
    global_bands = global_bands.join(
        effective.withColumnRenamed("id", "__del_id"),
        F.col("id") == F.col("__del_id"),
        "left_anti",
    )
    sizes = global_bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_n")
    ).where(F.col("bucket_n") <= max_bucket)
    ok = mem_bands.join(sizes, ["band", "bucket"]).select(
        "band", "bucket", "id"
    )
    a, b = ok.alias("a"), ok.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # persisted: the closure's driver collect AND the n_pairs count
    # both consume the verified pairs — without the cache the exact
    # verify join (the repair's one heavy stage) would run twice
    pairs = _verify_pairs(cand, mem_sh, mem_sh, threshold).select(
        "id_a", "id_b"
    ).persist()
    _register_cached(pairs)
    comp_new = dup_components_auto(pairs)
    n_pairs = pairs.count()
    _rewrite_touched_components(
        spark, comp_dir, comp_tbl, comp_new, touched, index_buckets,
        extra_affected=extra_nbs,
    )
    return {
        "deleted_docs": int(n_deleted),
        "touched_components": int(n_touched),
        "released_members": int(n_released),
        "new_pairs": int(n_pairs),
    }


def index_stats(spark: SparkSession, path: str) -> dict:
    """Operational sizes of a persisted index — what a daily pipeline
    logs after each ``update_index`` append."""
    out = dict(_read_meta(spark, path))
    for tbl in ("bands", "shingles"):
        out[f"{tbl}_rows"] = _read_increment_table(
            spark, path, tbl
        ).count()
    out["components_rows"] = _read_components(
        spark, os.path.join(path, "components"), "long"
    ).count()
    return out


def probed_partition_plan(
    spark: SparkSession, table_path: str, partition_col: str,
    values: list[int],
) -> str:
    """Formatted physical plan of a partition-filtered table read — the
    generic partition-pruning witness (bands ``bb``, shingles ``ip``,
    ANN vectors ``vp``) for pytest and scripts/scale_smoke.py."""
    df = spark.read.parquet(table_path).where(
        F.col(partition_col).isin(values)
    )
    return df._jdf.queryExecution().explainString(  # type: ignore[attr-defined]
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def probed_bands_plan(
    spark: SparkSession, path: str, probe_bbs: list[int]
) -> str:
    """Formatted physical plan of a probe-filtered bands read — the
    partition-pruning witness hook for scripts/scale_smoke.py (the
    IVFPQ probe-set discipline)."""
    return probed_partition_plan(
        spark, os.path.join(path, "bands"), "bb", probe_bbs
    )


def probe_economics(
    spark: SparkSession, table_path: str, partition_col: str,
    values: list[int],
) -> dict:
    """Timing-independent probe-cost witness: file and byte counts of
    the probed ``<partition_col>=<v>`` directories vs the whole table,
    from a filesystem listing (the z-order witness's skipped/total
    shape, at directory granularity). A partition-pruned probe's I/O
    upper bound IS ``files_probed``/``bytes_probed`` — assertable
    without racing the scheduler."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(conf)
    probed = {f"{partition_col}={v}" for v in values}
    out = {"files_probed": 0, "files_total": 0,
           "bytes_probed": 0, "bytes_total": 0}
    qualified_root = fs.makeQualified(root).toString().rstrip("/") + "/"
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        # skip files under ANY hidden/meta directory component BELOW
        # the table root — part files inside leftover staging dirs
        # (.staged-*/.commit-*/.compact-*) after a crashed swap must
        # not skew the witness (components above the root, e.g. a
        # dotted tmp dir, are the caller's business)
        rel = p[len(qualified_root):] if p.startswith(qualified_root) else p
        if not st.isFile() or any(
            seg.startswith(("_", ".")) for seg in rel.split("/") if seg
        ):
            continue
        out["files_total"] += 1
        out["bytes_total"] += st.getLen()
        if any(f"/{d}/" in f"/{rel}" for d in probed):
            out["files_probed"] += 1
            out["bytes_probed"] += st.getLen()
    return out


__all__ = [
    "minhash_index_build",
    "dedup_increment",
    "minhash_index_delete",
    "index_stats",
    "probed_bands_plan",
    "probed_partition_plan",
    "probe_economics",
]


# ---------------------------------------------------------------------------
# incremental EXACT-SUBSTRING dedup (Lee et al. ACL'22, windowed form)
# ---------------------------------------------------------------------------

_SUB_META_COLS = ["min_len", "index_buckets"]


def substring_index_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    index_buckets: int = 64,
) -> None:
    """Persist the corpus's rolling-window position table —
    ``(hp, h, id, pos)``, PARTITIONED by the ingestion increment and
    ``hp`` (a hash prefix of the 64-bit window hash) — the
    exact-substring sibling of the MinHash band index. A shard probe
    needs only the ``h`` column of the index (column pruning; the
    window text never persists), and ``hp`` pruning helps exactly when
    the shard is small (window hashes are uniform, so a large shard
    touches every prefix — documented, not hidden)."""
    spark = corpus.sparkSession
    _delete_path(spark, path)
    win = _window_positions(
        corpus, id_col, text_col, min_len, spread_input=True
    )
    win.select(
        F.pmod(F.col("h"), F.lit(index_buckets)).cast("int").alias("hp"),
        "h",
        "id",
        "pos",
    ).repartition(F.col("hp")).write.mode("overwrite").partitionBy(
        "hp"
    ).parquet(os.path.join(path, "windows", "mb=base"))
    local_df(
        spark, [(min_len, index_buckets)], "min_len int, index_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta")
    )
    # identity layer: window rows carry ids but are hash-partitioned,
    # so the append-overlap guard needs its own ip=-bucketed id table
    _ids_write(
        corpus.select(_id_str(id_col).alias("id")).distinct(),
        path, "base", index_buckets,
    )
    _ids_init(spark, path, index_buckets)
    _manifest_add(spark, path, ["windows", "ids", "idmeta"], "base")


def _window_positions(
    docs: DataFrame, id_col: str, text_col: str, min_len: int,
    spread_input: bool = False,
) -> DataFrame:
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        _positional_shingle_hashes,
        _ws_tokens,
    )

    # spread only the corpus-sized build input; increment shards pay
    # the exchange without the parallelism win (see _shingle_sig_bands)
    if spread_input:
        docs = spread(docs)
    base = docs.select(
        F.col(id_col).alias("id"), _ws_tokens(F.col(text_col)).alias("toks")
    )
    return base.select(
        "id",
        F.posexplode(
            _positional_shingle_hashes(F.col("toks"), min_len)
        ).alias("pos", "h"),
    )


def _read_sub_meta(spark: SparkSession, path: str) -> dict:
    rows = spark.read.parquet(os.path.join(path, "meta")).collect()
    if len(rows) != 1:
        raise ValueError(
            f"substring index at {path!r} has a corrupt meta table "
            f"({len(rows)} rows, expected 1)"
        )
    return {k: rows[0][k] for k in _SUB_META_COLS}


def substring_increment(
    shard: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    update_index: bool = False,
    update_label: str | None = None,
) -> DataFrame:
    """Duplicated-span detection for a NEW shard against the persisted
    window index, without re-hashing the corpus: a shard window is
    duplicated iff its hash EXISTS in the index or repeats WITHIN the
    shard — which equals the one-shot union rule exactly
    (count_union ≥ 2 ⇔ count_corpus ≥ 1 ∨ count_shard ≥ 2), so unlike
    the near-dup closure there is NO topology caveat: the output is
    the one-shot ``exact_substring_spans`` of corpus∪shard RESTRICTED
    to shard documents, verified by the catalog oracle at all SFs.

    ``update_index=True`` lands the shard's window rows in their own
    overwrite-idempotent ``mb=`` increment. Output schema matches
    ``exact_substring_spans``."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        merge_hit_spans,
    )

    if update_index:
        if not update_label or any(c in update_label for c in "/=%"):
            raise ValueError(
                "substring_increment: update_index=True needs a "
                f"filesystem-safe update_label, got {update_label!r}"
            )
        if update_label == "base":
            raise ValueError(
                "substring_increment: update_label 'base' is reserved "
                "for the build increment"
            )
    spark = shard.sparkSession
    meta = _read_sub_meta(spark, path)
    min_len, index_buckets = meta["min_len"], meta["index_buckets"]

    new_ids = None
    id_buckets = None
    if update_index:
        # id-overlap detection before anything is written: a
        # re-ingested doc's windows would all hit the index and mark
        # the whole doc duplicated-against-itself. Pruned identity
        # probe; own-label excluded (replays legal); indexes built
        # before the identity layer keep their original semantics.
        id_buckets = _ids_buckets(spark, path, None)
        if id_buckets is not None:
            # cached: the combined collect below materializes it; the
            # guard join AND the identity write reuse it — one shard
            # id scan for the whole identity machinery
            new_ids = shard.select(
                _id_str(id_col).alias("id")
            ).distinct().persist()
            _register_cached(new_ids)

    win = _window_positions(shard, id_col, text_col, min_len).persist()
    _register_cached(win)

    # ONE combined collect feeds both driver-side prune lists — the
    # shard's window-hash prefixes (the probe set) and, for an
    # identity-tracked update, its id bucket prefixes (the overlap
    # guard's prune): each separate driver action carries ~0.1-1 s of
    # planning/scheduling fixed cost (measured on the minhash faces)
    tagged = win.select(
        F.pmod(F.col("h"), F.lit(index_buckets)).cast("int").alias("v"),
        F.lit(0).alias("t"),
    )
    if new_ids is not None:
        tagged = tagged.unionByName(
            new_ids.select(
                _ip(F.col("id"), id_buckets).alias("v"),
                F.lit(1).alias("t"),
            )
        )
    _pg = tagged.distinct().collect()
    probe_hps = [r.v for r in _pg if r.t == 0]
    if new_ids is not None:
        stored_ids = _read_id_table_probed(
            spark, path, _IDS_TABLE, new_ids, id_buckets, None,
            exclude_label=update_label,
            probe=[r.v for r in _pg if r.t == 1],
        ).select("id")
        _ids_overlap_guard(
            spark, path, new_ids, stored_ids, "substring_increment"
        )
    # the probe reads ONLY the hash column of the probed partitions —
    # ReadSchema h, PartitionFilters hp (asserted in pytest).
    # Tombstoned docs' windows are anti-joined immediately: a deleted
    # doc must no longer mark shard windows as already-indexed (the
    # one-shot on the reduced corpus never sees them); no-op when the
    # index holds no tombstones.
    win_tbl = _anti_tombstones(
        _read_increment_table(spark, path, "windows"),
        _read_tombstones(spark, path, None),
        "id",
    )
    if update_index:
        # at-least-once replay: exclude this increment's own rows (a
        # failed first attempt would otherwise make every shard window
        # look already-indexed — the dedup_increment replay contract)
        win_tbl = win_tbl.where(F.col("mb") != F.lit(update_label))
    idx_h = (
        win_tbl.where(F.col("hp").isin(probe_hps))
        .select("h")
        .distinct()
    )
    dup_vs_corpus = win.join(idx_h, "h").select("id", "pos")
    shard_dup_h = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("h")
    )
    dup_internal = win.join(shard_dup_h, "h").select("id", "pos")
    hits = dup_vs_corpus.unionByName(dup_internal).dropDuplicates(
        ["id", "pos"]
    )
    spans = merge_hit_spans(hits, min_len, id_col)

    if update_index:
        # the spans plan READS the windows directory; pin the result
        # before this update rewrites its own mb= increment (a replay
        # would otherwise invalidate the lazy plan's file listing)
        spans = spans.localCheckpoint()
        win.select(
            F.pmod(F.col("h"), F.lit(index_buckets)).cast("int").alias(
                "hp"
            ),
            "h",
            "id",
            "pos",
        ).repartition(F.col("hp")).write.mode("overwrite").partitionBy(
            "hp"
        ).parquet(os.path.join(path, "windows", f"mb={update_label}"))
        tables = ["windows"]
        if id_buckets is not None and new_ids is not None:
            _ids_write(new_ids, path, update_label, id_buckets)
            tables.append(_IDS_TABLE)
        _manifest_add(spark, path, tables, update_label)
    return _with_cached_deps(spans, [win])


# ---------------------------------------------------------------------------
# manifest: atomic commits for the increment tables
# ---------------------------------------------------------------------------
#
# The layout-discovery problem: live increments were found by LISTING
# ``mb=`` directories, so compaction's delete-then-rename swap had a
# window where a concurrent reader saw a missing table. The fix is the
# standard log-structured commit (the Delta/Iceberg transaction-log
# idea in its minimal form, built only on Hadoop FileSystem semantics):
# ``<index>/_manifest/v<NNNNNNNN>.json`` files, each a COMPLETE record
# of every table's live increment dirs. Committing = write a tmp file,
# rename it to the NEXT version — rename-to-a-fresh-name is atomic on
# any correct FS, so readers (who take the highest version) see either
# the old state or the new one, never a partial. Compaction writes the
# folded data into a NEW ``mb=`` dir and commits a manifest pointing at
# it; superseded dirs stay on disk until ``index_vacuum`` (the
# documented read grace). Single writer assumed (the daily-pipeline
# contract); a lost race on the version rename fails loudly.
# Indexes built before the manifest (or by hand) fall back to directory
# listing — the manifest appears at the first build/increment/compact.

_MANIFEST_DIR = "_manifest"
_MANIFEST_KEEP = 20  # committed versions retained for in-flight readers


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(
        spark._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
    )
    return jvm, fs, hpath


def _read_manifest(spark: SparkSession, index_path: str) -> dict | None:
    """Highest committed manifest, or None when the index predates the
    manifest (fall back to directory listing)."""
    import json

    mdir = os.path.join(index_path, _MANIFEST_DIR)
    jvm, fs, hdir = _hadoop_fs(spark, mdir)
    if not fs.exists(hdir):
        return None
    best, best_v = None, -1
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                v = int(name[1:-5])
            except ValueError:
                continue
            if v > best_v:
                best, best_v = st.getPath(), v
    if best is None:
        return None
    stream = fs.open(best)
    try:
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    out = json.loads(data.decode("utf-8"))
    out["version"] = best_v
    return out


def _commit_manifest(
    spark: SparkSession, index_path: str, tables: dict[str, list[str]]
) -> int:
    """Commit a new manifest version atomically; returns the version.
    Fails loudly if another writer took the version first (rename to an
    existing name returns false — first writer wins)."""
    import json
    import uuid

    mdir = os.path.join(index_path, _MANIFEST_DIR)
    jvm, fs, hdir = _hadoop_fs(spark, mdir)
    fs.mkdirs(hdir)
    cur = _read_manifest(spark, index_path)
    next_v = (cur["version"] + 1) if cur else 1
    payload = json.dumps(
        {"tables": {k: sorted(v) for k, v in tables.items()}},
        sort_keys=True,
    ).encode("utf-8")
    tmp = jvm.org.apache.hadoop.fs.Path(
        os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
    )
    out = fs.create(tmp, True)
    try:
        out.write(payload)
    finally:
        out.close()
    dst = jvm.org.apache.hadoop.fs.Path(
        os.path.join(mdir, f"v{next_v:08d}.json")
    )
    if not fs.rename(tmp, dst):
        fs.delete(tmp, False)
        raise IOError(
            f"manifest commit lost the race for version {next_v} at "
            f"{index_path!r} — single-writer contract violated"
        )
    # prune ancient versions (bounded metadata; readers only ever take
    # the max, the retained tail is grace for in-flight resolvers)
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                v = int(name[1:-5])
            except ValueError:
                continue
            if v <= next_v - _MANIFEST_KEEP:
                fs.delete(st.getPath(), False)
    return next_v


def index_versions(spark: SparkSession, index_path: str) -> "list[dict]":
    """Every RETAINED manifest version of an index, ascending —
    ``[{version, tables}]``. The manifest keeps the last
    ``_MANIFEST_KEEP`` commits (the read grace), so this is the
    snapshot-read window: any listed version can be pinned with
    :func:`index_snapshot` as long as ``index_vacuum`` has not yet
    reclaimed the directories it references."""
    import json

    mdir = os.path.join(index_path, _MANIFEST_DIR)
    jvm, fs, hdir = _hadoop_fs(spark, mdir)
    if not fs.exists(hdir):
        return []
    out = []
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            v = int(name[1:-5])
        except ValueError:
            continue
        stream = fs.open(st.getPath())
        try:
            data = bytes(
                jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        rec = json.loads(data.decode("utf-8"))
        out.append({"version": v, "tables": rec["tables"]})
    return sorted(out, key=lambda r: r["version"])


def index_snapshot(
    spark: SparkSession, index_path: str, version: int
) -> "dict[str, list[str]]":
    """The pinned live-dir map of one RETAINED manifest version — the
    time-travel read: pass it wherever a reader takes a ``live``
    resolution (e.g. ``bm25_index_search(at_version=...)``) and every
    table read binds to that commit, tombstone visibility included (a
    snapshot taken before a delete does not see its tombstones — the
    index as it WAS). Fails loudly when the version has been pruned
    from the manifest window or a directory it references has been
    vacuumed — a silent fallback to latest would be a lie about what
    the caller is reading."""
    for rec in index_versions(spark, index_path):
        if rec["version"] == version:
            jvm, fs, _ = _hadoop_fs(spark, index_path)
            for t, dirs in rec["tables"].items():
                for d in dirs:
                    p = jvm.org.apache.hadoop.fs.Path(
                        os.path.join(index_path, t, d)
                    )
                    if not fs.exists(p):
                        raise ValueError(
                            f"index snapshot v{version} at "
                            f"{index_path!r} references {t}/{d} which "
                            "has been vacuumed — the version is no "
                            "longer readable (vacuum is the retention "
                            "boundary)"
                        )
            return {k: list(v) for k, v in rec["tables"].items()}
    have = [r["version"] for r in index_versions(spark, index_path)]
    raise ValueError(
        f"index at {index_path!r} has no retained manifest version "
        f"{version} — retained: {have}"
    )


def _list_increment_dirs(
    spark: SparkSession, table_path: str
) -> list[str]:
    _, fs, hdir = _hadoop_fs(spark, table_path)
    if not fs.exists(hdir):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(hdir)
        if st.isDirectory() and st.getPath().getName().startswith("mb=")
    )


def _manifest_tables(
    spark: SparkSession, index_path: str, table_names: list[str]
) -> dict[str, list[str]]:
    """Current live-dir map: the committed manifest, or (pre-manifest
    index) the directory listing."""
    m = _read_manifest(spark, index_path)
    if m is not None:
        return {k: list(v) for k, v in m["tables"].items()}
    return {
        t: _list_increment_dirs(spark, os.path.join(index_path, t))
        for t in table_names
    }


def _manifest_add(
    spark: SparkSession, index_path: str, table_names: list[str],
    label: str,
) -> None:
    """Register ``mb=<label>`` in every named table (idempotent;
    skips the commit when nothing changes)."""
    tables = _manifest_tables(spark, index_path, table_names)
    changed = _read_manifest(spark, index_path) is None
    for t in table_names:
        dirs = set(tables.get(t, []))
        if f"mb={label}" not in dirs:
            dirs.add(f"mb={label}")
            changed = True
        tables[t] = sorted(dirs)
    if changed:
        _commit_manifest(spark, index_path, tables)


def _read_increment_table(
    spark: SparkSession, index_path: str, table: str
) -> DataFrame:
    """The table's LIVE increments only — resolved through the
    manifest (superseded dirs a compaction left behind are invisible);
    directory semantics for pre-manifest indexes. Resolves the
    manifest PER CALL: a reader touching several tables of one index
    should resolve once with :func:`_manifest_tables` and read each
    through :func:`_read_pinned_table` instead, or a commit landing
    between its calls mixes table versions (e.g. one version's codes
    decoded with another's model)."""
    root = os.path.join(index_path, table)
    m = _read_manifest(spark, index_path)
    if m is None or table not in m["tables"]:
        return spark.read.parquet(root)
    dirs = [os.path.join(root, d) for d in m["tables"][table]]
    if not dirs:
        raise ValueError(
            f"index at {index_path!r}: manifest lists no live "
            f"increments for table {table!r}"
        )
    return spark.read.option("basePath", root).parquet(*dirs)


def _pinned_live(
    spark: SparkSession, index_path: str
) -> "dict[str, list[str]] | None":
    """ONE manifest resolution for a multi-table reader, or ``None``
    for a pre-manifest (legacy) index — where there are no manifest
    commits to race, so per-call directory reads are already
    consistent."""
    m = _read_manifest(spark, index_path)
    return None if m is None else {
        k: list(v) for k, v in m["tables"].items()
    }


def _read_pinned_table(
    spark: SparkSession, index_path: str, table: str,
    live: "dict[str, list[str]] | None",
) -> DataFrame:
    """Read one index table's live increments from a PINNED manifest
    snapshot (``live`` = one :func:`_pinned_live` resolution shared by
    every table a multi-table reader touches). The atomic manifest
    commit guarantees old-state-or-new only per RESOLUTION; cross-table
    consistency inside one query (model ↔ codes, postings ↔ corpus
    stats) needs all its reads bound to the same resolution — this is
    that binding. ``live=None`` (pre-manifest index) and tables the
    manifest doesn't list fall back to the per-call reader's
    semantics."""
    if live is None or table not in live:
        return _read_increment_table(spark, index_path, table)
    root = os.path.join(index_path, table)
    dirs = live[table]
    if not dirs:
        raise ValueError(
            f"index at {index_path!r}: manifest lists no live "
            f"increments for table {table!r}"
        )
    return spark.read.option("basePath", root).parquet(
        *[os.path.join(root, d) for d in dirs]
    )


# ---------------------------------------------------------------------------
# shared identity layer: id-overlap detection + deletion tombstones
# ---------------------------------------------------------------------------
# Every incremental index in this layer assumes id-DISJOINT increments
# (a document split across increments double-counts whatever the index
# aggregates — BM25 df/N, dedup pair fanout, duplicate ANN neighbors).
# Re-ingesting a partially-failed upstream shard is the most common
# operational accident, so appends PROBE a per-index identity store and
# fail loud instead of corrupting silently:
#
# - indexes whose tables are already id-bucketed probe those directly
#   (ANN ``vectors/vp=``, minhash ``shingles/ip=``);
# - the others (BM25 postings are term-bucketed, semantic vectors are
#   cell-bucketed) carry an explicit ``ids/mb=<label>/ip=<p>`` table —
#   ids only, written beside each increment — plus a one-row ``idmeta``
#   geometry table. Both are manifest-tracked like every other table.
#
# Deletion (takedowns / retractions / right-to-be-forgotten) is a
# ``tombstones/mb=<label>/ip=<p>`` table of STRING-canonicalized ids
# under the same manifest commit discipline: reads anti-join it, and
# compaction physically drops tombstoned rows and clears the table.
# A tombstoned id stays "occupied" for the overlap guard until a
# compaction physically removes it — the delete → compact → re-ingest
# lifecycle, never an ambiguous half-resurrected id.

_IDS_TABLE = "ids"
_IDMETA_TABLE = "idmeta"
_TOMB_TABLE = "tombstones"


def _id_str(col):
    """Canonical string form of an id for the identity layer — makes
    the overlap/tombstone hash independent of the caller's integer
    width (Spark's xxhash64 is input-type-sensitive; int-vs-long id
    columns must not land in different buckets)."""
    return F.col(col).cast("string") if isinstance(col, str) else col.cast(
        "string"
    )


def _ids_init(spark: SparkSession, path: str, id_buckets: int) -> None:
    """Write the identity-layer geometry row at build time. Goes live
    through the caller's manifest commit (include ``idmeta`` in the
    table list)."""
    if id_buckets < 1:
        raise ValueError(f"id_buckets must be ≥ 1, got {id_buckets}")
    local_df(
        spark, [(int(id_buckets),)], "id_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, _IDMETA_TABLE, "mb=base")
    )


def _ids_buckets(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None",
) -> int | None:
    """The identity layer's bucket count, or ``None`` for an index
    built before the layer existed (no ``idmeta`` table) — such an
    index keeps its original no-detection semantics until rebuilt."""
    if live is not None:
        if _IDMETA_TABLE not in live:
            return None
    else:
        _, fs, hdir = _hadoop_fs(
            spark, os.path.join(path, _IDMETA_TABLE)
        )
        if not fs.exists(hdir):
            return None
    rows = _read_pinned_table(spark, path, _IDMETA_TABLE, live).collect()
    if len(rows) != 1:
        raise ValueError(
            f"index at {path!r} has a corrupt idmeta table "
            f"({len(rows)} rows, expected 1)"
        )
    return int(rows[0].id_buckets)


def _ids_write(
    ids: DataFrame, path: str, label: str, id_buckets: int,
    table: str = _IDS_TABLE,
) -> None:
    """Land one increment's id rows (first column must be the
    string-canonical ``id``; extra columns ride along) in its own
    ``mb=`` directory, ``ip``-bucketed. OVERWRITE ⇒ replay idempotent;
    live only through the caller's manifest commit."""
    cols = ids.columns
    _write_id_bucketed(
        ids, F.col("id"), id_buckets,
        os.path.join(path, table, f"mb={label}"), cols,
    )


def _ids_overlap_guard(
    spark: SparkSession,
    path: str,
    new_ids: DataFrame,
    stored_ids: DataFrame,
    fn: str,
) -> None:
    """Fail loud when any id of ``new_ids`` (single string column
    ``id``) already exists in ``stored_ids`` (same shape; the caller
    reads it PRUNED to the new ids' buckets and EXCLUDES the
    increment's own replayed label). The bounded collect is ≤ 11
    sample rows."""
    hits = [
        r.id
        for r in stored_ids.join(new_ids, "id", "leftsemi")
        .select("id").limit(11).collect()
    ]
    if hits:
        sample = ", ".join(map(str, hits[:10]))
        more = ", …" if len(hits) > 10 else ""
        raise ValueError(
            f"{fn}: shard overlaps ids already live in the index at "
            f"{path!r} (e.g. {sample}{more}). Increments must be "
            "id-disjoint — an overlapping append would silently corrupt "
            "the index's aggregates. If this is a replay of a failed "
            "append, reuse its original label; if the id was deleted, "
            "compact the index first (delete → compact → re-ingest)."
        )


def _read_id_table_probed(
    spark: SparkSession,
    path: str,
    table: str,
    new_ids: DataFrame,
    id_buckets: int,
    live: "dict[str, list[str]] | None",
    exclude_label: str | None = None,
    probe: "list[int] | None" = None,
    empty_schema: str = "id string",
) -> DataFrame:
    """The ``ip``-bucketed id table pruned to the probe ids' buckets
    (a PARTITION filter — bounded by ``id_buckets`` literals) minus
    the replayed increment's own rows. ``probe`` lets a caller that
    already collected the shard's bucket set (e.g. alongside its cell
    probe) pass it in and skip this function's collect. An EMPTY probe
    set (empty shard) short-circuits to a driver-local empty frame —
    zero file listings, the guard costs nothing on an empty append
    (``empty_schema`` names the columns the caller will select)."""
    if probe is None:
        probe = [
            r.ip
            for r in new_ids.select(
                _ip(F.col("id"), id_buckets).alias("ip")
            ).distinct().collect()
        ]
    if not probe:
        return local_df(spark, [], empty_schema)
    tbl = _read_pinned_table(spark, path, table, live)
    if exclude_label is not None:
        tbl = tbl.where(F.col("mb") != F.lit(exclude_label))
    return tbl.where(F.col("ip").isin(probe))


def _tomb_write(
    spark: SparkSession, path: str, ids: DataFrame, label: str,
    id_buckets: int,
) -> None:
    """Land one delete's tombstone rows (single string column ``id``)
    in their own ``mb=`` directory — OVERWRITE ⇒ a replayed delete is
    idempotent; live only through the caller's manifest commit."""
    _ids_write(ids, path, label, id_buckets, table=_TOMB_TABLE)


def _read_tombstones(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None",
) -> "DataFrame | None":
    """The live tombstone set as a single string ``id`` column, or
    ``None`` when the index has none (table absent, or cleared to an
    empty live list by compaction — the one table where an empty live
    list is a legal state, not corruption)."""
    if live is not None:
        if not live.get(_TOMB_TABLE):
            return None
        return _read_pinned_table(
            spark, path, _TOMB_TABLE, live
        ).select("id")
    _, fs, hdir = _hadoop_fs(spark, os.path.join(path, _TOMB_TABLE))
    if not fs.exists(hdir):
        return None
    m = _read_manifest(spark, path)
    if m is not None and not m["tables"].get(_TOMB_TABLE):
        return None
    return _read_increment_table(spark, path, _TOMB_TABLE).select("id")


def _anti_tombstones(df: DataFrame, tomb: "DataFrame | None", id_col):
    """``df`` minus rows whose (string-canonical) id is tombstoned —
    the read-side half of deletion. No-op when there are no
    tombstones, so undeleted indexes keep their exact original plan."""
    if tomb is None:
        return df
    probe = tomb.select(F.col("id").alias("__tomb_id"))
    key = _id_str(id_col)
    return df.join(
        probe, key == F.col("__tomb_id"), "left_anti"
    )


def _set_manifest_table(
    spark: SparkSession, path: str, table: str, dirs: list[str],
) -> None:
    """Point one table at an explicit live-dir list in a fresh manifest
    commit, preserving every other table — the tombstone-clear step of
    a compaction (an empty list is legal ONLY for tombstones)."""
    tables = _manifest_tables(
        spark, path, sorted(set(_list_index_tables(spark, path)) | {table})
    )
    tables[table] = dirs
    _commit_manifest(spark, path, tables)


def index_vacuum(spark: SparkSession, index_path: str) -> dict:
    """Delete increment dirs no manifest-listed table references —
    the garbage a compaction supersedes. Run OUTSIDE the read grace
    (readers resolve the manifest once, then list files; vacuum after
    in-flight queries finish — the retention contract every
    log-structured table format documents)."""
    m = _read_manifest(spark, index_path)
    if m is None:
        return {"deleted": 0}
    deleted = 0
    for t, live in m["tables"].items():
        root = os.path.join(index_path, t)
        keep = set(live)
        for d in _list_increment_dirs(spark, root):
            if d not in keep:
                _delete_path(spark, os.path.join(root, d))
                deleted += 1
    return {"deleted": deleted}


# ---------------------------------------------------------------------------
# index maintenance: compaction of accumulated increments
# ---------------------------------------------------------------------------

def _compact_increment_table(
    spark: SparkSession, index_path: str, table: str,
    inner_partition: str | None,
    derive_inner=None,
    exclude_labels: set[str] | None = None,
    transform=None,
) -> int:
    """Fold every live ``mb=`` increment of one index table into a
    single fresh increment dir and commit it via the manifest: read
    the live set, rewrite it as one ``mb=base-<uuid>`` directory
    (clustered on the inner partition key when the table has one),
    then swap the manifest pointer — an ATOMIC commit, so a reader
    resolving at any moment sees the old increments or the new one,
    never a missing table. Superseded dirs remain until
    :func:`index_vacuum`. Returns the compacted row count.

    ``exclude_labels`` keeps the named increments OUT of the fold and
    live in the committed manifest — the streaming lifecycle's replay
    guard: a micro-batch that is not yet checkpoint-committed may be
    re-delivered and OVERWRITE its own ``mb=`` directory, so folding
    it would double its rows on replay. Callers pass the in-flight
    batch's label; everything older is committed and safe to fold.

    A daily pipeline accretes one ``mb=`` directory per shard — file
    counts and listings grow without bound; compaction is the
    OPTIMIZE of this layout."""
    import uuid

    table_root = os.path.join(index_path, table)
    excluded: list[str] = []
    if exclude_labels:
        live = _manifest_tables(spark, index_path, [table]).get(table, [])
        keep = {f"mb={x}" for x in exclude_labels}
        fold = [d for d in live if d not in keep]
        excluded = sorted(d for d in live if d in keep)
        if not fold:
            return 0
        df = spark.read.option("basePath", table_root).parquet(
            *[os.path.join(table_root, d) for d in fold]
        )
    else:
        df = _read_increment_table(spark, index_path, table)
    rows = df.drop("mb")
    if transform is not None:
        # the deletion hook: compaction is the moment tombstoned rows
        # are physically dropped (and stats rows net-folded) — the
        # caller supplies the row-level rewrite, this function supplies
        # the atomic swap
        rows = transform(rows)
    new_dir = f"mb=base-{uuid.uuid4().hex[:8]}"
    dest = os.path.join(table_root, new_dir)
    if inner_partition is not None and inner_partition not in rows.columns:
        if derive_inner is not None:
            # compaction rewrites the whole table anyway — the natural
            # moment to UPGRADE a legacy flat layout to the bucketed
            # one (the caller supplies the derivation, e.g. the ip
            # id-prefix), so pruned reads come back without a rebuild
            rows = derive_inner(rows)
        else:
            # no derivation available: compact flat (the table's
            # original layout) rather than fail
            inner_partition = None
    if inner_partition is not None:
        rows.repartition(F.col(inner_partition)).write.mode(
            "overwrite"
        ).partitionBy(inner_partition).parquet(dest)
    else:
        rows.write.mode("overwrite").parquet(dest)
    n = spark.read.parquet(dest).count()
    tables = _manifest_tables(
        spark, index_path,
        [table] + [
            t for t in _list_index_tables(spark, index_path)
            if t != table
        ],
    )
    tables[table] = [new_dir] + excluded
    _commit_manifest(spark, index_path, tables)
    return n


def _list_index_tables(spark: SparkSession, index_path: str) -> list[str]:
    """Increment-table names under an index root (dirs that contain
    ``mb=`` children) — so a first compaction on a pre-manifest index
    seeds the manifest with EVERY table, not just the compacted one."""
    _, fs, hdir = _hadoop_fs(spark, index_path)
    out = []
    if not fs.exists(hdir):
        return out
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if not st.isDirectory() or name.startswith("_"):
            continue
        if name in ("components", "meta", "model"):
            continue
        if _list_increment_dirs(
            spark, os.path.join(index_path, name)
        ):
            out.append(name)
    return sorted(out)


def minhash_index_reband(
    spark: SparkSession,
    path: str,
    num_hashes: int | None = None,
    bands: int | None = None,
    threshold: float | None = None,
    max_bucket: int | None = None,
) -> dict:
    """GEOMETRY MIGRATION — the band index's lifecycle event, sibling
    of :func:`.ann_index.ann_index_retrain` and :func:`.semantic_index.
    semantic_index_retrain`: re-derive the ENTIRE band table from the
    stored shingle sets at a new banding geometry and swap bands + meta
    in ONE atomic manifest commit. Banding recall is a geometry
    property (P(candidate) = 1-(1-J^r)^b), so a deployment that
    discovers threshold-edge pairs slipping through — exactly the
    measured 16×4 → 32×2 migration this corpus needed, BENCH_NOTES
    round-11 — repairs it HERE, without re-reading a byte of corpus
    text: signatures are a pure function of the stored shingle sets.

    The migration also re-runs pair discovery over the new band table
    (new-geometry candidates the old banding never surfaced, verified
    with exact Jaccard against the stored shingles at the — possibly
    new — threshold) and merges them into the components closure.
    MONOTONE: existing closure edges are kept, so decisions already
    persisted are never un-made; a TIGHTER geometry stops surfacing
    future candidates but does not split existing clusters (the
    increment layer's monotone contract).

    ``n`` (shingle width) and ``index_buckets`` are immutable — the
    first changes the shingle sets themselves (that is a rebuild from
    text), the second the shingle/component partition layout. A
    threshold/cap-ONLY migration skips the band rewrite entirely (the
    band table is a pure function of (shingles, num_hashes, bands), so
    it would be bit-identical): only pair re-discovery at the new
    threshold plus the meta swap runs. A reader resolving
    mid-migration sees the old geometry with the old bands or the new
    with the new, never a mix: meta moves into the manifest
    (``meta/mb=<label>``) at the first migration. Returns
    ``{swapped, label, bands_rows, new_pairs, num_hashes, bands}``."""
    import uuid

    from etl_prometheus2clickhouse_spark.operators.dedup import (
        cached_scope,
    )

    old = _read_meta(spark, path)
    new_nh = int(num_hashes if num_hashes is not None else old["num_hashes"])
    new_b = int(bands if bands is not None else old["bands"])
    new_thr = float(threshold if threshold is not None else old["threshold"])
    new_mb = int(max_bucket if max_bucket is not None else old["max_bucket"])
    if new_nh % new_b != 0:
        raise ValueError("num_hashes must be divisible by bands")
    if (new_nh, new_b, new_thr, new_mb) == (
        old["num_hashes"], old["bands"], old["threshold"], old["max_bucket"]
    ):
        return {"swapped": False, "label": None}
    geometry_changed = (new_nh, new_b) != (
        old["num_hashes"], old["bands"],
    )
    index_buckets = old["index_buckets"]
    with cached_scope():  # every persist below dies with the migration
        tomb = _read_tombstones(spark, path, None)
        sh = _anti_tombstones(
            # a reband derives the new band table from the LIVE
            # shingle sets: tombstoned docs must not re-enter the
            # geometry (compaction may not have dropped them yet)
            _read_increment_table(spark, path, "shingles"), tomb, "id"
        ).select("id", "sh").persist()
        _register_cached(sh)
        label = f"reband-{uuid.uuid4().hex[:8]}"
        if geometry_changed:
            banded = _bands_from_shingles(
                sh, new_nh, new_b, index_buckets
            ).persist()
            _register_cached(banded)
            banded.repartition(F.col("bb")).write.mode(
                "overwrite"
            ).partitionBy("bb").parquet(
                os.path.join(path, "bands", f"mb={label}")
            )
        else:
            # threshold/cap-only migration: the band table is a pure
            # function of (shingles, num_hashes, bands), so it is
            # bit-identical under the new meta — rewriting it would be
            # corpus-sized I/O for a one-row meta change; pair
            # discovery re-runs over the LIVE band table at the new
            # threshold/cap instead
            banded = _anti_tombstones(
                _read_increment_table(spark, path, "bands"), tomb, "id"
            ).select(
                "bb", "band", "bucket", "id"
            ).persist()
            _register_cached(banded)
        # pair discovery at the new geometry (same cap + verify
        # semantics as the build), merged MONOTONICALLY into the
        # stored closure
        sizes = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("bucket_n")
        )
        sized = banded.join(sizes, ["band", "bucket"]).where(
            F.col("bucket_n") <= new_mb
        )
        a, b = sized.alias("a"), sized.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        new_pairs = _verify_pairs(cand, sh, sh, new_thr).select(
            "id_a", "id_b"
        )
        # merge the newly surfaced pairs with the TOUCHED-CLUSTER
        # discipline of dedup_increment (shared helpers — untouched
        # clusters' labels cannot change, their partitions are never
        # read or written, and the staged swap leaves no window where
        # a crash loses rows or a reader sees a missing table)
        comp_dir = os.path.join(path, "components")
        id_type = sh.schema["id"].dataType.simpleString()
        _recover_components(spark, comp_dir)  # writer touch: heal a crashed swap first
        comp_tbl = _read_components(spark, comp_dir, id_type)
        comp_new, touched = _closure_with_new_pairs(
            comp_tbl, new_pairs, index_buckets
        )
        n_new_pairs = new_pairs.count()
        n_bands_rows = banded.count()
        _rewrite_touched_components(
            spark, comp_dir, comp_tbl, comp_new, touched, index_buckets
        )
        # new meta row lands as a manifest-tracked increment; the ONE
        # commit below swaps bands AND meta together (atomic for
        # readers — geometry and band table can never mismatch)
        local_df(
            spark,
            [(
                old["n"], new_nh, new_b, new_thr, new_mb, index_buckets,
            )],
            "n int, num_hashes int, bands int, threshold double, "
            "max_bucket int, index_buckets int",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "meta", f"mb={label}")
        )
        tables = _manifest_tables(
            spark, path,
            ["bands", "shingles"]
            + [t for t in _list_index_tables(spark, path)
               if t not in ("bands", "shingles")],
        )
        if geometry_changed:
            tables["bands"] = [f"mb={label}"]
        tables["meta"] = [f"mb={label}"]
        _commit_manifest(spark, path, tables)
        return {
            "swapped": True,
            "label": label,
            "bands_rows": n_bands_rows,
            "new_pairs": n_new_pairs,
            "num_hashes": new_nh,
            "bands": new_b,
        }


def minhash_index_compact(
    spark: SparkSession, path: str,
    exclude_labels: set[str] | None = None,
) -> dict:
    """Compact the MinHash band index's accumulated increments
    (bands + shingles; the in-place components table is already a
    single artifact). Decisions are unchanged — the increment layout
    is physical, not semantic (pinned by pytest: a probe after
    compaction equals the probe before). The swap is a manifest
    commit (atomic); run :func:`index_vacuum` afterwards to reclaim
    superseded directories. A legacy FLAT shingle store (no ``ip``
    bucket column) is UPGRADED to the bucketed layout here — the
    compaction rewrite is the natural migration moment, after which
    the exact-verify reads prune again."""
    ib = int(_read_meta(spark, path)["index_buckets"])
    tomb = _read_tombstones(spark, path, None)

    def _drop_tombstoned(rows: DataFrame) -> DataFrame:
        # deletion integration: compaction physically drops tombstoned
        # band/shingle rows; the tombstone table is cleared LAST, so a
        # reader between the commits anti-joins still-live tombstones
        # (a no-op on the reduced rows), never resurrects a doc
        return _anti_tombstones(rows, tomb, "id")

    # physical drop only when tombstones clear in the same pass (see
    # bm25_index_compact): dropping rows while tombstones stay live
    # would let a re-ingest pass the overlap guard yet stay invisible
    drop = _drop_tombstoned if not exclude_labels else None

    out = {
        "bands_rows": _compact_increment_table(
            spark, path, "bands", "bb", exclude_labels=exclude_labels,
            transform=drop,
        ),
        "shingles_rows": _compact_increment_table(
            spark, path, "shingles", "ip",
            derive_inner=lambda r: r.withColumn(
                "ip", _ip(F.col("id"), ib)
            ),
            exclude_labels=exclude_labels,
            transform=drop,
        ),
    }
    if tomb is not None and not exclude_labels:
        _set_manifest_table(spark, path, _TOMB_TABLE, [])
        out["tombstones_cleared"] = True
    return out


def substring_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "doc_id",
) -> dict:
    """Tombstone documents out of the window index — the takedown
    lifecycle event for exact-substring dedup: a deleted doc's windows
    must stop marking future shard windows as already-indexed (the
    one-shot spans of the REDUCED union never see them), and the id
    stays occupied for the overlap guard until compaction physically
    drops its rows (delete → compact → re-ingest). Same tombstone
    mechanics as the BM25/ANN/semantic/minhash siblings: the delete is
    one ``mb=`` tombstone commit (replay-idempotent under its label);
    every read anti-joins live tombstones; bytes reclaim at
    :func:`substring_index_compact`. Returns ``{deleted_docs}``."""
    if not label or any(c in label for c in "/=%"):
        raise ValueError(
            "substring_index_delete needs a filesystem-safe label, "
            f"got {label!r}"
        )
    id_buckets = _ids_buckets(spark, path, None)
    if id_buckets is None:
        raise ValueError(
            f"substring_index_delete: the index at {path!r} predates "
            "the identity layer (no idmeta table) — rebuild it once "
            "with substring_index_build to enable deletes"
        )
    want = ids.select(_id_str(id_col).alias("id")).distinct()
    present = _read_id_table_probed(
        spark, path, _IDS_TABLE, want, id_buckets, None
    ).select("id").join(want, "id", "leftsemi")
    tomb_prior = None
    m = _read_manifest(spark, path)
    if m is not None and m["tables"].get(_TOMB_TABLE):
        prior = [
            d for d in m["tables"][_TOMB_TABLE] if d != f"mb={label}"
        ]
        if prior:
            root = os.path.join(path, _TOMB_TABLE)
            tomb_prior = spark.read.option("basePath", root).parquet(
                *[os.path.join(root, d) for d in prior]
            ).select("id")
    # persisted: the count and the tombstone write both consume the
    # pruned resolve join — one computation, not two
    effective = _anti_tombstones(present, tomb_prior, "id").persist()
    _register_cached(effective)
    n = effective.count()
    _tomb_write(spark, path, effective, label, id_buckets)
    _manifest_add(spark, path, [_TOMB_TABLE], label)
    return {"deleted_docs": int(n)}


def substring_index_compact(
    spark: SparkSession, path: str,
    exclude_labels: set[str] | None = None,
) -> dict:
    """Compact the substring window index's increments. Deletion
    integration mirrors the siblings: tombstoned window/identity rows
    are physically dropped ONLY in the pass that also clears the
    tombstone table (see bm25_index_compact — dropping rows while
    tombstones stay live would let a re-ingest pass the overlap guard
    yet stay invisible)."""
    tomb = _read_tombstones(spark, path, None)

    def _drop_tombstoned(rows: DataFrame) -> DataFrame:
        return _anti_tombstones(rows, tomb, "id")

    drop = _drop_tombstoned if not exclude_labels else None
    out = {
        "windows_rows": _compact_increment_table(
            spark, path, "windows", "hp", exclude_labels=exclude_labels,
            transform=drop,
        )
    }
    if _ids_buckets(spark, path, None) is not None:
        out["id_rows"] = _compact_increment_table(
            spark, path, _IDS_TABLE, "ip", exclude_labels=exclude_labels,
            transform=drop,
        )
    if tomb is not None and not exclude_labels:
        _set_manifest_table(spark, path, _TOMB_TABLE, [])
        out["tombstones_cleared"] = True
    return out


def _heal_paras_swaps(spark: SparkSession, path: str) -> None:
    """Writer-touch recovery for the paragraph MEMBERSHIP table: a
    crashed delete-time partition swap inside any live ``paras``
    increment dir is rolled forward/back from directory state (the
    shared :func:`recover_partition_swap` protocol at ``hp=``)."""
    root = os.path.join(path, "paras")
    for d in _manifest_tables(spark, path, ["paras"]).get("paras", []):
        recover_partition_swap(spark, os.path.join(root, d), "hp=")


def paragraph_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "doc_id",
) -> dict:
    """Tombstone documents out of the paragraph hash index — the
    takedown lifecycle event for the CCNet stage: a hash the deleted
    docs ALONE contributed becomes electable again (the one-shot
    election on the reduced corpus), while hashes with surviving
    contributors keep suppressing. The id stays occupied for the
    overlap guard until compaction.

    Split layout (``attrib`` table present): the delete finds the
    staged ids' containment pairs in the attribution table, elects the
    DEAD hashes (no surviving contributor — prior tombstones counted
    as dead), and REWRITES the membership rows for those hashes
    through the crash-safe partition swap, touched ``hp=`` buckets
    only — so the hot probe path never needs a tombstone join.
    Economics: the by-id attribution lookup is one slim two-column
    scan (deletes are the rare compliance event; the per-increment
    probe path is what must stay distinct-h-sized); the survivor
    check and the membership rewrite are pruned to the dead
    candidates' own buckets.

    Legacy v1 (attributed rows inside ``paras``): tombstone-only —
    reads anti-join as before. v0 (hash-only) refuses loudly; its
    contributor ids are unknowable after the fact.

    Returns ``{deleted_docs, dead_hashes, touched_buckets}`` (the
    latter two zero/empty on the legacy path)."""
    if not label or any(c in label for c in "/=%"):
        raise ValueError(
            "paragraph_index_delete needs a filesystem-safe label, "
            f"got {label!r}"
        )
    id_buckets = _ids_buckets(spark, path, None)
    if id_buckets is None:
        raise ValueError(
            f"paragraph_index_delete: the index at {path!r} predates "
            "the identity layer (no idmeta table) — rebuild it once "
            "with paragraph_index_build to enable deletes"
        )
    has_attrib = bool(
        _manifest_tables(spark, path, ["attrib"]).get("attrib", [])
    )
    live = _manifest_tables(spark, path, ["paras"]).get("paras", [])
    root = os.path.join(path, "paras")
    if not has_attrib:
        # every live increment must be contributor-attributed: a
        # legacy hash-only increment's rows cannot be attributed to
        # the deleted doc, so deletion over a mixed index would
        # silently miss rows
        for d in live:
            cols = spark.read.parquet(os.path.join(root, d)).columns
            if "id" not in cols:
                raise ValueError(
                    f"paragraph_index_delete: increment {d!r} at "
                    f"{path!r} predates contributor attribution "
                    "(hash-only rows) — rebuild the index from the "
                    "reduced corpus to enable deletes"
                )
    else:
        _heal_paras_swaps(spark, path)
    want = ids.select(_id_str(id_col).alias("id")).distinct()
    present = _read_id_table_probed(
        spark, path, _IDS_TABLE, want, id_buckets, None
    ).select("id").join(want, "id", "leftsemi")
    tomb_prior = None
    m = _read_manifest(spark, path)
    if m is not None and m["tables"].get(_TOMB_TABLE):
        prior = [
            d for d in m["tables"][_TOMB_TABLE] if d != f"mb={label}"
        ]
        if prior:
            troot = os.path.join(path, _TOMB_TABLE)
            tomb_prior = spark.read.option("basePath", troot).parquet(
                *[os.path.join(troot, d) for d in prior]
            ).select("id")
    # persisted: the count, the candidate-hash scan, the tombstone
    # union and the final write all consume the pruned resolve join
    effective = _anti_tombstones(present, tomb_prior, "id").persist()
    _register_cached(effective)
    n = effective.count()
    dead_hashes = 0
    touched: list[int] = []
    if has_attrib and n:
        tomb_all = (
            effective
            if tomb_prior is None
            else tomb_prior.unionByName(effective).distinct()
        )
        attrib = _read_increment_table(spark, path, "attrib")
        # candidate hashes: one slim by-id scan (cannot be bucket-
        # pruned — attribution is hash-partitioned for the pruned
        # survivor pass below)
        h1 = (
            attrib.join(F.broadcast(effective), "id", "leftsemi")
            .select("hp", "h")
            .distinct()
            .localCheckpoint()
        )
        cand_hps = [
            r.hp for r in h1.select("hp").distinct().collect()
        ]
        if cand_hps:
            alive = (
                attrib.where(F.col("hp").isin(cand_hps))
                .join(h1.select("h"), "h", "leftsemi")
                .join(tomb_all, "id", "left_anti")
                .select("h")
                .distinct()
            )
            dead = h1.join(alive, "h", "left_anti").localCheckpoint()
            dead_hashes = dead.count()
            touched = sorted(
                r.hp for r in dead.select("hp").distinct().collect()
            )
        if touched:
            from pyspark.errors import AnalysisException

            dead_h = dead.select("h")
            # one pass over the touched buckets of the live table
            # names exactly the (increment, bucket) partitions holding
            # dead hashes — the swap touches only those: an increment
            # without a dead hash is never read or rewritten, no empty
            # hp= dirs are planted in increments lacking the bucket,
            # and an increment a previous delete emptied entirely (no
            # parquet files left) can never crash the per-dir read
            try:
                hit_rows = (
                    _read_increment_table(spark, path, "paras")
                    .where(F.col("hp").isin(touched))
                    .join(dead_h, "h", "leftsemi")
                    .select("mb", "hp")
                    .distinct()
                    .collect()
                )
            except AnalysisException:
                hit_rows = []  # every live increment already emptied
            per_inc: "dict[str, list[int]]" = {}
            for r in hit_rows:
                per_inc.setdefault(str(r.mb), []).append(int(r.hp))
            for d in live:
                tp = sorted(per_inc.get(d[3:], []))
                if not tp:
                    continue
                inc_dir = os.path.join(root, d)
                inc = spark.read.option("basePath", inc_dir).parquet(
                    inc_dir
                )
                kept = inc.where(F.col("hp").isin(tp)).join(
                    dead_h, "h", "left_anti"
                )

                def _write(staged: str, kept=kept) -> None:
                    (
                        kept.select("hp", "h")
                        .repartition(F.col("hp"))
                        .write.mode("overwrite")
                        .partitionBy("hp")
                        .parquet(staged)
                    )

                swap_partitions(spark, inc_dir, "hp", tp, _write)
    _tomb_write(spark, path, effective, label, id_buckets)
    _manifest_add(spark, path, [_TOMB_TABLE], label)
    return {
        "deleted_docs": int(n),
        "dead_hashes": int(dead_hashes),
        "touched_buckets": touched,
    }


def paragraph_index_compact(
    spark: SparkSession, path: str,
    exclude_labels: set[str] | None = None,
) -> dict:
    """Compact the paragraph hash index's increments (the CCNet-stage
    sibling of :func:`minhash_index_compact` — same manifest-committed
    fold, same ``exclude_labels`` replay guard for the streaming
    lifecycle). Split layout: the membership fold COLLAPSES
    cross-increment repeats of a hash to one row (distinct-h is the
    table's whole point — deletion already rewrote dead hashes out at
    delete time), and the attribution fold physically drops tombstoned
    docs' containment pairs ONLY in the pass that also clears the
    tombstone table (the deferred-drop discipline). Legacy v1 keeps
    its behavior: tombstoned contributor rows dropped from ``paras``
    in that same pass; hash-only v0 rows pass through unchanged."""
    tomb = _read_tombstones(spark, path, None)
    has_attrib = bool(
        _manifest_tables(spark, path, ["attrib"]).get("attrib", [])
    )
    if has_attrib:
        _heal_paras_swaps(spark, path)

    def _drop_tombstoned(rows: DataFrame) -> DataFrame:
        if "id" not in rows.columns:
            return rows
        return _anti_tombstones(rows, tomb, "id")

    drop = _drop_tombstoned if not exclude_labels else None
    paras_transform = drop
    if has_attrib:
        paras_transform = lambda rows: rows.dropDuplicates(["h"])  # noqa: E731
    out = {
        "paras_rows": _compact_increment_table(
            spark, path, "paras", "hp", exclude_labels=exclude_labels,
            transform=paras_transform,
        )
    }
    if has_attrib:
        out["attrib_rows"] = _compact_increment_table(
            spark, path, "attrib", "hp", exclude_labels=exclude_labels,
            transform=drop,
        )
    if _ids_buckets(spark, path, None) is not None:
        out["id_rows"] = _compact_increment_table(
            spark, path, _IDS_TABLE, "ip", exclude_labels=exclude_labels,
            transform=drop,
        )
    if tomb is not None and not exclude_labels:
        _set_manifest_table(spark, path, _TOMB_TABLE, [])
        out["tombstones_cleared"] = True
    return out


def index_live_increments(spark: SparkSession, path: str) -> dict:
    """Live ``mb=`` increment count per table — the metadata-size
    telemetry a streaming lifecycle's compaction cadence triggers on
    (manifest-resolved; directory listing for pre-manifest indexes)."""
    tables = _manifest_tables(spark, path, _list_index_tables(spark, path))
    return {t: len(v) for t, v in tables.items()}


# ---------------------------------------------------------------------------
# incremental PARAGRAPH dedup (CCNet stage)
# ---------------------------------------------------------------------------

def _para_slim(
    docs: DataFrame, id_col: str, text_col: str, sep: str,
    spread_input: bool = False,
):
    arr = F.transform(
        F.split(F.col(text_col), F.lit(sep)), lambda p: F.trim(p)
    )
    # spread only the corpus-sized build input (see _shingle_sig_bands)
    if spread_input:
        docs = spread(docs)
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(arr).alias("pos", "para"),
        )
        .filter(F.length("para") > 0)
        .select("id", "pos", F.xxhash64("para").alias("h"))
    )


def paragraph_index_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    index_buckets: int = 64,
) -> None:
    """Persist the corpus's paragraph-hash index as TWO tables under
    one manifest commit — the CCNet-stage sibling of the window index,
    laid out so membership probes never pay contributor fanout:

    - ``paras`` (MEMBERSHIP): distinct ``(hp, h)`` — what every
      increment probes. At CCNet scale the hottest paragraphs
      (boilerplate) appear in a corpus-proportional number of docs;
      storing one row per distinct hash keeps probe bytes
      |distinct hashes|-sized, and compaction collapses
      cross-increment repeats of a hash back to one row.
    - ``attrib`` (ATTRIBUTION): distinct ``(hp, h, id)`` containment
      pairs — read ONLY by :func:`paragraph_index_delete` (to find
      which hashes lost their last contributor) and by compaction
      (to physically drop a tombstoned doc's pairs). Deletion
      REWRITES the membership rows for dead hashes through the
      crash-safe partition swap, so the hot probe path stays a plain
      distinct-h read with no tombstone join.

    Legacy layouts keep working for reads: v1 (attributed rows inside
    ``paras``, no ``attrib`` table) probes with the tombstone
    anti-join as before; v0 (hash-only) probes plainly and refuses
    deletes until rebuilt."""
    spark = corpus.sparkSession
    _delete_path(spark, path)
    pairs = _para_slim(
        corpus, id_col, text_col, sep, spread_input=True
    ).select(
        "h", "id"
    ).distinct()
    pairs.select(
        F.pmod(F.col("h"), F.lit(index_buckets)).cast("int").alias("hp"),
        "h",
        _id_str("id").alias("id"),
    ).repartition(F.col("hp")).write.mode("overwrite").partitionBy(
        "hp"
    ).parquet(os.path.join(path, "attrib", "mb=base"))
    # membership derives from the just-written slim attribution table
    # (one corpus scan total, not two — the second pass reads (hp, h)
    # parquet, not the corpus text)
    spark.read.option(
        "basePath", os.path.join(path, "attrib")
    ).parquet(os.path.join(path, "attrib", "mb=base")).select(
        "hp", "h"
    ).distinct().repartition(F.col("hp")).write.mode(
        "overwrite"
    ).partitionBy("hp").parquet(os.path.join(path, "paras", "mb=base"))
    local_df(
        spark, [(sep, index_buckets)], "sep string, index_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta")
    )
    # identity layer: the paras table stores DISTINCT HASHES ONLY — a
    # re-ingested doc would silently lose every paragraph to itself;
    # the overlap guard needs an explicit ip=-bucketed id table
    _ids_write(
        corpus.select(_id_str(id_col).alias("id")).distinct(),
        path, "base", index_buckets,
    )
    _ids_init(spark, path, index_buckets)
    _manifest_add(
        spark, path, ["paras", "attrib", "ids", "idmeta"], "base"
    )


def paragraph_increment(
    shard: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    update_index: bool = False,
    update_label: str | None = None,
) -> DataFrame:
    """Paragraph-dedup a NEW shard against the persisted hash index: a
    shard paragraph survives iff it is NOT in the index AND this is
    its first (id, pos) occurrence WITHIN the shard — which equals the
    one-shot ``paragraph_dedup`` of corpus∪shard restricted to shard
    docs whenever arrival is id-ordered (the election is per-paragraph
    independent — no closure, no topology caveat). Output schema
    matches ``paragraph_dedup``; documents are reassembled from their
    surviving paragraphs."""
    if update_index:
        if not update_label or any(c in update_label for c in "/=%"):
            raise ValueError(
                "paragraph_increment: update_index=True needs a "
                f"filesystem-safe update_label, got {update_label!r}"
            )
        if update_label == "base":
            raise ValueError(
                "paragraph_increment: update_label 'base' is reserved "
                "for the build increment"
            )
    spark = shard.sparkSession
    rows = spark.read.parquet(os.path.join(path, "meta")).collect()
    if len(rows) != 1:
        raise ValueError(
            f"paragraph index at {path!r} has a corrupt meta table "
            f"({len(rows)} rows, expected 1)"
        )
    sep, index_buckets = rows[0].sep, rows[0].index_buckets

    new_ids = None
    id_buckets = None
    if update_index:
        # id-overlap detection (see substring_increment): a re-ingested
        # doc's paragraphs are all "already indexed" — the doc would
        # silently dedup against itself to empty
        id_buckets = _ids_buckets(spark, path, None)
        if id_buckets is not None:
            # cached: the combined collect below materializes it; the
            # guard join and the identity write reuse it
            new_ids = shard.select(
                _id_str(id_col).alias("id")
            ).distinct().persist()
            _register_cached(new_ids)

    slim = _para_slim(shard, id_col, text_col, sep).persist()
    _register_cached(slim)
    # ONE combined collect for the paragraph-hash probe prefixes and
    # (identity-tracked updates) the guard's id bucket prefixes — see
    # substring_increment for the fixed-cost-per-action measurement
    tagged = slim.select(
        F.pmod(F.col("h"), F.lit(index_buckets)).cast("int").alias("v"),
        F.lit(0).alias("t"),
    )
    if new_ids is not None:
        tagged = tagged.unionByName(
            new_ids.select(
                _ip(F.col("id"), id_buckets).alias("v"),
                F.lit(1).alias("t"),
            )
        )
    _pg = tagged.distinct().collect()
    probe_hps = [r.v for r in _pg if r.t == 0]
    if new_ids is not None:
        stored_ids = _read_id_table_probed(
            spark, path, _IDS_TABLE, new_ids, id_buckets, None,
            exclude_label=update_label,
            probe=[r.v for r in _pg if r.t == 1],
        ).select("id")
        _ids_overlap_guard(
            spark, path, new_ids, stored_ids, "paragraph_increment"
        )
    if update_index:
        # writer-touch discipline: heal any crashed delete-time
        # membership partition swap before reading/writing the table
        _heal_paras_swaps(spark, path)
    para_tbl = _read_increment_table(spark, path, "paras")
    if update_index:
        # replay exclusion — see substring_increment
        para_tbl = para_tbl.where(F.col("mb") != F.lit(update_label))
    if "id" in para_tbl.columns:
        # LEGACY v1 read-side (attributed rows inside paras, no attrib
        # table): a tombstoned doc's contributor rows stop suppressing
        # future occurrences via the anti-join. The split layout has
        # no id column here — deletion already rewrote membership, so
        # the hot probe is a plain distinct-h read
        para_tbl = _anti_tombstones(
            para_tbl, _read_tombstones(spark, path, None), "id"
        )
    idx_h = para_tbl.where(F.col("hp").isin(probe_hps)).select("h")
    fresh = slim.join(idx_h, "h", "left_anti")
    winners = fresh.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("win")
    )
    kept_pos = (
        winners.select(
            F.col("win.id").alias("id"), F.col("win.pos").alias("pos")
        )
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("pos")).alias("kept_pos"))
    )
    arr = F.transform(
        F.split(F.col(text_col), F.lit(sep)), lambda p: F.trim(p)
    )
    out = shard.join(
        kept_pos, shard[id_col] == kept_pos["id"], "left"
    ).drop("id")
    pos_set = F.coalesce("kept_pos", F.array().cast("array<int>"))
    kept_paras = F.filter(arr, lambda p, i: F.array_contains(pos_set, i))
    result = out.select(
        id_col,
        F.size(F.filter(arr, lambda p: F.length(p) > 0))
        .cast("long")
        .alias("n_paras"),
        F.size(pos_set).cast("long").alias("n_kept"),
        F.array_join(kept_paras, sep).alias("text"),
    )
    if update_index:
        result = result.localCheckpoint()  # pin before the index write
        # persisted: the attrib write and the membership write both
        # consume the distinct pairs — one distinct shuffle, not two
        pairs = slim.select("h", "id").distinct().persist()
        _register_cached(pairs)
        has_attrib = bool(
            _manifest_tables(spark, path, ["attrib"]).get("attrib", [])
        )
        tables = ["paras"]
        if has_attrib:
            # split layout: membership gets the shard's distinct
            # hashes only (probe-sized); the containment pairs go to
            # the attribution table deletes/compaction read
            pairs.select(
                F.pmod(F.col("h"), F.lit(index_buckets))
                .cast("int")
                .alias("hp"),
                "h",
                _id_str("id").alias("id"),
            ).repartition(F.col("hp")).write.mode(
                "overwrite"
            ).partitionBy("hp").parquet(
                os.path.join(path, "attrib", f"mb={update_label}")
            )
            membership = pairs.select("h").distinct().select(
                F.pmod(F.col("h"), F.lit(index_buckets))
                .cast("int")
                .alias("hp"),
                "h",
            )
            tables.append("attrib")
        else:
            # legacy v1 index: keep its layout — attributed rows
            # inside paras (read-side tombstone anti-join)
            membership = pairs.select(
                F.pmod(F.col("h"), F.lit(index_buckets))
                .cast("int")
                .alias("hp"),
                "h",
                _id_str("id").alias("id"),
            )
        membership.repartition(F.col("hp")).write.mode(
            "overwrite"
        ).partitionBy("hp").parquet(
            os.path.join(path, "paras", f"mb={update_label}")
        )
        if id_buckets is not None and new_ids is not None:
            _ids_write(new_ids, path, update_label, id_buckets)
            tables.append(_IDS_TABLE)
        _manifest_add(spark, path, tables, update_label)
    return _with_cached_deps(result, [slim])


# ---------------------------------------------------------------------------
# persisted BENCHMARK index for train/test decontamination
# ---------------------------------------------------------------------------

def benchmark_index_build(
    benchmark: DataFrame,
    path: str,
    text_col: str = "text",
    n: int = 3,
    index_buckets: int = 64,
) -> None:
    """Persist the benchmark set's globally-distinct word ``n``-gram
    shingles — (hp, sh), partitioned by (increment, hash-prefix). The
    benchmark is FIXED while the training corpus arrives daily, so the
    decontamination join's small side should be built exactly once;
    shingles persist as the RAW STRING (the one-shot operator's
    contract — byte-identical to the oracle; production would store
    ``xxhash64(sh)`` to shrink the index, same plan shape)."""
    from etl_prometheus2clickhouse_spark.operators.text import (
        _words,
        shingles_of_tokens,
    )

    spark = benchmark.sparkSession
    _delete_path(spark, path)
    sh = (
        spread(benchmark).select(_words(F.col(text_col)).alias("__toks"))
        .select(
            F.explode_outer(
                shingles_of_tokens(F.col("__toks"), n)
            ).alias("sh")
        )
        .where(F.col("sh").isNotNull())
        .distinct()
    )
    sh.select(
        F.pmod(F.xxhash64("sh"), F.lit(index_buckets)).cast("int").alias(
            "hp"
        ),
        "sh",
    ).repartition(F.col("hp")).write.mode("overwrite").partitionBy(
        "hp"
    ).parquet(os.path.join(path, "shingles", "mb=base"))
    local_df(
        spark, [(n, index_buckets)], "n int, index_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta")
    )
    _manifest_add(spark, path, ["shingles"], "base")


def decontaminate_increment(
    shard: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decontaminate a NEW corpus shard against the persisted
    benchmark index: contamination is pure membership against a fixed
    set, so the result equals the one-shot ``ngram_contamination`` of
    the shard against the original benchmark EXACTLY — no ordering or
    topology caveat of any kind (the simplest of the incremental
    faces). Output schema matches the one-shot operator."""
    from etl_prometheus2clickhouse_spark.operators.text import (
        _words,
        shingles_of_tokens,
    )

    spark = shard.sparkSession
    rows = spark.read.parquet(os.path.join(path, "meta")).collect()
    if len(rows) != 1:
        raise ValueError(
            f"benchmark index at {path!r} has a corrupt meta table "
            f"({len(rows)} rows, expected 1)"
        )
    n = rows[0].n
    bench_sh = _read_increment_table(spark, path, "shingles").select("sh")
    corpus_sh = (
        spread(shard).select(
            F.col(id_col), _words(F.col(text_col)).alias("__toks")
        )
        .select(
            F.col(id_col),
            (F.size("__toks") - (n - 1)).cast("bigint").alias(
                "n_shingles"
            ),
            F.array_distinct(
                shingles_of_tokens(F.col("__toks"), n)
            ).alias("__arr"),
        )
        .select(
            id_col, "n_shingles", F.explode_outer("__arr").alias("sh")
        )
        .where(F.col("sh").isNotNull())
    )
    hits = corpus_sh.join(bench_sh, "sh").groupBy(
        id_col, "n_shingles"
    ).agg(F.count(F.lit(1)).alias("n_contaminated"))
    return hits.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        (
            F.col("n_contaminated").cast("double") / F.col("n_shingles")
        ).alias("contamination_frac"),
    )
