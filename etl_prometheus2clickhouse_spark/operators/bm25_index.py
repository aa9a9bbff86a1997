"""Persisted incremental BM25 inverted index — the RETRIEVAL member of
the incremental-index layer (operators/dedup_index.py for near-dup
text; operators/ann_index.py for embedding search; this module for
lexical search).

:func:`operators.text.bm25_search` is one-shot: it re-tokenizes the
corpus and rebuilds the postings stream on every call. A RAG/retrieval
deployment instead builds the inverted index ONCE, appends each daily
shard, and serves many queries against the persisted postings — the
classic search-engine lifecycle (Robertson-Spärck Jones BM25 over an
inverted file; the architecture every Lucene-family system ships).
Layout under ``<path>``:

- ``postings/mb=<increment>/tp=<p>/…`` — ``(t, id, dl, tf)`` rows,
  PARTITIONED by the ingestion increment and the term-hash prefix
  ``tp = pmod(xxhash64(t), term_buckets)``. ALL postings of a term live
  in that term's single ``tp=`` bucket, so a query's probe set is the
  distinct prefixes of its own terms — bounded by
  ``min(n_query_terms, term_buckets)`` literals, pushed as a PARTITION
  filter: non-probed directories are pruned at file-listing time and
  df(t) is complete from the probed buckets alone (the band-index
  ``bb=`` discipline applied to retrieval).
- ``stats/mb=<increment>`` — ONE row per increment:
  ``(n_docs, sum_dl)``. Corpus statistics are ADDITIVE (counter
  linearity — the CMS-merge discipline), so N and avgdl at query time
  are exact sums over live increments; zero-token documents count here
  even though they emit no postings, exactly as the one-shot's
  ``avg(dl)`` ranges over every corpus row.
- ``meta/mb=base`` — one row: ``term_buckets``. Geometry is index
  state, not a probe parameter (the sketch-geometry fail-loud
  contract); ``k1``/``b``/``k`` remain query-time parameters because
  they never affect the stored postings. :func:`bm25_index_rebucket`
  is the geometry-migration lifecycle event (re-derives ``tp`` from
  the stored postings at a new bucket count; one-commit swap).
- ``ids/mb=<increment>/ip=<p>`` + ``idmeta`` — the identity layer:
  one ``(id, dl)`` row per document, id-hash-bucketed. Appends probe
  it (partition-pruned) and FAIL LOUD on id overlap; deletes read
  ``dl`` here to write their negative stats row.
- ``tombstones/mb=<label>/ip=<p>`` — deleted ids
  (:func:`bm25_index_delete`); searches anti-join it, compaction
  physically drops tombstoned rows and clears it.

Equivalence contract (EXACT, like the semantic index's): for
id-disjoint increments, :func:`bm25_index_search` over the live index
returns EXACTLY what :func:`operators.text.bm25_search` returns on the
union corpus MINUS tombstoned docs — tf/dl are per-document facts,
df/N/sum_dl are disjoint sums (deletes subtract via negative rows:
counter linearity runs both directions), and the scoring arithmetic is
identical term for term. Disjoint shards are the layer's shared
contract, and DETECTED here: an overlapping append fails loud instead
of silently double-counting df and N.

Scale shape: probe work is ``|query terms' buckets| / term_buckets`` of
the postings bytes (witnessed byte-counted in scripts/scale_smoke.py);
increments land in their own ``mb=`` directory (OVERWRITE + manifest
commit ⇒ at-least-once replay idempotent, the dedup-index atomicity
contract); compaction folds increments back to one directory per table
and ``index_vacuum`` reclaims superseded dirs. Hot terms (stopwords)
concentrate rows in one bucket's files but never in one TASK — the
probed read re-splits by parquet row groups, and scoring aggregates by
(query, doc) with map-side combine, so a hot term costs bytes, not a
straggler.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.localframe import local_df
from etl_prometheus2clickhouse_spark.partitioning import spread
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _anti_tombstones,
    _commit_manifest,
    _compact_increment_table,
    _delete_path,
    _id_str,
    _ids_buckets,
    _ip,
    _ids_init,
    _ids_overlap_guard,
    _ids_write,
    _manifest_add,
    _manifest_tables,
    _pinned_live,
    _read_id_table_probed,
    _read_pinned_table,
    _read_tombstones,
    _set_manifest_table,
    _tomb_write,
)
from etl_prometheus2clickhouse_spark.operators.text import (
    _guard_model_rows,
    _words,
)


def _tp(term_col, term_buckets: int):
    """Partition prefix of a term — the ``bb``/``ip`` discipline for the
    postings table: every posting of a term lands in one
    ``tp = pmod(xxhash64(t), term_buckets)`` directory, so a query's
    probe set (the distinct ``tp`` of its own terms) is a complete
    cover for both tf and df of those terms."""
    return F.pmod(F.xxhash64(term_col), F.lit(term_buckets)).cast("int")


def _validate_label(label: str | None, fn: str) -> None:
    if not label or any(c in label for c in "/=%"):
        raise ValueError(
            f"{fn}: needs a filesystem-safe increment label, got {label!r}"
        )
    if label == "base":
        raise ValueError(
            f"{fn}: label 'base' is reserved for the build increment"
        )


def _write_increment(
    df: DataFrame,
    path: str,
    label: str,
    text_col: str,
    id_col: str,
    term_buckets: int,
    require_tokens: bool = False,
    id_buckets: int | None = None,
    spread_input: bool = False,
    guard_live: "dict[str, list[str]] | None" = None,
    guard: bool = False,
) -> None:
    """Land one increment's postings (term-prefix-partitioned, clustered
    on the partition key first — the band-table small-files lesson) and
    its additive one-row stats frame in their own ``mb=`` directories.
    OVERWRITE mode makes an at-least-once replay idempotent; the
    directories go live only through the caller's manifest commit.

    An increment with zero postings (empty shard, or all-empty texts)
    is legal: its postings directory holds no files — harmless beside
    the build's — and its stats row still counts the documents. The
    BUILD is the exception (``require_tokens``): a base with zero
    postings would leave every future read schemaless, so it fails
    loud instead.

    ``guard=True`` (appends; needs ``id_buckets``) runs the id-overlap
    guard HERE, between the tokenize and the first write: the guard's
    probe bucket list rides the stats aggregate (one combined collect
    instead of a separate shard id scan + probe collect — each driver
    action costs ~0.1-1 s of fixed planning/scheduling overhead), and
    an overlap still fails loud before anything lands."""
    spark = df.sparkSession
    # tokenize the shard ONCE: the stats collect materializes the
    # cache, and the postings write + the identity write reuse it (an
    # uncached plan would run the tokenizer three times per increment —
    # the round-14 append-regression's biggest fixed cost)
    # spread only the corpus-sized BUILD input: a single-split corpus
    # scan would tokenize serially, but an increment shard is small and
    # its postings write re-repartitions anyway — spreading it costs a
    # fixed exchange per append (measured 1.2× on bm25_increment)
    if spread_input:
        df = spread(df)
    toks = df.select(
        F.col(id_col).alias("id"), _words(F.col(text_col)).alias("toks")
    ).persist()
    try:
        # one additive stats row per increment — N and sum_dl range
        # over EVERY document (zero-token docs emit no postings but do
        # count here, exactly like the one-shot's avg over all corpus
        # rows); collected so the build can validate, written
        # driver-local
        want_guard = guard and id_buckets is not None
        aggs = [
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias(
                "sum_dl"
            ),
        ]
        if want_guard:
            # the guard's probe bucket list rides the stats pass —
            # bounded by id_buckets distinct ints
            aggs.append(F.collect_set("ip").alias("ips"))
        st = toks.select(
            F.size("toks").cast("long").alias("dl"),
            _ip(_id_str("id"), id_buckets or 1).alias("ip"),
        ).agg(*aggs).collect()[0]
        if require_tokens and st.sum_dl == 0:
            raise ValueError(
                "bm25_index_build: the corpus has no tokens — an index "
                "whose base increment holds zero postings has no "
                "readable postings schema; build from a corpus with "
                "text"
            )
        if want_guard:
            stored = _read_id_table_probed(
                spark, path, "ids", None, id_buckets, guard_live,
                exclude_label=label, probe=sorted(st.ips),
            ).select("id")
            _ids_overlap_guard(
                spark, path,
                toks.select(_id_str("id").alias("id")).distinct(),
                stored, "bm25_index_append",
            )
        posts = (
            toks.select(
                "id", F.size("toks").alias("dl"),
                F.explode("toks").alias("t"),
            )
            .groupBy("t", "id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        posts.select(
            _tp(F.col("t"), term_buckets).alias("tp"), "t", "id", "dl",
            "tf",
        ).repartition(F.col("tp")).write.mode("overwrite").partitionBy(
            "tp"
        ).parquet(os.path.join(path, "postings", f"mb={label}"))
        local_df(
            spark,
            [(int(st.n_docs), int(st.sum_dl))],
            "n_docs long, sum_dl long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "stats", f"mb={label}")
        )
        if id_buckets is not None:
            # the identity-layer rows: one (id, dl) per document — the
            # overlap guard probes these (postings can't serve: they
            # are term-bucketed, and zero-token docs emit none) and a
            # delete reads dl here to write its negative stats row
            _ids_write(
                toks.select(
                    _id_str("id").alias("id"),
                    F.size("toks").cast("long").alias("dl"),
                ),
                path, label, id_buckets,
            )
    finally:
        toks.unpersist()


def _read_meta(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None" = None,
) -> int:
    rows = (
        _read_pinned_table(spark, path, "meta", live)
        .select("term_buckets")
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(
            f"bm25 index at {path!r} has a corrupt meta table "
            f"({len(rows)} rows, expected 1)"
        )
    return int(rows[0].term_buckets)


def bm25_index_build(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_buckets: int = 64,
    id_buckets: int = 64,
) -> None:
    """Tokenize the corpus once and persist the term-prefix-partitioned
    postings + the additive stats row + the geometry meta row, committed
    live through the versioned manifest. A build is a semantic overwrite
    of the whole index (stale increments cleared first).

    ``term_buckets`` is the 100 TB knob: a query probes
    ``|its terms' buckets| / term_buckets`` of the postings bytes, so
    buckets should scale with the index size the way the band index's
    ``index_buckets`` does."""
    if term_buckets < 1:
        raise ValueError(
            f"bm25_index_build: term_buckets must be ≥ 1, got {term_buckets}"
        )
    spark = corpus.sparkSession
    _delete_path(spark, path)
    _write_increment(
        corpus, path, "base", text_col, id_col, term_buckets,
        require_tokens=True, id_buckets=id_buckets, spread_input=True,
    )
    local_df(
        spark, [(int(term_buckets),)], "term_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta", "mb=base")
    )
    _ids_init(spark, path, id_buckets)
    _manifest_add(
        spark, path, ["postings", "stats", "meta", "ids", "idmeta"], "base"
    )


def bm25_index_append(
    shard: DataFrame,
    path: str,
    label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append an id-DISJOINT shard under the index's stored geometry:
    postings + stats + identity rows land in the shard's own
    ``mb=<label>`` directory (OVERWRITE ⇒ replay idempotent) and go
    live in one manifest commit — a crash between the write and the
    commit leaves an invisible, replay-overwritten directory, never a
    half-registered increment.

    Id-disjointness is DETECTED, not assumed: the shard's ids probe the
    ``ip=``-bucketed identity table (a partition filter — sketch-sized
    work, zero postings cost) and an overlap fails loud before anything
    is written, because an overlapping document would silently
    double-count df and N in every future score. The probe excludes the
    increment's own label, so an at-least-once replay of THIS append
    still passes. Indexes built before the identity layer (no
    ``idmeta``) keep their original documented-not-detected semantics
    until rebuilt."""
    _validate_label(label, "bm25_index_append")
    spark = shard.sparkSession
    live = _pinned_live(spark, path)
    term_buckets = _read_meta(spark, path, live)
    id_buckets = _ids_buckets(spark, path, live)
    # the overlap guard runs INSIDE _write_increment (guard=True): its
    # probe bucket list rides the stats aggregate's collect, so an
    # append costs one shard tokenize + one combined collect + the
    # guard read — not a separate id scan and probe collect
    _write_increment(
        shard, path, label, text_col, id_col, term_buckets,
        id_buckets=id_buckets, guard_live=live, guard=True,
    )
    _manifest_add(
        spark, path,
        ["postings", "stats"] + (["ids"] if id_buckets is not None else []),
        label,
    )


def bm25_index_search(
    queries: DataFrame,
    path: str,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_query_terms: int = 1_000_000,
    at_version: "int | None" = None,
) -> DataFrame:
    """BM25 top-k against the PERSISTED index — identical scoring
    arithmetic to :func:`operators.text.bm25_search` (idf
    ``ln(1 + (N-df+0.5)/(df+0.5))``, tf saturation, length norm), with
    the corpus work replaced by index reads:

    - postings come from ONLY the query terms' ``tp=`` partitions (the
      probe set is collected bounded — ≤ min(n_terms, term_buckets)
      literals — and pushed as a partition filter);
    - df(t) aggregates over the probed buckets, which contain every
      posting of the probed terms by construction;
    - N and avgdl are exact sums of the per-increment stats rows
      (bounded by the live-increment count; one row after compaction).

    Output ``(query_id, doc_id, bm25 rounded to 6, rank)`` — EXACTLY
    the one-shot's frame on the union corpus (module docstring has the
    argument). The manifest is resolved ONCE per search and every
    table read from that snapshot (:func:`.dedup_index.
    _read_pinned_table`), so a commit landing mid-query can never mix
    one version's postings with another's corpus stats.

    ``at_version`` pins the search to a RETAINED manifest version
    (:func:`.dedup_index.index_snapshot`) — the time-travel read:
    the result is exactly the one-shot BM25 on the corpus as of that
    commit, later appends/deletes invisible (tombstone visibility
    binds to the snapshot too). Versions survive until pruned from
    the manifest window or reclaimed by ``index_vacuum``."""
    spark = queries.sparkSession
    if at_version is not None:
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            index_snapshot,
        )

        live = index_snapshot(spark, path, at_version)
    else:
        live = _pinned_live(spark, path)
    term_buckets = _read_meta(spark, path, live)
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(F.col(terms_col))).alias("t"),
    )
    # ONE aggregate serves both the query-size guard (the
    # _guard_model_rows contract: the query side is broadcast, so a
    # corpus-sized "queries" frame must fail loud, not OOM) and the
    # probe set — distinct term prefixes, bounded by term_buckets
    # literals, pushed as a PARTITION filter so the postings read
    # prunes file listings to those directories
    g = qterms.agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set(_tp(F.col("t"), term_buckets)).alias("tps"),
    ).collect()[0]
    if g.n > max_query_terms:
        raise ValueError(
            "bm25_index_search: exploded query-term list exceeds the "
            f"broadcast cap ({max_query_terms} rows) — the model/"
            "reference side must be reference-sized (it is broadcast "
            "to every task). Shrink the reference or raise the cap "
            "only with matching driver/executor memory."
        )
    probe = sorted(g.tps)
    postings = (
        _read_pinned_table(spark, path, "postings", live)
        .where(F.col("tp").isin(probe) if probe else F.lit(False))
        .select("t", "id", "dl", "tf")
    )
    # deleted docs: their postings are anti-joined out (so tf AND df
    # exclude them) and their (1, dl) was already subtracted from the
    # additive stats by the delete's negative row — the live index
    # scores EXACTLY the one-shot on the reduced corpus
    postings = _anti_tombstones(
        postings, _read_tombstones(spark, path, live), "id"
    )
    stats = _read_pinned_table(spark, path, "stats", live).agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        (
            F.sum("sum_dl").cast("double")
            / F.sum("n_docs").cast("double")
        ).alias("avgdl"),
    )
    df_t = postings.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        postings.join(F.broadcast(qterms), "t")
        .join(df_t, "t")
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            F.col("id").alias(id_col),
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w_rank).cast("int")
    ).where(F.col("rank") <= k)


def bm25_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    label: str,
    id_col: str = "doc_id",
) -> dict:
    """Tombstone documents out of the live index — the takedown /
    retraction / right-to-be-forgotten lifecycle event. Physical bytes
    are reclaimed later by compaction; the SEARCH contract holds
    immediately: after the commit, :func:`bm25_index_search` returns
    EXACTLY the one-shot BM25 on the reduced corpus, because

    - the deleted docs' postings are anti-joined out of every probed
      read (tf and df both shrink), and
    - their ``(1, dl)`` contribution is subtracted from the additive
      corpus stats by a NEGATIVE stats row written under the same
      manifest commit (counter linearity works in both directions).

    The delete set is resolved against the identity table first
    (``ip=``-pruned — sketch-sized work): ids not live in the index are
    ignored, ids already tombstoned are not double-subtracted, and a
    replayed delete (same label) recomputes the identical rows into its
    own OVERWRITE-mode directory. A tombstoned id stays "occupied" for
    the append-overlap guard until compaction physically removes it —
    the delete → compact → re-ingest lifecycle. Requires the identity
    layer (indexes built before it must be rebuilt once).

    Returns ``{deleted_docs, deleted_tokens}`` (the subtraction the
    stats row carries)."""
    _validate_label(label, "bm25_index_delete")
    live = _pinned_live(spark, path)
    id_buckets = _ids_buckets(spark, path, live)
    if id_buckets is None:
        raise ValueError(
            f"bm25_index_delete: the index at {path!r} predates the "
            "identity layer (no idmeta table) — rebuild it once with "
            "bm25_index_build to enable deletes"
        )
    want = ids.select(_id_str(id_col).alias("id")).distinct()
    present = _read_id_table_probed(
        spark, path, "ids", want, id_buckets, live,
        empty_schema="id string, dl long",
    ).select("id", "dl").join(want, "id", "leftsemi")
    # already-tombstoned ids must not be double-subtracted — anti-join
    # PRIOR tombstones only: a replayed delete (same label) must not
    # see its own first attempt's rows as "already deleted" (that would
    # zero the recomputed negative stats row it is about to overwrite)
    tomb_prior = None
    if live is not None and live.get("tombstones"):
        prior = [d for d in live["tombstones"] if d != f"mb={label}"]
        if prior:
            root = os.path.join(path, "tombstones")
            tomb_prior = spark.read.option("basePath", root).parquet(
                *[os.path.join(root, d) for d in prior]
            ).select("id")
    # persisted: the stats aggregate and the tombstone write both
    # consume the pruned resolve join — one computation, not two
    effective = _anti_tombstones(present, tomb_prior, "id").persist()
    st = effective.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sdl"),
    ).collect()[0]
    _tomb_write(spark, path, effective.select("id"), label, id_buckets)
    effective.unpersist()
    local_df(
        spark,
        [(-int(st.n), -int(st.sdl))],
        "n_docs long, sum_dl long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "stats", f"mb=del-{label}")
    )
    tables = _manifest_tables(
        spark, path,
        ["postings", "stats", "meta", "ids", "idmeta", "tombstones"],
    )
    for t, d in (("tombstones", f"mb={label}"), ("stats", f"mb=del-{label}")):
        dirs = set(tables.get(t, []))
        dirs.add(d)
        tables[t] = sorted(dirs)
    _commit_manifest(spark, path, tables)
    return {"deleted_docs": int(st.n), "deleted_tokens": int(st.sdl)}


def bm25_index_rebucket(
    spark: SparkSession, path: str, term_buckets: int
) -> dict:
    """GEOMETRY MIGRATION for the postings layout — the
    :func:`.dedup_index.minhash_index_reband` analog: re-derive every
    live posting's ``tp`` partition at a NEW bucket count from the
    STORED postings (``tp`` is a pure function of ``t`` — no corpus
    re-read, no re-tokenization) and swap postings + meta in ONE atomic
    manifest commit, so a reader resolving at any moment prunes with
    the geometry its postings were written under. Search results are
    IDENTICAL before and after (same rows, new layout); what changes is
    the probe economics — a vocabulary that outgrew its bucket count
    gets its ``|query terms' buckets| / term_buckets`` bound back.
    Stats / identity / tombstone tables are untouched. Superseded dirs
    are reclaimed by :func:`.dedup_index.index_vacuum`."""
    import uuid

    if term_buckets < 1:
        raise ValueError(
            f"bm25_index_rebucket: term_buckets must be ≥ 1, "
            f"got {term_buckets}"
        )
    live = _pinned_live(spark, path)
    old_buckets = _read_meta(spark, path, live)
    label = f"rebucket-{uuid.uuid4().hex[:8]}"
    posts = _read_pinned_table(spark, path, "postings", live).select(
        "t", "id", "dl", "tf"
    )
    posts.select(
        _tp(F.col("t"), term_buckets).alias("tp"), "t", "id", "dl", "tf"
    ).repartition(F.col("tp")).write.mode("overwrite").partitionBy(
        "tp"
    ).parquet(os.path.join(path, "postings", f"mb={label}"))
    local_df(
        spark, [(int(term_buckets),)], "term_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta", f"mb={label}")
    )
    n = spark.read.parquet(
        os.path.join(path, "postings", f"mb={label}")
    ).count()
    tables = _manifest_tables(
        spark, path,
        ["postings", "stats", "meta", "ids", "idmeta", "tombstones"],
    )
    tables["postings"] = [f"mb={label}"]
    tables["meta"] = [f"mb={label}"]
    _commit_manifest(spark, path, tables)
    return {
        "term_buckets_old": int(old_buckets),
        "term_buckets_new": int(term_buckets),
        "posting_rows": int(n),
    }


def bm25_index_compact(
    spark: SparkSession,
    path: str,
    exclude_labels: set[str] | None = None,
) -> dict:
    """Fold accumulated ``mb=`` increments into one directory per table
    via the manifest swap (atomic for readers; run
    :func:`.dedup_index.index_vacuum` afterwards to reclaim superseded
    dirs). The meta/idmeta tables are never folded (the model-table
    rule). ``exclude_labels`` is the streaming replay guard (see
    :func:`.dedup_index._compact_increment_table`).

    Deletion integration: the postings/identity folds PHYSICALLY DROP
    tombstoned rows, the stats fold nets every additive row (negative
    delete rows included) into one, and the tombstone table is cleared
    LAST — so a reader resolving between the commits sees either the
    old rows + live tombstones (anti-joined out) or the reduced rows +
    live tombstones (no-op), never a resurrected document. With
    ``exclude_labels`` (an in-flight streaming batch) tombstones are
    kept, since excluded increments were not rewritten."""
    live = _pinned_live(spark, path)
    tomb = _read_tombstones(spark, path, live)

    def _drop_tombstoned(rows: DataFrame) -> DataFrame:
        return _anti_tombstones(rows, tomb, "id")

    # Physical drop ONLY when the tombstone table is cleared in the
    # same pass: with exclude_labels tombstones stay live, and dropping
    # identity rows while the tombstone survives would let a re-ingest
    # pass the overlap guard yet be anti-joined out of every search —
    # then lost for good at the next full compaction.
    drop = _drop_tombstoned if not exclude_labels else None

    def _net_stats(rows: DataFrame) -> DataFrame:
        return rows.agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias(
                "n_docs"
            ),
            F.coalesce(F.sum("sum_dl"), F.lit(0)).cast("long").alias(
                "sum_dl"
            ),
        )

    out = {
        "posting_rows": _compact_increment_table(
            spark, path, "postings", "tp", exclude_labels=exclude_labels,
            transform=drop,
        ),
        "stats_rows": _compact_increment_table(
            spark, path, "stats", None, exclude_labels=exclude_labels,
            transform=_net_stats,
        ),
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
