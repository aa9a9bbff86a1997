"""Streaming incremental curation: the curation funnel as a durable
``foreachBatch`` pipeline over the persisted MinHash index.

The one-shot funnel (plans/catalog.py ``curation_funnel``) re-reads the
whole corpus per run. A crawl pipeline instead receives micro-batches
and must curate each one against everything already ingested. This
module chains the round-11 incremental dedup into that lifecycle:

per micro-batch (at-least-once, batch-id-keyed — the
``sketch_stream.run_partial_stream_durable`` discipline):

1. **incremental near-dup dedup** — ``dedup_increment`` probes the
   persisted band index with ONLY this batch's buckets and updates the
   index under the batch's own ``mb=b<id>`` increment directory
   (OVERWRITE, so a replayed batch is idempotent); a batch doc is a
   ``duplicate`` iff its duplicate component contains an earlier doc
   (keep-first semantics — with batches arriving in ascending id
   order this equals the one-shot min-id election, which is what the
   equivalence pytest and the catalog oracle check);
2. **benchmark decontamination** (optional) — canonical docs probe
   the persisted benchmark shingle index (pure membership against a
   FIXED set — order-independent, no divergence class of its own);
   a doc sharing n-grams with the benchmark → ``contaminated``;
3. **Gopher quality filter** — the survivors pass through the same
   shuffle-free rule select as the batch operator → ``quality``;
4. **LM perplexity scoring** — survivors are scored under the bigram
   model of a FIXED reference corpus (broadcast, count-guarded — the
   reference is decided before the stream starts, exactly like a real
   CCNet deployment ships a frozen KenLM) against a FIXED threshold →
   ``perplexity_tail``. A corpus-level tercile cut is deliberately NOT
   computed per batch: terciles over a prefix of the stream would
   re-label earlier batches retroactively — a fixed cutoff is the
   streaming-sane contract, and the one-shot equivalence oracle uses
   the same cutoff;
5. the batch's ``(doc_id, disposition)`` rows land in the batch's own
   ``mb=<id>`` partition of the dispositions directory, under a
   streaming CHECKPOINT — stop/restart resumes with only unseen input
   (kill-and-restart pinned by tests/test_streaming_curation.py).

Divergence contract (same stance as the funnel late-arrival matrix,
tests/test_streaming_funnel_semantics.py): a LATER batch that
transitively merges two already-kept documents' clusters cannot
retroactively re-label them — dispositions are append-only and
monotone. The one-shot recomputation is the authority; on id-ordered
batches without cross-batch transitive merges the two are EQUAL, which
the pytest and catalog oracle pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MB = "mb"

# interleave key salt for the published shard table: 12345 + 7919 —
# the mix_corpora source-0 mix_key addend, so the funnel's published
# keys are the single-source corpus_mix keys and an auditor (or the
# one-shot oracle) recomputes them with the same exact SQL arithmetic
_SHARD_KEY_SALT = 20264

# target rows per file of a (doc_id, disposition)-shaped batch write —
# small batches still land as one file, a very large micro-batch fans
# out instead of serializing through one task
_DISP_ROWS_PER_FILE = 1_000_000


def _disp_partitions(n_rows: int) -> int:
    """Partition count for a batch's disposition write, proportional to
    its row count (the ``mb=`` overwrite contract is partition-count-
    agnostic, so this is purely a write-parallelism knob)."""
    return max(1, min(256, -(-int(n_rows) // _DISP_ROWS_PER_FILE)))


def _maintain_curation_stores(
    spark, batch_id: int, dispositions_dir: str, index_path: str,
    para_index_path: str | None, max_live_dirs: int,
    serve_index_path: str | None = None,
    ann_serve_index_path: str | None = None,
) -> None:
    """The streaming lifecycle's scheduled compaction + vacuum: when
    any tracked surface's live-unit count reaches ``max_live_dirs``
    (batch partition dirs for the dispositions output, manifest-listed
    increments for the indexes), fold it back down. Runs at the START
    of a batch body, BEFORE the batch's own increments exist, and
    still excludes the in-flight batch's label defensively — on a
    replay the batch's directories from the crashed first attempt DO
    exist, are not checkpoint-committed, and will be overwritten, so
    folding them would double their rows. Crash-safe end to end: the
    dispositions fold is the staged ``.compact-*`` protocol
    (recover_stream_outputs heals any window), index folds are atomic
    manifest commits, and ``index_vacuum`` only deletes directories no
    committed manifest references."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_compact,
    )
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_compact,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        index_live_increments,
        index_vacuum,
        minhash_index_compact,
        paragraph_index_compact,
    )
    from etl_prometheus2clickhouse_spark.streaming.retention import (
        compact_stream_outputs,
        live_batch_dirs,
    )

    guard = {f"b{int(batch_id)}"}
    if live_batch_dirs(spark, dispositions_dir, _MB) >= max_live_dirs:
        compact_stream_outputs(
            spark, dispositions_dir, partition_col=_MB, keep_latest=1
        )
    for path, compact in (
        (index_path, minhash_index_compact),
        (para_index_path, paragraph_index_compact),
        (serve_index_path, bm25_index_compact),
        (ann_serve_index_path, ann_index_compact),
    ):
        if path is None:
            continue
        live = index_live_increments(spark, path)
        # single-row geometry tables legitimately stay at one dir per
        # lifecycle event — only data tables trigger the fold
        live.pop("meta", None)
        live.pop("model", None)
        live.pop("idmeta", None)
        if live and max(live.values()) >= max_live_dirs:
            compact(spark, path, exclude_labels=guard)
            index_vacuum(spark, path)


def curation_batch_body(
    index_path: str,
    reference: DataFrame,
    dispositions_dir: str,
    ppl_threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    para_index_path: str | None = None,
    bench_index_path: str | None = None,
    min_contaminated: int = 1,
    max_live_dirs: int | None = None,
    serve_index_path: str | None = None,
    ann_serve_index_path: str | None = None,
    serve_vec_dim: int = 32,
    shards_path: str | None = None,
    lm_model=None,
):
    """The ``foreachBatch`` body, factored out (the
    ``sketch_stream._durable_body`` pattern) so replay safety is
    directly testable: a second invocation with the same ``batch_id``
    overwrites the batch's index increments and its dispositions
    partition — never duplicates.

    With ``serve_index_path`` the funnel closes the curate → serve
    loop: each batch's KEPT documents (their post-paragraph-dedup
    text — the text the funnel's decisions were made on) are appended
    into a persisted BM25 inverted index
    (operators/bm25_index.py — built beforehand, e.g. from the seed's
    kept output) under the batch's own replay-idempotent ``mb=``
    label, so retrieval over exactly the curated corpus is live the
    moment the batch commits. A batch with zero kept documents still
    appends its (empty-postings, zero-docs) stats row — harmless and
    replay-stable.

    With ``ann_serve_index_path`` the DENSE retrieval leg is served
    too: each batch's kept documents are feature-hash embedded
    (``operators.text.hashed_doc_vectors`` — model-free, exactly the
    hybrid_search configuration at ``serve_vec_dim``) and appended
    into a persisted IVFADC index built beforehand over the seed's
    kept vectors (frozen quantizers — the ann_index_append contract),
    under the same replay-idempotent label. Together the two serve
    paths make HYBRID retrieval (BM25 + dense RRF) live over exactly
    the curated corpus at batch commit. All-zero hash vectors (empty
    text) are excluded on both the ingest and one-shot sides, so the
    serve index equals the one-shot encoding of the kept set.

    With ``shards_path`` the funnel closes the curate → PUBLISH loop:
    each batch's kept documents are merged into a persisted training
    shard table (:func:`.shards.shards_append` — receiving-shard-
    bounded sorted rewrite) under a deterministic interleave key
    (``(id · 2654435761 + 20264) mod 2^32`` — the ``mix_corpora``
    source-0 key, so an auditor recomputes it with one line of SQL).
    Bootstrap the table beforehand: ``write_training_shards`` over the
    seed's kept output with the same key expression (or
    ``write_shards_meta`` alone for an empty table). Replay safety
    comes from ``shards_append``'s converging merge — a re-delivered
    batch re-merges identical rows and drops them as exact duplicates,
    so at-least-once delivery yields the exactly-once table. The
    published table is a takedown target (kind ``shards``), closing
    curate → publish → right-to-be-forgotten end-to-end.

    With ``para_index_path`` the funnel runs FOUR stages — the full
    one-shot ``curation_funnel`` lineage: incremental PARAGRAPH dedup
    against the persisted hash index (operators/dedup_index.py
    ``paragraph_increment``, CCNet's first stage) rewrites each doc to
    its surviving paragraphs first; a doc that loses every paragraph
    is ``dedup_empty`` and never enters the near-dup index. The
    near-dup, Gopher, and LM stages then run on the REWRITTEN text —
    exactly how the one-shot funnel hands text between stages. Same
    monotone contract, same id-ordered equivalence (both indexes are
    keep-first under ascending ids).

    With ``bench_index_path`` a DECONTAMINATION stage runs between
    near-dup and Gopher: every canonical doc probes the persisted
    benchmark index (operators/dedup_index.py
    ``decontaminate_increment`` — pure membership against the FIXED
    benchmark shingle set, the exactest of the incremental faces) and
    a doc sharing ≥ ``min_contaminated`` word n-grams with the
    benchmark is labelled ``contaminated`` and never reaches the
    quality/LM stages. Membership against a fixed set is
    order-independent, so this stage adds NO divergence class of its
    own — the streamed labels equal the one-shot recomputation's on
    exactly the docs where the dedup stages already agree."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        cached_scope,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        decontaminate_increment,
        dedup_increment,
        paragraph_increment,
    )
    from etl_prometheus2clickhouse_spark.operators.text import (
        gopher_filter,
        lm_perplexity,
    )

    def body(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, text_col)
        if max_live_dirs is not None:
            _maintain_curation_stores(
                spark, batch_id, dispositions_dir, index_path,
                para_index_path, max_live_dirs, serve_index_path,
                ann_serve_index_path,
            )
        with cached_scope():
            label = f"b{int(batch_id)}"
            para_empty = None
            if para_index_path is not None:
                # paragraph_increment(update_index=True) already
                # returns a checkpointed frame (pinned before its own
                # index write) — checkpointing again here would pay a
                # second full materialization per batch
                pd = paragraph_increment(
                    batch_df,
                    para_index_path,
                    id_col=id_col,
                    text_col=text_col,
                    update_index=True,
                    update_label=label,
                )
                para_empty = pd.where(F.col("n_kept") == 0).select(id_col)
                batch_df = pd.where(F.col("n_kept") > 0).select(
                    id_col, F.col("text").alias(text_col)
                )
            empty = spark.createDataFrame([], batch_df.schema)
            inc = dedup_increment(
                empty,
                batch_df,
                index_path,
                id_col=id_col,
                text_col=text_col,
                update_index=True,
                update_label=label,
            ).localCheckpoint()  # decisions fixed before index writes land
            survivors = inc.where(F.col("is_canonical")).select(
                id_col, text_col
            )
            contaminated = None
            if bench_index_path is not None:
                contaminated = (
                    decontaminate_increment(
                        survivors,
                        bench_index_path,
                        text_col=text_col,
                        id_col=id_col,
                    )
                    .where(F.col("n_contaminated") >= min_contaminated)
                    .select(id_col)
                    .localCheckpoint()  # one probe, two consumers
                )
                survivors = survivors.join(
                    contaminated, id_col, "left_anti"
                )
            g = gopher_filter(survivors, text_col, id_col).select(
                id_col, "keep"
            )
            kept_quality = (
                survivors.join(g, id_col).where(F.col("keep"))
                .select(id_col, text_col)
            )
            ppl = lm_perplexity(
                kept_quality, reference, text_col, id_col, alpha=alpha,
                model=lm_model,
            ).select(id_col, "perplexity")
            publish_legs = sum(
                p is not None
                for p in (serve_index_path, ann_serve_index_path,
                          shards_path)
            )
            if publish_legs:
                # one LM scoring, N consumers (the contaminated
                # checkpoint pattern): the disposition write below and
                # the serve/publish appends here
                ppl = ppl.localCheckpoint()
                kept_docs = (
                    kept_quality.join(ppl, id_col)
                    .where(
                        (F.col("perplexity") <= ppl_threshold)
                        | F.col("perplexity").isNull()
                    )
                    .select(id_col, text_col)
                )
                if publish_legs > 1:
                    # several legs consume the kept set — pin it so
                    # the funnel upstream runs once, not per leg
                    kept_docs = kept_docs.localCheckpoint()
                if serve_index_path is not None:
                    from etl_prometheus2clickhouse_spark.operators.bm25_index import (  # noqa: E501
                        bm25_index_append,
                    )

                    bm25_index_append(
                        kept_docs, serve_index_path, label,
                        text_col=text_col, id_col=id_col,
                    )
                if ann_serve_index_path is not None:
                    from etl_prometheus2clickhouse_spark.operators.ann_index import (  # noqa: E501
                        ann_index_append,
                    )
                    from etl_prometheus2clickhouse_spark.operators.text import (  # noqa: E501
                        hashed_doc_vectors,
                    )

                    kept_vecs = (
                        hashed_doc_vectors(
                            kept_docs, dim=serve_vec_dim,
                            text_col=text_col, id_col=id_col,
                        )
                        .where(F.exists("vec", lambda x: x != 0))
                        .select(
                            F.col(id_col),
                            F.transform(
                                "vec", lambda v: v.cast("double")
                            ).alias("embedding"),
                        )
                    )
                    ann_index_append(
                        kept_vecs, ann_serve_index_path, label,
                        id_col=id_col, vec_col="embedding",
                    )
                if shards_path is not None:
                    from etl_prometheus2clickhouse_spark.operators.sampling import (  # noqa: E501
                        sample_bucket,
                    )
                    from etl_prometheus2clickhouse_spark.operators.shards import (  # noqa: E501
                        read_shards_meta,
                        shards_append,
                    )

                    smeta = read_shards_meta(spark, shards_path)
                    if smeta is None:
                        raise ValueError(
                            "shards_path needs a bootstrapped table — "
                            "write_training_shards over the seed's "
                            "kept output (or write_shards_meta for an "
                            f"empty table) at {shards_path!r} first"
                        )
                    rows = kept_docs.select(
                        F.col(id_col),
                        F.col(text_col),
                        sample_bucket(id_col, salt=_SHARD_KEY_SALT)
                        .cast("long")
                        .alias(smeta["order_col"]),
                    )
                    shards_append(spark, shards_path, rows, label)
            base = inc.select(id_col, "is_canonical")
            if contaminated is not None:
                base = base.join(
                    contaminated.withColumn("__cont", F.lit(True)),
                    id_col,
                    "left",
                )
            else:
                base = base.withColumn("__cont", F.lit(False))
            disp = (
                base.join(g, id_col, "left")
                .join(ppl, id_col, "left")
                .select(
                    F.col(id_col),
                    F.when(~F.col("is_canonical"), F.lit("duplicate"))
                    .when(
                        F.coalesce("__cont", F.lit(False)),
                        F.lit("contaminated"),
                    )
                    .when(~F.coalesce("keep", F.lit(False)), F.lit("quality"))
                    .when(
                        F.col("perplexity") > ppl_threshold,
                        F.lit("perplexity_tail"),
                    )
                    .otherwise(F.lit("kept"))
                    .alias("disposition"),
                )
            )
            if para_empty is not None:
                disp = disp.unionByName(
                    para_empty.select(
                        F.col(id_col),
                        F.lit("dedup_empty").alias("disposition"),
                    )
                )
            # size-conditional: every batch doc gets exactly one
            # disposition row, and `inc` is already checkpointed, so
            # its count is the cheap proxy for the write's row count
            # (one combined count job, not one per source)
            cnt = inc.select(F.lit(1).alias("one"))
            if para_empty is not None:
                cnt = cnt.unionByName(
                    para_empty.select(F.lit(1).alias("one"))
                )
            n_rows = cnt.count()
            disp.coalesce(_disp_partitions(n_rows)).write.mode(
                "overwrite"
            ).parquet(f"{dispositions_dir}/{_MB}={int(batch_id)}")

    return body


def run_streaming_curation(
    src: DataFrame,
    index_path: str,
    reference: DataFrame,
    dispositions_dir: str,
    checkpoint_dir: str,
    ppl_threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    para_index_path: str | None = None,
    bench_index_path: str | None = None,
    min_contaminated: int = 1,
    max_live_dirs: int | None = None,
    serve_index_path: str | None = None,
    ann_serve_index_path: str | None = None,
    serve_vec_dim: int = 32,
    shards_path: str | None = None,
) -> None:
    """Run ``src`` (a streaming frame of documents) to completion of
    currently-available input (AvailableNow) through
    :func:`curation_batch_body` under ``checkpoint_dir``. Restartable:
    stop mid-stream, call again with the same checkpoint, and only
    unseen input is processed — already-written dispositions and index
    increments stay put.

    ``max_live_dirs`` schedules compaction + vacuum INSIDE the
    lifecycle (:func:`_maintain_curation_stores`): without it the
    dispositions directory and every index manifest accrete one unit
    per micro-batch until an operator remembers to compact — the
    listing itself becomes the bottleneck on a long-running stream.
    ``serve_index_path`` closes the curate → serve loop: each batch's
    kept documents are appended to a persisted BM25 index;
    ``ann_serve_index_path`` additionally serves the DENSE leg
    (feature-hashed vectors into a persisted IVFADC index), making
    hybrid retrieval live over the curated corpus; ``shards_path``
    closes the curate → PUBLISH loop — kept documents merge into a
    persisted training shard table, replay-convergent (see
    :func:`curation_batch_body`)."""
    from etl_prometheus2clickhouse_spark.operators.text import (
        lm_reference_model,
    )

    from etl_prometheus2clickhouse_spark.streaming.batchconf import (
        batch_job_conf,
    )

    # the reference is FROZEN before the stream starts (the CCNet
    # frozen-KenLM contract), so its bigram model is built ONCE here
    # and every micro-batch broadcasts the stored tables — inline, the
    # model aggregates + guard count re-ran per batch as pure fixed
    # cost (scores are a pure function of the counts: bit-identical).
    # Built BEFORE the batch_job_conf scope: the reference is
    # corpus-sized and wants the session's batch-scale planning.
    lm_model = lm_reference_model(reference, text_col)
    with batch_job_conf(src.sparkSession):
        q = (
            src.writeStream.foreachBatch(
                curation_batch_body(
                    index_path,
                    reference,
                    dispositions_dir,
                    ppl_threshold,
                    id_col,
                    text_col,
                    alpha,
                    para_index_path,
                    bench_index_path,
                    min_contaminated,
                    max_live_dirs,
                    serve_index_path,
                    ann_serve_index_path,
                    serve_vec_dim,
                    shards_path,
                    lm_model=lm_model,
                )
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_dispositions(spark: SparkSession, dispositions_dir: str) -> DataFrame:
    """All batches' dispositions as one frame (``mb`` restored as the
    micro-batch partition column). PURE — readers never mutate the
    directory (a reader running recovery would race an in-flight
    compaction's staging dir); an interrupted retention fold is
    repaired by the next WRITER touch (streaming/retention.py
    ``recover_stream_outputs``, run at every compaction start), until
    which a reader sees the folded batches missing — the documented
    reader-visible window."""
    return spark.read.parquet(dispositions_dir)


def _maintain_vector_store(
    spark, batch_id: int, index_path: str, compact,
    dispositions_dir: str | None, max_live_dirs: int,
) -> None:
    """Vector-index flavor of :func:`_maintain_curation_stores` —
    same cadence trigger, same in-flight-batch replay guard, the
    caller supplies the index's compact function (semantic or ANN)."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        index_live_increments,
        index_vacuum,
    )
    from etl_prometheus2clickhouse_spark.streaming.retention import (
        compact_stream_outputs,
        live_batch_dirs,
    )

    if dispositions_dir is not None and live_batch_dirs(
        spark, dispositions_dir, _MB
    ) >= max_live_dirs:
        compact_stream_outputs(
            spark, dispositions_dir, partition_col=_MB, keep_latest=1
        )
    live = index_live_increments(spark, index_path)
    # the single-row geometry tables legitimately stay at one
    # increment per lifecycle event — only data tables trigger the fold
    live.pop("model", None)
    live.pop("meta", None)
    live.pop("idmeta", None)
    if live and max(live.values()) >= max_live_dirs:
        compact(spark, index_path, exclude_labels={f"b{int(batch_id)}"})
        index_vacuum(spark, index_path)


def semantic_dedup_body(
    index_path: str,
    dispositions_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_live_dirs: int | None = None,
):
    """foreachBatch body for STREAMING incremental SemDeDup: each
    micro-batch of embeddings is deduped against the persisted
    cell-partitioned vector index (operators/semantic_index.py
    ``semantic_increment`` — probe pruned to the batch's own cells),
    lands ALL its vectors in the batch's own replay-idempotent
    ``mb=b<id>`` increment, and writes its ``(id, cell, dup_of, kept)``
    dispositions to its own overwritable partition. Under ascending-id
    batches the accumulated dispositions equal the one-shot
    ``semantic_dedup`` of everything — EXACTLY, the semantic_index
    module's no-caveat contract (frozen centroids + every prior vector
    indexed), which is a stronger equivalence than the curation
    funnel's banding-recall one."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        cached_scope,
    )
    from etl_prometheus2clickhouse_spark.operators.semantic_index import (
        semantic_increment,
    )

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if max_live_dirs is not None:
            from etl_prometheus2clickhouse_spark.operators.semantic_index import (  # noqa: E501
                semantic_index_compact,
            )

            _maintain_vector_store(
                batch_df.sparkSession, batch_id, index_path,
                semantic_index_compact, dispositions_dir, max_live_dirs,
            )
        with cached_scope():
            out = semantic_increment(
                batch_df,
                index_path,
                id_col=id_col,
                vec_col=vec_col,
                update_index=True,
                update_label=f"b{int(batch_id)}",
            ).localCheckpoint()  # dispositions fixed before index write
            out.coalesce(_disp_partitions(out.count())).write.mode(
                "overwrite"
            ).parquet(f"{dispositions_dir}/{_MB}={int(batch_id)}")

    return body


def run_streaming_semantic_dedup(
    src: DataFrame,
    index_path: str,
    dispositions_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_live_dirs: int | None = None,
) -> None:
    """Run an embedding stream to completion (AvailableNow) through
    :func:`semantic_dedup_body` under a checkpoint — restartable,
    replay-idempotent (the dedup-index increment discipline).
    ``max_live_dirs`` schedules in-lifecycle compaction + vacuum."""
    from etl_prometheus2clickhouse_spark.streaming.batchconf import (
        batch_job_conf,
    )

    with batch_job_conf(src.sparkSession):
        q = (
            src.writeStream.foreachBatch(
                semantic_dedup_body(
                    index_path, dispositions_dir, id_col, vec_col,
                    max_live_dirs,
                )
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def ann_ingest_body(index_path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    max_live_dirs: int | None = None):
    """foreachBatch body for streaming ANN ingestion: each micro-batch
    of embeddings is encoded with the index's STORED model into the
    batch's own replay-idempotent ``mb=b<id>`` increment
    (operators/ann_index.py). Unlike the curation funnel there is no
    ordering contract at all — search depends only on the final table,
    so any arrival order yields the same index."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_append,
    )

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if max_live_dirs is not None:
            from etl_prometheus2clickhouse_spark.operators.ann_index import (
                ann_index_compact,
            )

            _maintain_vector_store(
                batch_df.sparkSession, batch_id, index_path,
                ann_index_compact, None, max_live_dirs,
            )
        ann_index_append(
            batch_df, index_path, f"b{int(batch_id)}",
            id_col=id_col, vec_col=vec_col,
        )

    return body


def run_streaming_ann_ingest(
    src: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_live_dirs: int | None = None,
) -> None:
    """Run an embedding stream to completion (AvailableNow) through
    :func:`ann_ingest_body` under a checkpoint — restartable, replay-
    idempotent (the dedup-index increment discipline).
    ``max_live_dirs`` schedules in-lifecycle compaction + vacuum."""
    from etl_prometheus2clickhouse_spark.streaming.batchconf import (
        batch_job_conf,
    )

    with batch_job_conf(src.sparkSession):
        q = (
            src.writeStream.foreachBatch(
                ann_ingest_body(index_path, id_col, vec_col, max_live_dirs)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def bm25_ingest_body(index_path: str, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_live_dirs: int | None = None):
    """foreachBatch body for streaming BM25 index ingestion: each
    micro-batch of documents is tokenized under the index's STORED
    geometry into the batch's own replay-idempotent ``mb=b<id>``
    increment (operators/bm25_index.py). Like the ANN ingest there is
    no ordering contract — search depends only on the final postings +
    additive stats, so any arrival order yields the same index."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_append,
    )

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if max_live_dirs is not None:
            from etl_prometheus2clickhouse_spark.operators.bm25_index import (
                bm25_index_compact,
            )

            _maintain_vector_store(
                batch_df.sparkSession, batch_id, index_path,
                bm25_index_compact, None, max_live_dirs,
            )
        bm25_index_append(
            batch_df, index_path, f"b{int(batch_id)}",
            text_col=text_col, id_col=id_col,
        )

    return body


def run_streaming_bm25_ingest(
    src: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_live_dirs: int | None = None,
) -> None:
    """Run a document stream to completion (AvailableNow) through
    :func:`bm25_ingest_body` under a checkpoint — restartable, replay-
    idempotent (the dedup-index increment discipline).
    ``max_live_dirs`` schedules in-lifecycle compaction + vacuum."""
    from etl_prometheus2clickhouse_spark.streaming.batchconf import (
        batch_job_conf,
    )

    with batch_job_conf(src.sparkSession):
        q = (
            src.writeStream.foreachBatch(
                bm25_ingest_body(index_path, text_col, id_col, max_live_dirs)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
