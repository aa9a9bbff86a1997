"""Streaming incremental curation (streaming/curation_stream.py):
per-batch dedup against the persisted MinHash index + Gopher + LM
scoring, dispositions appended under a checkpoint — kill-and-restart
resume, at-least-once replay idempotence, and oracle equivalence to the
one-shot funnel over all batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import (
    cached_scope,
    minhash_lsh_pairs,
    resolve_near_duplicates,
)
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    index_stats,
    minhash_index_build,
)
from etl_prometheus2clickhouse_spark.operators.text import (
    gopher_filter,
    lm_perplexity,
)
from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
    curation_batch_body,
    read_dispositions,
    run_streaming_curation,
)

# A ~60-word paragraph that PASSES every Gopher rule (word count needs
# the repetition; it stays under the 30% duplicate-line cap because it
# is a single line). Variants tweak the tail so near-dup pairs exist
# within and across batches; "short doc" plants a quality failure.
_BASE = (
    "the curious engineers wanted to understand whether streams of "
    "documents could be curated and deduplicated with care and that "
    "every batch would have the same treatment with honest rules and "
    "that nothing would be lost along the way because the pipeline "
    "keeps records of every decision it makes for later audits and "
    "reviews of quality over time"
)

# Two more INDEPENDENT paragraph families (word substitution inside
# one family keeps 3-gram Jaccard ~0.85, so kept/tail docs need their
# own vocabulary to escape the dedup stage). _BASE2 is in the LM
# reference (low perplexity -> kept); _BASE3 is not (high -> tail).
_BASE2 = (
    "a gentle rain fell over the valley and the farmers watched with "
    "quiet patience as the rivers rose and the fields drank deeply of "
    "the water that would carry the harvest through another season and "
    "everyone agreed that the weather had been kind this year and that "
    "the granaries would be full before the first frost arrived in the "
    "hills"
)
_BASE3 = (
    "zorbic flanges require torsion calibrated spanners and the "
    "operator must verify that the manifold pressure of the hydraulic "
    "accumulator remains within tolerance bands while the gantry "
    "crane slews across the loading bay and that every coupling have "
    "been torqued with certified wrenches before the shift supervisor "
    "signs the release documents for the next consignment of parts"
)
# A fourth fully-independent family (used by the four-stage test's
# "fresh" doc — its shingles must not collide with ANY other family,
# or the near-dup stage absorbs it and the kept-path pin is vacuous).
_BASE4 = (
    "the museum curators arranged the ancient pottery with great "
    "attention and noted that each shard of glazed ceramic carried "
    "marks of the kilns that fired them centuries ago and the catalog "
    "of the collection grew slowly because every piece required "
    "patient photography and measurement and description before it "
    "could join the public exhibit hall downstairs near the entrance"
)

# seed corpus (the index build), then three streamed batches in
# ascending id order. Duplicate topology: 1~2 (seed-internal),
# 2~101 (seed x batch0), 103~104 (within batch1, _BASE2 family),
# 7~205 (seed x batch2). Doc 102 fails Gopher (too short); 103 is
# canonical + fluent under the reference (kept); 206 is canonical but
# out-of-distribution (perplexity_tail). No cross-batch TRANSITIVE
# merges — the documented equivalence precondition.
_SEED = [
    (1, _BASE + " alpha"),
    (2, _BASE + " beta"),
    (7, _BASE.replace("curious", "careful") + " unique seven"),
    (8, _BASE.replace("engineers", "operators") + " unique eight"),
]
_BATCHES = [
    [(101, _BASE + " gamma"), (102, "too short to pass gopher rules")],
    [
        (103, _BASE2 + " delta one"),
        (104, _BASE2 + " delta two"),
    ],
    [
        (205, _BASE.replace("curious", "careful") + " unique seven bis"),
        (206, _BASE3 + " omega"),
    ],
]
_REFERENCE = [
    (9001, _BASE),
    (9002, _BASE2),
]

_SCHEMA = "doc_id long, text string"


def _one_shot(spark, ppl_threshold):
    """The batch recomputation over seed + all streamed docs: min-id
    dedup election -> Gopher -> fixed-threshold LM scoring."""
    all_rows = _SEED + [r for b in _BATCHES for r in b]
    docs = spark.createDataFrame(all_rows, _SCHEMA)
    ref = spark.createDataFrame(_REFERENCE, _SCHEMA)
    pairs = minhash_lsh_pairs(docs, "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    )
    dd = resolve_near_duplicates(docs, pairs, id_col="doc_id")
    surv = dd.where("is_canonical").select("doc_id", "text")
    g = gopher_filter(surv, "text", "doc_id").select("doc_id", "keep")
    kept = surv.join(g, "doc_id").where("keep").select("doc_id", "text")
    ppl = lm_perplexity(kept, ref, "text", "doc_id", alpha=0.5).select(
        "doc_id", "perplexity"
    )
    out = (
        dd.select("doc_id", "is_canonical")
        .join(g, "doc_id", "left")
        .join(ppl, "doc_id", "left")
        .select(
            "doc_id",
            F.when(~F.col("is_canonical"), F.lit("duplicate"))
            .when(~F.coalesce("keep", F.lit(False)), F.lit("quality"))
            .when(
                F.col("perplexity") > ppl_threshold,
                F.lit("perplexity_tail"),
            )
            .otherwise(F.lit("kept"))
            .alias("disposition"),
        )
    )
    return {r.doc_id: r.disposition for r in out.collect()}


def _median_ppl(spark):
    """Threshold derived from the one-shot scores (median) so the
    tail/kept split is non-vacuous by construction."""
    all_rows = _SEED + [r for b in _BATCHES for r in b]
    docs = spark.createDataFrame(all_rows, _SCHEMA)
    ref = spark.createDataFrame(_REFERENCE, _SCHEMA)
    vals = sorted(
        r.perplexity
        for r in lm_perplexity(docs, ref, "text", "doc_id").collect()
    )
    return vals[len(vals) // 2]


def _setup(spark, tmp_path, name):
    seed = spark.createDataFrame(_SEED, _SCHEMA)
    ref = spark.createDataFrame(_REFERENCE, _SCHEMA)
    idx = str(tmp_path / f"{name}_idx")
    minhash_index_build(seed, idx, id_col="doc_id", threshold=0.5)
    return seed, ref, idx


def _write_batch(spark, src, rows, n):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b{n}")


def _stream(spark, src):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )


def test_stream_equals_one_shot_with_kill_and_restart(spark, tmp_path):
    """Feed batches 0-1, run to completion; then batch 2 arrives and a
    RESTARTED stream (same checkpoint) processes ONLY it. The union of
    all batches' dispositions — plus the seed's own resolution — must
    equal the one-shot funnel over everything."""
    with cached_scope():
        thr = _median_ppl(spark)
        want = _one_shot(spark, thr)
    seed, ref, idx = _setup(spark, tmp_path, "kr")
    src = str(tmp_path / "kr_src")
    disp_dir = str(tmp_path / "kr_disp")
    ckpt = str(tmp_path / "kr_ckpt")

    _write_batch(spark, src, _BATCHES[0], 0)
    _write_batch(spark, src, _BATCHES[1], 1)
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp_dir, ckpt, thr
    )
    n_after_first = read_dispositions(spark, disp_dir).count()
    assert n_after_first == sum(len(b) for b in _BATCHES[:2])

    # the stream stopped; a new batch lands; restart from checkpoint
    _write_batch(spark, src, _BATCHES[2], 2)
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp_dir, ckpt, thr
    )
    disp = read_dispositions(spark, disp_dir)
    got = {r.doc_id: r.disposition for r in disp.collect()}
    # only the new batch was processed on restart
    assert disp.select("mb").distinct().count() == 3
    assert len(got) == sum(len(b) for b in _BATCHES)

    # streamed docs must match the one-shot labels exactly
    streamed_ids = {r[0] for b in _BATCHES for r in b}
    assert got == {k: v for k, v in want.items() if k in streamed_ids}
    # the matrix is non-vacuous: every disposition class occurred
    assert set(got.values()) == {
        "duplicate", "quality", "perplexity_tail", "kept",
    }


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: invoking the body twice with the
    same batch_id must leave ONE dispositions partition with identical
    rows and ONE index increment (no duplicate band/shingle rows)."""
    seed, ref, idx = _setup(spark, tmp_path, "rp")
    disp_dir = str(tmp_path / "rp_disp")
    with cached_scope():
        thr = _median_ppl(spark)
    body = curation_batch_body(idx, ref, disp_dir, thr)
    batch = spark.createDataFrame(_BATCHES[0], _SCHEMA)
    body(batch, 0)
    first = sorted(
        (r.doc_id, r.disposition)
        for r in read_dispositions(spark, disp_dir).collect()
    )
    stats_first = index_stats(spark, idx)
    body(batch, 0)  # replay
    second = sorted(
        (r.doc_id, r.disposition)
        for r in read_dispositions(spark, disp_dir).collect()
    )
    stats_second = index_stats(spark, idx)
    assert second == first
    assert stats_second == stats_first


def test_five_stage_stream_with_decontamination(spark, tmp_path):
    """bench_index_path inserts the DECONTAMINATION stage between
    near-dup and Gopher: a canonical doc sharing ≥1 word 5-gram with
    the persisted benchmark index is ``contaminated`` and never
    reaches the quality/LM stages (it would otherwise be 'kept' — the
    precedence pin is non-vacuous); membership against the fixed set
    matches the one-shot ngram_contamination of the same survivors;
    replay stays idempotent."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        benchmark_index_build,
    )
    from etl_prometheus2clickhouse_spark.operators.text import (
        ngram_contamination,
    )

    # an independent vocabulary family for the benchmark (no 5-gram
    # can collide with the _BASE* families)
    bench_text = (
        "the standardized examination questions ask students to "
        "compute the derivative of polynomial functions and explain "
        "the reasoning behind each algebraic manipulation"
    )
    excerpt = "compute the derivative of polynomial functions and"
    assert excerpt in bench_text  # 7 words -> 3 five-gram hits
    bench_df = spark.createDataFrame([(9901, bench_text)], _SCHEMA)
    batch_rows = [
        (301, _BASE + " gamma two"),            # near-dup of seed 1/2
        (302, _BASE4 + " " + excerpt),          # canonical + contaminated
        (303, "short doc"),                     # quality fail
        (304, _BASE2 + " epsilon"),             # clean -> kept
    ]
    seed, ref, idx = _setup(spark, tmp_path, "dc")
    bidx = str(tmp_path / "dc_bidx")
    benchmark_index_build(bench_df, bidx, n=5)
    disp_dir = str(tmp_path / "dc_disp")
    batch = spark.createDataFrame(batch_rows, _SCHEMA)
    with cached_scope():
        body = curation_batch_body(
            idx, ref, disp_dir, 1e9, bench_index_path=bidx
        )
        body(batch, 0)
        first = sorted(
            (r.doc_id, r.disposition)
            for r in read_dispositions(spark, disp_dir).collect()
        )
        stats_first = index_stats(spark, idx)
        body(batch, 0)  # replay
        second = sorted(
            (r.doc_id, r.disposition)
            for r in read_dispositions(spark, disp_dir).collect()
        )
        assert second == first
        assert index_stats(spark, idx) == stats_first
        got = dict(first)
        assert got == {
            301: "duplicate",
            302: "contaminated",
            303: "quality",
            304: "kept",
        }
        # stage ≡ the one-shot membership operator on the same
        # canonical survivors (pure-membership equivalence)
        surv = spark.createDataFrame(
            [r for r in batch_rows if r[0] != 301], _SCHEMA
        )
        hits = ngram_contamination(
            surv, bench_df, "text", "doc_id", n=5
        )
        assert {r.doc_id for r in hits.collect()} == {302}
        assert hits.where("doc_id = 302").first().n_contaminated == 3


def test_contaminated_vs_late_merge_divergence(spark, tmp_path):
    """COMPOSED-precedence divergence pin: doc X is canonical when its
    batch arrives (→ probed, found contaminated, disposition written),
    and a LATER batch's doc Y transitively merges X into an
    earlier-seeded cluster — the one-shot recomputation labels X
    ``duplicate`` (dedup precedes decontamination in the CASE), while
    the streamed label stays ``contaminated`` (dispositions are
    append-only). This is the near-dup stage's documented late-merge
    divergence class, unchanged by the decontamination stage: BOTH
    labels reject the doc (monotone — a rejection never becomes a
    keep), and Y itself streams as ``duplicate`` exactly like the
    one-shot."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        benchmark_index_build,
    )

    W = _BASE.split()
    assert len(W) >= 40
    bench_text = (
        "quarterly revenue figures must reconcile against audited "
        "ledger balances before publication deadlines arrive"
    )
    excerpt = bench_text.split()[:7]
    filler = (
        "granite cliffs overlook turquoise bays where fishing boats "
        "anchor beneath pale dawn skies slowly drifting gulls circle "
        "weathered lighthouses guarding rocky headlands while distant "
        "ferries cross silver channels toward sheltered harbors"
    ).split()
    # similarity ladder on the _BASE word sequence: Z = base;
    # Y replaces words 0-14; X keeps Y's replacement AND replaces
    # words 15-29 (7 of them with the benchmark excerpt) — so X~Y
    # and Y~Z share enough to qualify at 0.5 while X~Z shares only
    # the common tail and does not (verified against the operator
    # below, so the construction cannot silently rot)
    r1 = filler[:15]
    z_text = " ".join(W)
    y_text = " ".join(r1 + W[15:])
    x_text = " ".join(r1 + excerpt + filler[15:23] + W[30:])
    docs = spark.createDataFrame(
        [(1, z_text), (50, x_text), (60, y_text)], _SCHEMA
    )
    with cached_scope():
        pairs = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                docs, "doc_id", threshold=0.5
            ).select("id_a", "id_b").collect()
        }
        # the construction the divergence needs: a transitive chain
        assert (1, 60) in pairs and (50, 60) in pairs, pairs
        assert (1, 50) not in pairs, pairs
        # one-shot: closure {1, 50, 60} -> X (50) and Y (60) duplicate
        one_shot = _resolved_labels = {
            r.doc_id: r.is_canonical
            for r in resolve_near_duplicates(
                docs.select("doc_id"),
                spark.createDataFrame(
                    [(1, 60), (50, 60)], "id_a long, id_b long"
                ),
                id_col="doc_id",
            ).collect()
        }
        assert one_shot == {1: True, 50: False, 60: False}

        ref = spark.createDataFrame(_REFERENCE, _SCHEMA)
        idx = str(tmp_path / "dv_idx")
        bidx = str(tmp_path / "dv_bidx")
        minhash_index_build(
            docs.where("doc_id = 1"), idx, id_col="doc_id",
            threshold=0.5,
        )
        benchmark_index_build(
            spark.createDataFrame([(9901, bench_text)], _SCHEMA),
            bidx, n=5,
        )
        disp_dir = str(tmp_path / "dv_disp")
        body = curation_batch_body(
            idx, ref, disp_dir, 1e9, bench_index_path=bidx
        )
        body(docs.where("doc_id = 50"), 0)  # X arrives first
        body(docs.where("doc_id = 60"), 1)  # Y merges X with Z later
        got = {
            r.doc_id: r.disposition
            for r in read_dispositions(spark, disp_dir).collect()
        }
    # the pinned divergence: streamed X stays 'contaminated'
    # (append-only), the one-shot would say 'duplicate' — both reject
    assert got[50] == "contaminated"
    assert got[60] == "duplicate"


def test_four_stage_stream_with_paragraph_index(spark, tmp_path):
    """The full funnel lineage: paragraph_increment (CCNet stage 1)
    runs AHEAD of the near-dup increment, each updating its own
    persisted index, and the result equals the four-stage one-shot
    (paragraph election → near-dup closure on REWRITTEN text → Gopher
    → fixed-threshold LM). An exact re-crawl loses every paragraph
    (dedup_empty) and never enters the band index; the replayed batch
    is idempotent across BOTH indexes."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        paragraph_dedup,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_index_build,
    )

    # two-paragraph docs from the Gopher-passing families
    seed_rows = [
        (0, _BASE + "\n" + _BASE2),
        (1, _BASE3 + " alpha" + "\n" + _BASE2 + " beta"),
    ]
    batch_rows = [
        (10, _BASE + "\n" + _BASE2),              # exact re-crawl of 0
        (11, _BASE3 + " alpha" + "\n" + _BASE2 + " gamma"),  # near-dup of 1
        (12, _BASE4),                              # fresh (own family)
        (13, "short doc"),                         # quality fail
    ]
    all_docs = spark.createDataFrame(seed_rows + batch_rows, _SCHEMA)
    seed = spark.createDataFrame(seed_rows, _SCHEMA)
    batch = spark.createDataFrame(batch_rows, _SCHEMA)
    ref = spark.createDataFrame(_REFERENCE, _SCHEMA)
    thr = 1e9  # LM stage exercised but non-binding here
    idx = str(tmp_path / "f4_idx")
    pidx = str(tmp_path / "f4_pidx")
    disp_dir = str(tmp_path / "f4_disp")

    with cached_scope():
        # one-shot reference: the same four stages over everything
        dd = paragraph_dedup(all_docs, "doc_id", "text", "\n")
        nonempty = dd.where("n_kept > 0").select("doc_id", "text")
        pairs = minhash_lsh_pairs(
            nonempty, "doc_id", threshold=0.5
        ).select("id_a", "id_b")
        res = resolve_near_duplicates(nonempty, pairs, id_col="doc_id")
        surv = res.where("is_canonical").select("doc_id", "text")
        g = gopher_filter(surv, "text", "doc_id").select("doc_id", "keep")
        want = {}
        canon = {r.doc_id: r.is_canonical for r in res.collect()}
        keep = {r.doc_id: r.keep for r in g.collect()}
        for r in dd.collect():
            if r.n_kept == 0:
                want[r.doc_id] = "dedup_empty"
            elif not canon[r.doc_id]:
                want[r.doc_id] = "duplicate"
            elif not keep.get(r.doc_id, False):
                want[r.doc_id] = "quality"
            else:
                want[r.doc_id] = "kept"

        # streaming: seed both indexes, then one batch + its replay
        paragraph_index_build(seed, pidx, id_col="doc_id")
        seed_dd = paragraph_dedup(seed, "doc_id", "text", "\n")
        minhash_index_build(
            seed_dd.where("n_kept > 0").select("doc_id", "text"),
            idx, id_col="doc_id", threshold=0.5,
        )
        body = curation_batch_body(
            idx, ref, disp_dir, thr, para_index_path=pidx
        )
        body(batch, 0)
        first = sorted(
            (r.doc_id, r.disposition)
            for r in read_dispositions(spark, disp_dir).collect()
        )
        p_stats = index_stats(spark, idx)
        body(batch, 0)  # replay: idempotent across BOTH indexes
        second = sorted(
            (r.doc_id, r.disposition)
            for r in read_dispositions(spark, disp_dir).collect()
        )
    assert second == first
    assert index_stats(spark, idx) == p_stats
    got = dict(first)
    assert got == {k: v for k, v in want.items() if k >= 10}, (got, want)
    # the planted matrix is non-vacuous
    assert got[10] == "dedup_empty"
    assert got[11] == "duplicate"
    assert got[13] == "quality"
    assert got[12] == "kept"


def test_serve_index_receives_kept_docs(spark, tmp_path):
    """serve_index_path closes the curate → serve loop: each batch's
    kept documents land in a persisted BM25 index under the batch's
    replay-idempotent label, so search over the index equals one-shot
    BM25 over exactly the curated corpus (seed kept + streamed kept),
    and a replayed batch changes nothing."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_build,
        bm25_index_search,
    )
    from etl_prometheus2clickhouse_spark.operators.text import bm25_search

    with cached_scope():
        thr = _median_ppl(spark)
        want = _one_shot(spark, thr)
    seed, ref, idx = _setup(spark, tmp_path, "sv")
    src = str(tmp_path / "sv_src")
    disp_dir = str(tmp_path / "sv_disp")
    ckpt = str(tmp_path / "sv_ckpt")
    serve = str(tmp_path / "sv_serve")

    # the serve index starts from the SEED's kept output (the
    # production bootstrap: curate the backlog once, then stream)
    all_rows = _SEED + [r for b in _BATCHES for r in b]
    kept_ids = {k for k, v in want.items() if v == "kept"}
    seed_kept = [r for r in _SEED if r[0] in kept_ids]
    assert seed_kept, "seed must contribute kept docs (fixture drift)"
    bm25_index_build(
        spark.createDataFrame(seed_kept, _SCHEMA), serve, term_buckets=8
    )

    for n, b in enumerate(_BATCHES):
        _write_batch(spark, src, b, n)
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp_dir, ckpt, thr,
        serve_index_path=serve,
    )
    queries = spark.createDataFrame(
        [
            (1, ["curious", "engineers", "documents"]),
            (2, ["gentle", "rain", "harvest"]),
            (3, ["zorbic", "flanges"]),
        ],
        "query_id long, terms array<string>",
    )
    got = sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_index_search(queries, serve, k=5).collect()
    )
    kept_docs = spark.createDataFrame(
        [r for r in all_rows if r[0] in kept_ids], _SCHEMA
    )
    want_rows = sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_search(kept_docs, queries, k=5).collect()
    )
    assert got == want_rows and got
    # streamed kept docs actually reached the index (non-vacuous)
    streamed_kept = kept_ids & {r[0] for b in _BATCHES for r in b}
    assert streamed_kept
    assert streamed_kept & {g[1] for g in got}

    # at-least-once replay: re-invoking a batch body leaves the serve
    # index unchanged (mb= overwrite + stats row replacement)
    body = curation_batch_body(
        idx, ref, disp_dir, thr, serve_index_path=serve
    )
    body(spark.createDataFrame(_BATCHES[0], _SCHEMA), 0)
    again = sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_index_search(queries, serve, k=5).collect()
    )
    assert again == got


def test_shards_path_publishes_kept_docs(spark, tmp_path):
    """shards_path closes the curate → PUBLISH loop: each batch's kept
    documents merge into the persisted training shard table under the
    deterministic interleave key, the final table equals the one-shot
    write over (seed kept + streamed kept), and a replayed batch
    changes nothing (shards_append's converging merge)."""
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        sample_bucket,
        write_training_shards,
    )
    from etl_prometheus2clickhouse_spark.streaming.curation_stream import (
        _SHARD_KEY_SALT,
    )

    with cached_scope():
        thr = _median_ppl(spark)
        want = _one_shot(spark, thr)
    seed, ref, idx = _setup(spark, tmp_path, "pub")
    src = str(tmp_path / "pub_src")
    disp_dir = str(tmp_path / "pub_disp")
    ckpt = str(tmp_path / "pub_ckpt")
    shards = str(tmp_path / "pub_shards")

    def _keyed(df):
        return df.select(
            "doc_id",
            "text",
            sample_bucket("doc_id", salt=_SHARD_KEY_SALT)
            .cast("long")
            .alias("mix_key"),
        )

    all_rows = _SEED + [r for b in _BATCHES for r in b]
    kept_ids = {k for k, v in want.items() if v == "kept"}
    seed_kept = [r for r in _SEED if r[0] in kept_ids]
    assert seed_kept, "seed must contribute kept docs (fixture drift)"
    # bootstrap: the seed's kept output, written once
    write_training_shards(
        _keyed(spark.createDataFrame(seed_kept, _SCHEMA)), shards, 4
    )
    for n, b in enumerate(_BATCHES):
        _write_batch(spark, src, b, n)
    run_streaming_curation(
        _stream(spark, src), idx, ref, disp_dir, ckpt, thr,
        shards_path=shards,
    )
    got = sorted(
        (r.doc_id, r.text, r.mix_key)
        for r in spark.read.parquet(shards)
        .select("doc_id", "text", "mix_key")
        .collect()
    )
    want_rows = sorted(
        (r.doc_id, r.text, r.mix_key)
        for r in _keyed(
            spark.createDataFrame(
                [r for r in all_rows if r[0] in kept_ids], _SCHEMA
            )
        ).collect()
    )
    assert got == want_rows and got
    # streamed kept docs actually reached the published table
    streamed_kept = kept_ids & {r[0] for b in _BATCHES for r in b}
    assert streamed_kept and streamed_kept <= {g[0] for g in got}
    # at-least-once replay: re-invoking a batch body converges
    body = curation_batch_body(
        idx, ref, disp_dir, thr, shards_path=shards
    )
    body(spark.createDataFrame(_BATCHES[0], _SCHEMA), 0)
    again = sorted(
        (r.doc_id, r.text, r.mix_key)
        for r in spark.read.parquet(shards)
        .select("doc_id", "text", "mix_key")
        .collect()
    )
    assert again == got
    # a missing bootstrap refuses loudly
    import pytest as _pytest

    body2 = curation_batch_body(
        idx, ref, disp_dir, thr,
        shards_path=str(tmp_path / "nope"),
    )
    with _pytest.raises(ValueError, match="bootstrapped table"):
        # batch 0 again: the dedup stage replays cleanly under its own
        # label, then the missing shards bootstrap refuses
        body2(spark.createDataFrame(_BATCHES[0], _SCHEMA), 0)


def test_hybrid_serve_feeds_both_indexes(spark, tmp_path):
    """ann_serve_index_path closes the DENSE half of the curate → serve
    loop: each batch's kept documents are feature-hash embedded and
    appended to a persisted IVFADC index beside the BM25 one, so
    HYBRID retrieval (RRF over both persisted indexes) is live over
    exactly the curated corpus — and equals the same fusion computed
    from one-shot retrieval over the kept set."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_build,
        ann_index_search,
    )
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_build,
        bm25_index_search,
    )
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq_codes,
        ivfpq_encode,
    )
    from etl_prometheus2clickhouse_spark.operators.text import (
        bm25_search,
        hashed_doc_vectors,
        rrf_fuse,
    )

    def _vecs(df):
        return (
            hashed_doc_vectors(df, dim=32)
            .where(F.exists("vec", lambda x: x != 0))
            .select(
                "doc_id",
                F.transform("vec", lambda v: v.cast("double")).alias(
                    "embedding"
                ),
            )
        )

    with cached_scope():
        thr = _median_ppl(spark)
        want = _one_shot(spark, thr)
    seed, ref, idx = _setup(spark, tmp_path, "hs")
    src = str(tmp_path / "hs_src")
    disp_dir = str(tmp_path / "hs_disp")
    ckpt = str(tmp_path / "hs_ckpt")
    serve = str(tmp_path / "hs_serve")
    ann_serve = str(tmp_path / "hs_ann_serve")

    all_rows = _SEED + [r for b in _BATCHES for r in b]
    kept_ids = {k for k, v in want.items() if v == "kept"}
    seed_kept_df = spark.createDataFrame(
        [r for r in _SEED if r[0] in kept_ids], _SCHEMA
    )
    bm25_index_build(seed_kept_df, serve, term_buckets=8)
    with cached_scope():
        model = ann_index_build(
            _vecs(seed_kept_df), ann_serve, dim=32,
            id_col="doc_id", vec_col="embedding",
            n_cells=2, m=4, k_codes=2, quantizers="first",
        )

        for n, b in enumerate(_BATCHES):
            _write_batch(spark, src, b, n)
        run_streaming_curation(
            _stream(spark, src), idx, ref, disp_dir, ckpt, thr,
            serve_index_path=serve,
            ann_serve_index_path=ann_serve,
            serve_vec_dim=32,
        )

        kept_docs = spark.createDataFrame(
            [r for r in all_rows if r[0] in kept_ids], _SCHEMA
        )
        queries = spark.createDataFrame(
            [
                (1, ["curious", "engineers", "documents"]),
                (2, ["gentle", "rain", "harvest"]),
            ],
            "query_id long, terms array<string>",
        )
        q_ids = [r[0] for r in _SEED if r[0] in kept_ids][:2]
        q_vecs = _vecs(kept_docs).where(
            F.col("doc_id").isin(q_ids)
        ).select(
            F.col("doc_id").alias("vec_id"),
            F.col("embedding"),
        )

        # lexical leg ≡ one-shot BM25 over the kept set
        bm_got = bm25_index_search(queries, serve, k=5).select(
            "query_id", "doc_id", "rank"
        )
        bm_want = bm25_search(kept_docs, queries, k=5).select(
            "query_id", "doc_id", "rank"
        )
        assert sorted(map(tuple, bm_got.collect())) == sorted(
            map(tuple, bm_want.collect())
        )

        # dense leg ≡ one-shot IVFADC over the kept vectors with the
        # SEED-trained frozen model
        ann_got = ann_index_search(
            q_vecs, ann_serve, k=3, n_probe=2, n_candidates=5,
            id_col="vec_id", vec_col="embedding",
        ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        all_vecs = _vecs(kept_docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        ann_want = cosine_topk_ivfpq_codes(
            ivfpq_encode(all_vecs, model, id_col="vec_id",
                         vec_col="embedding"),
            model, all_vecs, q_vecs,
            id_col="vec_id", vec_col="embedding",
            k=3, n_probe=2, n_candidates=5,
        ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        assert sorted(map(tuple, ann_got.collect())) == sorted(
            map(tuple, ann_want.collect())
        )
        assert ann_got.count() > 0  # non-vacuous

        # the hybrid fusion over the two PERSISTED serve indexes equals
        # the fusion of the one-shot legs
        got_fused = sorted(
            map(tuple, rrf_fuse([bm_got, ann_got], k0=60, k=5).collect())
        )
        want_fused = sorted(
            map(tuple, rrf_fuse([bm_want, ann_want], k0=60, k=5).collect())
        )
    assert got_fused == want_fused and got_fused


def test_takedown_between_waves_hits_dense_serve_leg(spark, tmp_path):
    """The right-to-be-forgotten request lands BETWEEN funnel waves and
    must hit the DENSE serve leg too: one takedown() call tombstones a
    seed kept doc out of BOTH serve indexes, the tombstoned doc
    disappears from lexical AND dense retrieval immediately, later
    waves keep appending (overlap guards pass), and the final searches
    equal the one-shot legs over (kept set minus the taken-down doc)."""
    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_build,
        ann_index_search,
    )
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_build,
        bm25_index_search,
    )
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq_codes,
        ivfpq_encode,
    )
    from etl_prometheus2clickhouse_spark.operators.takedown import (
        takedown,
        takedown_status,
    )
    from etl_prometheus2clickhouse_spark.operators.text import (
        bm25_search,
        hashed_doc_vectors,
    )

    def _vecs(df):
        return (
            hashed_doc_vectors(df, dim=32)
            .where(F.exists("vec", lambda x: x != 0))
            .select(
                "doc_id",
                F.transform("vec", lambda v: v.cast("double")).alias(
                    "embedding"
                ),
            )
        )

    with cached_scope():
        thr = _median_ppl(spark)
        want = _one_shot(spark, thr)
    seed, ref, idx = _setup(spark, tmp_path, "td")
    src = str(tmp_path / "td_src")
    disp_dir = str(tmp_path / "td_disp")
    ckpt = str(tmp_path / "td_ckpt")
    serve = str(tmp_path / "td_serve")
    ann_serve = str(tmp_path / "td_ann_serve")

    all_rows = _SEED + [r for b in _BATCHES for r in b]
    kept_ids = {k for k, v in want.items() if v == "kept"}
    seed_kept = [r for r in _SEED if r[0] in kept_ids]
    gone = seed_kept[0][0]  # the seed kept doc the request names
    seed_kept_df = spark.createDataFrame(seed_kept, _SCHEMA)
    bm25_index_build(seed_kept_df, serve, term_buckets=8)
    with cached_scope():
        model = ann_index_build(
            _vecs(seed_kept_df), ann_serve, dim=32,
            id_col="doc_id", vec_col="embedding",
            n_cells=2, m=4, k_codes=2, quantizers="first",
        )
        # wave 1
        _write_batch(spark, src, _BATCHES[0], 0)
        run_streaming_curation(
            _stream(spark, src), idx, ref, disp_dir, ckpt, thr,
            serve_index_path=serve,
            ann_serve_index_path=ann_serve,
            serve_vec_dim=32,
        )
        # the takedown lands between waves — ONE call, both serve legs
        out = takedown(
            spark,
            spark.createDataFrame([(gone,)], "id long"),
            [("bm25", serve), ("ann", ann_serve)],
            str(tmp_path), "rtbf-1",
        )
        assert out["complete"]
        assert out["indexes"]["0:bm25"]["report"]["deleted_docs"] == 1
        assert out["indexes"]["1:ann"]["report"]["deleted_vectors"] == 1
        # waves 2 and 3: later appends pass the overlap guards
        for n, b in enumerate(_BATCHES[1:], start=1):
            _write_batch(spark, src, b, n)
        run_streaming_curation(
            _stream(spark, src), idx, ref, disp_dir, ckpt, thr,
            serve_index_path=serve,
            ann_serve_index_path=ann_serve,
            serve_vec_dim=32,
        )

        final_kept = spark.createDataFrame(
            [r for r in all_rows if r[0] in kept_ids and r[0] != gone],
            _SCHEMA,
        )
        queries = spark.createDataFrame(
            [
                (1, ["curious", "engineers", "documents"]),
                (2, ["gentle", "rain", "harvest"]),
            ],
            "query_id long, terms array<string>",
        )
        # lexical leg: reduced one-shot, the deleted id never surfaces
        bm_got = sorted(
            (r.query_id, r.doc_id, r.rank)
            for r in bm25_index_search(queries, serve, k=5).collect()
        )
        bm_want = sorted(
            (r.query_id, r.doc_id, r.rank)
            for r in bm25_search(final_kept, queries, k=5).collect()
        )
        assert bm_got == bm_want and all(r[1] != gone for r in bm_got)
        # dense leg: reduced one-shot under the frozen seed model; the
        # QUERY is the taken-down doc's own vector — a deleted doc may
        # still query the index, it just never comes back as a result
        q_vecs = _vecs(seed_kept_df).where(
            F.col("doc_id") == gone
        ).select(F.col("doc_id").alias("vec_id"), "embedding")
        all_vecs = _vecs(final_kept).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        ann_got = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann_index_search(
                q_vecs, ann_serve, k=3, n_probe=2, n_candidates=5,
                id_col="vec_id", vec_col="embedding",
            ).collect()
        )
        ann_want = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in cosine_topk_ivfpq_codes(
                ivfpq_encode(all_vecs, model, id_col="vec_id",
                             vec_col="embedding"),
                model, all_vecs, q_vecs,
                id_col="vec_id", vec_col="embedding",
                k=3, n_probe=2, n_candidates=5,
            ).collect()
        )
    assert ann_got == ann_want and ann_got
    assert all(r[1] != gone for r in ann_got)
    st = takedown_status(spark, str(tmp_path), "rtbf-1")
    assert {v["status"] for v in st["indexes"].values()} == {"deleted"}
