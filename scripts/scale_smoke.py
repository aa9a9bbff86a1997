"""Scale smoke: run the shuffle-heavy operators on corpora multiplied
well past sf0.1 and print wall seconds — evidence that the plans hold
when the data grows, not just that they pass at test scale.

Corpus construction: the sf0.1 tables unioned K times with shifted ids
(documents also get a per-copy suffix so near-dup structure is
preserved rather than exploding into K-way exact-dup cliques; one
giant boilerplate group IS included deliberately to exercise the
minhash bucket cap).

Usage: python scripts/scale_smoke.py [K]   (default 10)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_prometheus2clickhouse_spark.operators.dedup import (  # noqa: E402
    cached_scope,
    exact_dedup,
    exact_substring_spans,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_verified_pairs,
)
from etl_prometheus2clickhouse_spark.operators.text import (  # noqa: E402
    bm25_search,
    lm_perplexity,
    nb_classify,
    ngram_contamination,
    _words as _smoke_words,
)
from etl_prometheus2clickhouse_spark.operators.similarity import (  # noqa: E402
    embedding_near_dup_auto,
    embedding_near_dup_block_gemm,
    plan_near_dup,
    semantic_dedup,
)
from etl_prometheus2clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _multiplied_docs(spark, k: int):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = [
        d.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            # suffix keeps copies near- but not exact-duplicates
            F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _multiplied_embeddings(spark, k: int):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    copies = [
        e.select(
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
            F.col("embedding"),
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale_smoke")
    docs = _multiplied_docs(spark, k).persist()
    embs = _multiplied_embeddings(spark, k).persist()
    n_docs, n_vecs = docs.count(), embs.count()
    print(f"corpus: {n_docs} docs, {n_vecs} vectors (K={k})")

    def run(label, df_fn):
        with cached_scope():
            t0 = time.perf_counter()
            out = df_fn()
            n = out.count()
            dt = round(time.perf_counter() - t0, 1)
        print(f"{label}: {n} rows in {dt}s")

    stats: dict = {}
    run(
        "exact_dedup",
        lambda: exact_dedup(docs, ["text"], order_col="doc_id"),
    )
    run(
        "minhash_lsh(0.5, capped)",
        lambda: minhash_lsh_pairs(
            docs, "doc_id", threshold=0.5, max_bucket=500, bucket_stats=stats
        ),
    )
    print(f"  bucket stats: {stats}")
    run(
        "simhash_verified(h=6, 0.5)",
        lambda: simhash_verified_pairs(
            docs, "doc_id", max_hamming=6, threshold=0.5
        ),
    )
    run(
        "near_dup_block_gemm(0.6)",
        lambda: embedding_near_dup_block_gemm(
            embs, id_col="vec_id", threshold=0.6, blocks=32
        ),
    )
    # signature width must grow with corpus size — round 3 recorded the
    # failure mode by hand (16 bits over 20k vectors degenerates to
    # all-pairs, minutes; 64 bits keeps buckets ~80, ~15s). The planner
    # now sizes this analytically; the smoke asserts its sub-quadratic
    # candidate guarantee holds at this K and then runs the plan it
    # chose. Reference numbers at K=10 (quiet machine, round-5 code):
    # exact_dedup 1.1s, minhash 14.8s (0 drops), simhash_verified 7.8s,
    # block_gemm 14.6s, auto-LSH ~15s.
    plan = plan_near_dup(n_vecs, dim=64, threshold=0.9)
    print(
        f"near_dup plan @n={n_vecs}, t=0.9: {plan.strategy} "
        f"nbits={plan.nbits} bands={plan.bands} "
        f"bg_candidates={plan.est_bg_candidates:.0f}"
    )
    assert plan.strategy == "lsh", "20k+ vectors at 0.9 should band"
    assert plan.est_bg_candidates <= 32.0 * n_vecs, "sub-quadratic broken"
    run(
        "near_dup_auto(0.9)",
        lambda: embedding_near_dup_auto(
            embs, dim=64, id_col="vec_id", threshold=0.9, n=n_vecs
        ),
    )
    # round-8: PQ+ADC top-k on the multiplied corpus. The scan is
    # structurally linear (m LUT lookups per corpus vector over the
    # compressed code table; per-partition top-C cut bounds emitted
    # rows to partitions × queries × C, never corpus × queries) — the
    # smoke records the wall time and checks retrieval quality against
    # the exact Arrow scorer on the same multiplied corpus.
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_arrow,
        cosine_topk_pq,
    )

    q10 = embs.where(F.col("vec_id") < 10)
    pq_kwargs = dict(
        dim=64, id_col="vec_id", k=10, m=8, k_codes=32, n_candidates=100
    )
    run(
        "cosine_topk_pq(k=10, m=8, C=100)",
        lambda: cosine_topk_pq(embs, q10, **pq_kwargs),
    )
    with cached_scope():
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_arrow(
                embs, q10, id_col="vec_id", k=10
            ).collect()
        }
        got = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_pq(embs, q10, **pq_kwargs).collect()
        }
    pq_recall = len(got & exact) / len(exact)
    print(f"  pq recall@10 vs exact: {pq_recall:.3f}")
    assert pq_recall >= 0.8, f"PQ recall collapsed at scale: {pq_recall}"
    # round-6 additions: the inverted-index exact-Jaccard join and the
    # decontamination shingle join — both must stay O(shingle
    # collisions), not O(block²)/O(corpus × benchmark). Measured at
    # K=10 (quiet machine): ngram_jaccard 8.6s on a ~20.6k-doc en
    # block — the pre-fix pairwise-intersect formulation was already
    # >390s at K=1 (2k-doc block) and scales as block², i.e. hours
    # here; decontaminate 9.0s (copytagged near-dup copies make the
    # collision set ~50k docs — far denser than real corpora).
    docs_lang = docs.join(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            (F.col("doc_id") % 1_000_000).alias("base_id"), "lang"
        ).distinct(),
        docs.doc_id % 1_000_000 == F.col("base_id"),
    ).drop("base_id")
    run(
        "ngram_jaccard(lang-blocked, 0.2)",
        lambda: ngram_jaccard_pairs(
            docs_lang, "doc_id", block_col="lang", n=3, threshold=0.2
        ),
    )
    run(
        "decontaminate(n=3)",
        lambda: ngram_contamination(
            docs.where(F.col("doc_id") % 97 != 0),
            docs.where(F.col("doc_id") % 97 == 0),
            n=3,
        ),
    )

    # round-7: the df cap must neutralize a WHOLE-BLOCK boilerplate
    # shingle — the one join key that otherwise fans out O(block²).
    # 3000 planted docs share one 5-word boilerplate sentence (3
    # trigram keys at df=3000 → ~13.5M candidate rows uncapped); with
    # max_df=100 those keys leave the inverted index entirely and the
    # remaining keys are all df=1, so the candidate row count is
    # provably ≤ Σ_kept df·(df-1)/2 ≤ block × max_df — sub-quadratic
    # by construction.
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        shingle_hashes,
    )

    B, CAP = 3000, 100
    boiler = "shared boilerplate footer sentence here"
    planted = spark.range(B).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.format_string("u%d v%d w%d ", "id", "id", "id"), F.lit(boiler)
        ).alias("text"),
        F.lit("blk").alias("lang"),
    )
    stats = {}
    with cached_scope():
        t0 = time.perf_counter()
        capped_pairs = ngram_jaccard_pairs(
            planted,
            "doc_id",
            block_col="lang",
            n=3,
            threshold=0.1,
            max_df=CAP,
            df_stats=stats,
        ).count()
        dt = round(time.perf_counter() - t0, 1)
    kept_fanout = (
        planted.select(
            "lang", F.explode(shingle_hashes(F.col("text"), 3)).alias("h")
        )
        .groupBy("lang", "h")
        .count()
        .where(F.col("count") <= CAP)
        .agg(
            F.coalesce(
                F.sum(F.col("count") * (F.col("count") - 1) / 2), F.lit(0)
            ).alias("cand")
        )
        .first()
        .cand
    )
    print(
        f"ngram_jaccard planted-boilerplate block (B={B}, cap={CAP}): "
        f"{capped_pairs} pairs in {dt}s, stats={stats}, "
        f"kept-key candidate bound={int(kept_fanout)}"
    )
    assert stats["max_df_seen"] == B, "planted shingle not seen block-wide"
    assert stats["capped_shingle_keys"] >= 3, "boilerplate keys not capped"
    assert kept_fanout <= B * CAP, "df cap failed to bound the fan-out"

    # round-8: pack_sequences on a planted mega-stratum — a real
    # pretraining corpus is dominated by one stratum (English web), so
    # the per-stratum prefix-sum window degenerates to ONE sort task
    # over most of the corpus. The bucketed face must (a) produce the
    # identical layout and (b) bound every window task by the bucket
    # width instead of the stratum size.
    from etl_prometheus2clickhouse_spark.operators.text import (
        pack_sequences,
        pack_sequences_bucketed,
    )

    N = 300_000 * k
    BUCKET_W = 50_000
    mega = spark.range(N).select(
        # ~97% of rows land in the mega stratum
        F.when(F.col("id") % 32 == 0, F.lit("rare"))
        .otherwise(F.lit("en"))
        .alias("lang"),
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000))).alias("n_tok"),
    ).persist()
    mega.count()
    t0 = time.perf_counter()
    plain_n = pack_sequences(mega, "lang", "doc_id", "n_tok", 2048).count()
    t_plain = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    bucketed = pack_sequences_bucketed(
        mega, "lang", "doc_id", "n_tok", 2048,
        bucket=F.floor(F.col("doc_id") / BUCKET_W),
    )
    bucketed_n = bucketed.count()
    t_bucketed = round(time.perf_counter() - t0, 1)
    # structural skew bound: no window task sees more than a bucket
    max_task = (
        mega.groupBy("lang", F.floor(F.col("doc_id") / BUCKET_W))
        .count()
        .agg(F.max("count").alias("m"))
        .first()
        .m
    )
    diff = (
        pack_sequences(mega, "lang", "doc_id", "n_tok", 2048)
        .exceptAll(bucketed)
        .count()
    )
    mega.unpersist()
    print(
        f"pack_sequences mega-stratum (N={N}, 97% one stratum): "
        f"plain {plain_n} rows in {t_plain}s (1 task sorts ~{int(N*0.97)}); "
        f"bucketed {bucketed_n} rows in {t_bucketed}s "
        f"(max window task {max_task} rows)"
    )
    assert diff == 0, "bucketed layout diverged from per-stratum layout"
    assert max_task <= BUCKET_W, "bucket bound violated"

    # round-9: the persisted PQ code table. Build once (pq_encode →
    # parquet), then the query-time candidate scan must read ONLY
    # (id, codes) from the code table — asserted on the plan's
    # ReadSchema, which is the whole 100 TB economics: m smallints per
    # vector instead of the float vector column — and must return
    # exactly what the inline encode-in-scan path returns with the
    # same quantizer.
    import contextlib
    import io
    import shutil
    import tempfile

    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_pq_codes,
        pq_encode,
        pq_train,
    )

    model = pq_train(embs, dim=64, m=8, k_codes=32, id_col="vec_id")
    codes_dir = tempfile.mkdtemp(prefix="smoke_pq_codes_")
    try:
        t0 = time.perf_counter()
        pq_encode(embs, model, id_col="vec_id").write.mode(
            "overwrite"
        ).parquet(codes_dir)
        t_build = round(time.perf_counter() - t0, 1)
        codes_tbl = spark.read.parquet(codes_dir)
        pqc = lambda: cosine_topk_pq_codes(  # noqa: E731
            codes_tbl, model, embs, q10, id_col="vec_id",
            k=10, n_candidates=100,
        )
        run(f"cosine_topk_pq_codes (table built once in {t_build}s)", pqc)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pqc().explain("formatted")
        plan_txt = buf.getvalue()
        assert codes_dir in plan_txt, "codes scan missing from plan"
        assert (
            "struct<id:bigint,codes:array<smallint>>" in plan_txt
        ), "candidate scan reads more than (id, codes) from the code table"
        with cached_scope():
            from_codes = {
                (r.query_id, r.neighbor_id, r.rank) for r in pqc().collect()
            }
            inline = {
                (r.query_id, r.neighbor_id, r.rank)
                for r in cosine_topk_pq(embs, q10, **pq_kwargs).collect()
            }
        assert from_codes == inline, "codes-scan path diverged from inline"
        print(f"  codes-scan parity with inline PQ: {len(from_codes)} rows equal")
    finally:
        shutil.rmtree(codes_dir, ignore_errors=True)

    # round-9: the cell-partitioned IVFADC table — probe pruning as
    # storage layout. The probe-set union must surface as a partition
    # filter (directories pruned at listing time) and the scan's
    # ReadSchema must carry only (id, codes) — `cell` is partition
    # metadata, never read from data files.
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
        cosine_topk_ivfpq_codes,
        ivfpq_encode,
        ivfpq_train,
    )

    ivf_model = ivfpq_train(
        embs, dim=64, n_cells=64, m=8, k_codes=32, id_col="vec_id"
    )
    ivf_dir = tempfile.mkdtemp(prefix="smoke_ivfpq_codes_") + "/tbl"
    try:
        t0 = time.perf_counter()
        ivfpq_encode(embs, ivf_model, id_col="vec_id").write.partitionBy(
            "cell"
        ).parquet(ivf_dir)
        t_build = round(time.perf_counter() - t0, 1)
        ivf_tbl = spark.read.parquet(ivf_dir)
        ivfq = lambda: cosine_topk_ivfpq_codes(  # noqa: E731
            ivf_tbl, ivf_model, embs, q10, id_col="vec_id",
            k=10, n_probe=8, n_candidates=100,
        )
        run(f"cosine_topk_ivfpq_codes (cell-partitioned, built {t_build}s)",
            ivfq)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ivfq().explain("formatted")
        plan_txt = buf.getvalue()
        pf_line = next(
            (ln for ln in plan_txt.splitlines()
             if "PartitionFilters: [cell" in ln), None
        )
        assert pf_line is not None, "probe set not pushed as partition filter"
        # Spark renders small probe sets as `cell IN (a,b,...)` and
        # larger ones as the optimized `cell INSET a,b,...`
        if "IN (" in pf_line:
            vals = pf_line.split("IN (")[1].split(")")[0]
        else:
            vals = pf_line.split("INSET ")[1].split("]")[0]
        n_pruned = len(vals.split(","))
        assert n_pruned <= 64, pf_line
        assert "struct<id:bigint,codes:array<smallint>>" in plan_txt
        print(
            f"  probe union pruned to {n_pruned}/64 cell directories; "
            "scan reads (id, codes) only"
        )
        with cached_scope():
            inline_ivf = {
                (r.query_id, r.neighbor_id, r.rank)
                for r in cosine_topk_ivfpq(
                    embs, q10, dim=64, id_col="vec_id", k=10,
                    n_cells=64, n_probe=8, m=8, k_codes=32,
                    n_candidates=100,
                ).collect()
            }
            from_ivf_codes = {
                (r.query_id, r.neighbor_id, r.rank)
                for r in ivfq().collect()
            }
        assert from_ivf_codes == inline_ivf, "ivfpq codes path diverged"
        print(f"  ivfpq codes-scan parity: {len(from_ivf_codes)} rows equal")
    finally:
        shutil.rmtree(ivf_dir.rsplit("/", 1)[0], ignore_errors=True)

    # round-9: CMS partials at a K×-multiplied vocabulary — the sketch
    # state must stay GEOMETRY-bounded (batches × groups × depth ×
    # width) while the corpus and its vocabulary grow K×; that
    # vocabulary-independence is the entire point of the counter
    # table. One partial per synthetic ingestion batch (= copy id),
    # exact-by-linearity merge, broadcast probe.
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters_from_sketch,
        cms_merge,
        cms_partial_sketches,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "user_id"
    )
    ev_copies = [
        ev.select(
            "event_type",
            F.concat(F.col("user_id").cast("string"), F.lit(f"#{i}")).alias(
                "item"
            ),
            F.lit(i).alias("batch"),
        )
        for i in range(k)
    ]
    occ_big = ev_copies[0]
    for c in ev_copies[1:]:
        occ_big = occ_big.unionByName(c)
    occ_big = occ_big.persist()
    n_occ = occ_big.count()
    n_groups = occ_big.select("event_type").distinct().count()
    DEPTH, WIDTH = 3, 1024
    with cached_scope():
        t0 = time.perf_counter()
        partials = cms_partial_sketches(
            occ_big, ["event_type"], "item", "batch", DEPTH, WIDTH
        ).persist()
        n_partial_rows = partials.count()
        sketch = cms_merge(partials, ["event_type"]).persist()
        n_merged_rows = sketch.count()
        hh = cms_heavy_hitters_from_sketch(
            occ_big.drop("batch"), sketch, ["event_type"], "item",
            phi=0.001, depth=DEPTH, width=WIDTH,
        ).count()
        dt = round(time.perf_counter() - t0, 1)
        partials.unpersist()
        sketch.unpersist()
    occ_big.unpersist()
    print(
        f"cms partials @K={k}: {n_occ} occurrences ({k}x vocabulary) → "
        f"{n_partial_rows} partial rows, {n_merged_rows} merged rows, "
        f"{hh} heavy hitters in {dt}s"
    )
    assert n_partial_rows <= k * n_groups * DEPTH * WIDTH, (
        "partial state exceeded batches × groups × geometry"
    )
    assert n_merged_rows <= n_groups * DEPTH * WIDTH, (
        "merged sketch exceeded groups × geometry"
    )

    # ---- exact substring dedup at K× (round-9 late) ------------------
    # The K-multiplied corpus is the ADVERSARY for this operator: every
    # 5-token window of every original doc is now duplicated K times
    # (only the per-copy suffix tail is unique), i.e. ~100% of
    # positions hit the dup set. The structural claims: hit positions
    # merge to ONE island per document (span rows == docs, not
    # positions — the gaps-and-islands stage compacts before output),
    # and the job completes in corpus-linear time even at full
    # duplication.
    t0 = time.perf_counter()
    span_rows = exact_substring_spans(docs, "doc_id", "text", min_len=5).count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"exact_substring_spans @K={k}: {span_rows} spans over {n_docs} "
          f"fully-duplicated docs in {dt}s")
    assert span_rows == n_docs, (
        "full-duplication corpus must merge to exactly one span per doc"
    )

    # ---- LM perplexity at K× (round-9 late) --------------------------
    # Reference = the original copy (ids < 1M), corpus = the other K-1
    # copies. The broadcast discipline must hold at this volume: the
    # plan may not contain a corpus-shuffling join on a word key.
    ref = docs.where(F.col("doc_id") < 1_000_000)
    corp = docs.where(F.col("doc_id") >= 1_000_000)
    pp = lm_perplexity(corp, ref)
    plan = pp._sc._jvm.PythonSQLUtils.explainString(
        pp._jdf.queryExecution(), "simple"
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "LM join shuffled the corpus token stream"
    )
    t0 = time.perf_counter()
    pp_rows = pp.count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"lm_perplexity @K={k}: {pp_rows} scored docs "
          f"(corpus {(k - 1) * n_docs // k}) in {dt}s, broadcast-only joins")
    assert pp_rows == (k - 1) * n_docs // k, (
        "every corpus doc (all ≥ 2 tokens here) must be scored"
    )

    # ---- SemDeDup at K× (round-9 late) -------------------------------
    # Embedding copies are EXACT duplicates (ids shifted, vectors
    # identical) → identical cell assignment, within-cell cosine 1.0:
    # at a near-1 threshold the operator must collapse every K-clique
    # to its lowest id — kept == originals, and every survivor is from
    # the i=0 copy. This exercises the worst-case Σ|cell|² pair volume
    # (K² per original per cell) while the qualifying-pair prefilter
    # keeps the aggregate input bounded.
    with cached_scope():
        t0 = time.perf_counter()
        sd = semantic_dedup(
            embs, dim=64, n_cells=64, threshold=0.999999,
            centroids="kmeans",
        ).persist()
        kept = sd.where(F.col("kept")).count()
        stray = sd.where(F.col("kept") & (F.col("vec_id") >= 1_000_000)).count()
        dt = round(time.perf_counter() - t0, 1)
        sd.unpersist()
    print(f"semantic_dedup @K={k}: {kept} kept of {n_vecs} "
          f"({k}x exact-dup cliques) in {dt}s")
    assert kept == n_vecs // k, "each K-clique must keep exactly one"
    assert stray == 0, "survivor must be the lowest id (the i=0 copy)"

    # ---- NB classification + BM25 retrieval at K× (round-9 late) ----
    # Same broadcast-discipline claim as lm_perplexity: the model /
    # query side is bounded (reference vocabulary × classes; query
    # terms), so neither plan may shuffle the corpus token stream
    # through a SortMergeJoin on a word key. Labels for NB come from
    # the docs' lang column; the reference is the original copy.
    d0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    labeled = d0.select("doc_id", "lang", "text")
    corpus_lbl = labeled
    for i in range(1, k):
        corpus_lbl = corpus_lbl.unionByName(
            d0.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                "lang",
                F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
            )
        )
    nb = nb_classify(
        corpus_lbl.where(F.col("doc_id") >= 1_000_000),
        labeled,
    )
    plan = nb._sc._jvm.PythonSQLUtils.explainString(
        nb._jdf.queryExecution(), "simple"
    )
    # the ONLY sort-merge joins allowed are the corpus-sized id-keyed
    # ones (doc x class score assembly, per-doc oov counts) — never a
    # word-keyed join of the token stream; the dense model table and
    # the class frames must broadcast
    assert "BroadcastHashJoin" in plan
    t0 = time.perf_counter()
    nb_rows = nb.count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"nb_classify @K={k}: {nb_rows} classified docs in {dt}s")
    assert nb_rows == (k - 1) * n_docs // k

    queries = (
        docs.where(F.col("doc_id") < 1_000_000)
        .select(
            F.col("doc_id").alias("query_id"),
            F.slice(_smoke_words(F.col("text")), 1, 4).alias("terms"),
        )
        .orderBy("query_id")
        .limit(50)
    )
    bm = bm25_search(docs, queries, k=10)
    plan = bm._sc._jvm.PythonSQLUtils.explainString(
        bm._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in plan
    t0 = time.perf_counter()
    bm_rows = bm.count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"bm25_search @K={k}: {bm_rows} result rows "
          f"(50 queries x top-10) in {dt}s")
    assert bm_rows == 50 * 10, "every query must fill its top-10 here"

    # ---- round-10 front door: HTML extraction at K× ----------------
    # The claim: expression-only, shuffle-free until the final doc-
    # keyed aggregate — so the plan must carry exactly ONE Exchange
    # and no Python eval node, at ANY corpus size.
    from etl_prometheus2clickhouse_spark.operators.html import (
        cap_per_domain,
        html_extract,
        with_url_features,
    )

    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><div class="nav"><a href="/">Home</a>'
                  "</div><div><p>"),
            F.replace(F.col("text"), F.lit(". "), F.lit(".</p><p>")),
            F.lit("</p></div></body></html>"),
        ).alias("html"),
    )
    hx = html_extract(pages)
    plan = hx._sc._jvm.PythonSQLUtils.explainString(
        hx._jdf.queryExecution(), "formatted"
    )
    import re as _re

    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert len(_re.findall(r"^\(\d+\) Exchange$", plan, flags=_re.M)) == 1
    t0 = time.perf_counter()
    hx_rows = hx.count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"html_extract @K={k}: {hx_rows} pages extracted in {dt}s")
    assert hx_rows == n_docs

    # ---- round-10: per-domain caps at K× ----------------------------
    # The anti-spam quota must be a WindowGroupLimit: map tasks emit
    # ≤ cap rows per domain BEFORE the shuffle, so the K-times-bigger
    # spam domain costs the same shuffle rows as at K=1.
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www.site"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    capped = cap_per_domain(with_url_features(urls), cap=5, id_col="doc_id")
    plan = capped._sc._jvm.PythonSQLUtils.explainString(
        capped._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan
    t0 = time.perf_counter()
    cap_rows = capped.count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"cap_per_domain @K={k}: {cap_rows} kept from {k}x corpus in {dt}s")
    assert cap_rows == 7 * 5, "exactly cap rows per domain regardless of K"

    # ---- round-10: BPE distributed training + apply at K× -----------
    # Force the distributed route (driver_vocab_threshold=0) on the
    # multiplied corpus: each round is one map-side-combining pair
    # aggregate over the vocabulary table; the apply plan must stay
    # shuffle-free and Python-free.
    from etl_prometheus2clickhouse_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
    )

    t0 = time.perf_counter()
    merges = bpe_train(docs, n_merges=8, driver_vocab_threshold=0)
    dt = round(time.perf_counter() - t0, 1)
    print(f"bpe_train(distributed) @K={k}: {len(merges)} merges in {dt}s")
    assert len(merges) == 8
    applied = bpe_apply(docs, merges)
    plan = applied._sc._jvm.PythonSQLUtils.explainString(
        applied._jdf.queryExecution(), "formatted"
    )
    # r16: the single-split input spread may add ONE round-robin
    # repartition straight off the scan (it no-ops once the corpus
    # has >= parallelism splits); a KEY shuffle or a Python eval node
    # in the encode path still fails the witness. Formatted explain
    # prints each node twice (tree + numbered details) — count the
    # numbered operator entries only.
    import re as _re

    assert "hashpartitioning" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", plan, flags=_re.M))
    assert n_ex <= 1 and (n_ex == 0 or "RoundRobinPartitioning" in plan)
    t0 = time.perf_counter()
    ap_rows = applied.count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"bpe_apply @K={k}: {ap_rows} docs tokenized in {dt}s")
    assert ap_rows == n_docs

    # ---- round-10: MP4 demux fan-out at K× --------------------------
    # Per-file Python byte arithmetic behind mapInPandas: output rows
    # = Σ per-file sample counts exactly (no dropped or duplicated
    # samples under fan-out), linear in files.
    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        demux_mp4,
    )
    from etl_prometheus2clickhouse_spark.plans.catalog import _mp4_file_hex

    n_files = 20_000 * max(1, k // 2)
    vids = (
        spark.range(n_files)
        .select(
            F.col("id"),
            F.unhex(_mp4_file_hex(F.col("id"))).alias("content"),
        )
    )
    dm = demux_mp4(vids, "content", "id")
    t0 = time.perf_counter()
    dm_rows = dm.count()
    dt = round(time.perf_counter() - t0, 1)
    print(f"demux_mp4 @{n_files} files: {dm_rows} samples in {dt}s")
    # N = 2 + id%3 samples per file → exact expected total
    expected = sum(2 + i % 3 for i in range(n_files))
    assert dm_rows == expected

    # ---- round-10 late: corpus paragraph dedup at K× ----------------
    # The multiplied corpus repeats every document body K times (only
    # the copytag tail chunk differs per copy), so the paragraph
    # election must collapse the duplicated bodies: kept paragraphs
    # may grow by at most ~one modified tail chunk per document copy,
    # NOT by K× the base kept count. Plan must stay pure-JVM.
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        paragraph_dedup,
    )

    def _chunked(src):
        words = F.split(F.col("text"), " ")
        n_chunks = F.ceil(F.size(words) / F.lit(5.0)).cast("int")
        paras = F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(words, i * 5 + 1, 5), " "
                ),
            ),
            chr(10),
        )
        return src.select("doc_id", paras.alias("text"))

    pd_out = paragraph_dedup(_chunked(docs), "doc_id", "text", chr(10))
    plan = pd_out._sc._jvm.PythonSQLUtils.explainString(
        pd_out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept_1 = (
        paragraph_dedup(_chunked(base), "doc_id", "text", chr(10))
        .agg(F.sum("n_kept"))
        .first()[0]
    )
    t0 = time.perf_counter()
    agg = pd_out.agg(F.sum("n_kept"), F.sum("n_paras")).first()
    kept_k, total_k = agg[0], agg[1]
    dt = round(time.perf_counter() - t0, 1)
    print(
        f"paragraph_dedup @K={k}: kept {kept_k}/{total_k} paragraphs "
        f"(base corpus kept {kept_1}) in {dt}s"
    )
    assert kept_k >= kept_1, "dedup lost base-corpus paragraphs"
    assert kept_k <= kept_1 + 2 * n_docs, (
        f"K-duplicated bodies leaked past the election: {kept_k} kept "
        f"vs bound {kept_1 + 2 * n_docs}"
    )

    # ---- round-10 late: HLL state bound + exact merge at K× ---------
    # Partial-sketch state is groups × batches × m registers EXACTLY,
    # corpus-size-independent; and because the value column is the
    # per-copy-stable original id, the merged K× estimate must equal
    # the base corpus one-shot BIT-FOR-BIT (register maxima are
    # idempotent under duplication).
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        hll_distinct,
        hll_merge,
        hll_partial_sketches,
    )

    keyed = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(1_000_000)).alias("orig_id"),
        F.pmod(F.col("doc_id"), F.lit(5)).cast("int").alias("grp"),
        (F.col("doc_id") / F.lit(1_000_000)).cast("int").alias("batch"),
    )
    t0 = time.perf_counter()
    parts = hll_partial_sketches(keyed, ["grp"], "orig_id", "batch", p=6)
    n_parts = parts.count()
    merged = {
        r.grp: r for r in hll_merge(parts, ["grp"], p=6).collect()
    }
    dt = round(time.perf_counter() - t0, 1)
    base_keyed = keyed.where(F.col("batch") == 0)
    oneshot = {
        r.grp: r
        for r in hll_distinct(base_keyed, ["grp"], "orig_id", p=6).collect()
    }
    print(
        f"hll @K={k}: {n_parts} partial sketches "
        f"(= groups x batches), merged in {dt}s"
    )
    assert n_parts == 5 * k, "HLL state must be groups x batches exactly"
    for g in merged:
        assert merged[g].harmonic_scaled == oneshot[g].harmonic_scaled
        assert merged[g].est_distinct == oneshot[g].est_distinct

    # ---- round-10 late: z-order bucket ranges on a 2M-row grid ------
    # 16 z-prefix buckets over two uniform 0..4095 dims: every bucket
    # must cover at most a quarter of EACH dim's range (top-2 bits of
    # both dims fixed inside a bucket) and hold ~1/16 of the rows —
    # the bounded per-file min/max rectangles that make skipping work.
    from etl_prometheus2clickhouse_spark.operators.layout import (
        zorder_stats,
    )

    grid = spark.range(2_000_000).select(
        (F.col("id") % 4096).alias("x"),
        F.pmod(F.col("id") * 2654435761, F.lit(4096)).alias("y"),
    )
    t0 = time.perf_counter()
    zrows = zorder_stats(
        grid, ["x", "y"], bits=8, prefix_bits=4,
        bounds={"x": (0, 4095), "y": (0, 4095)},
    ).collect()
    dt = round(time.perf_counter() - t0, 1)
    print(f"zorder_stats @2M rows: {len(zrows)} buckets in {dt}s")
    assert len(zrows) == 16
    for r in zrows:
        assert r.max_x - r.min_x < 1024, f"x range leaked: {r}"
        assert r.max_y - r.min_y < 1024, f"y range leaked: {r}"
        assert 0.5 * 2_000_000 / 16 < r.n_rows < 2.0 * 2_000_000 / 16

    # round-11: READ-side Z-order witness — complete the loop from the
    # write-side envelope check: write the 2M grid z-ordered, run a
    # 1/64 two-dim range rectangle, and assert footer statistics prune
    # most row groups (the unsorted layout prunes zero) while the
    # surviving groups still hold every matching row.
    from etl_prometheus2clickhouse_spark.operators.layout import (
        write_zordered,
        zorder_pruning_stats,
    )

    z_dir = tempfile.mkdtemp(prefix="smoke_zorder_")
    try:
        write_zordered(
            grid, f"{z_dir}/z", ["x", "y"], n_files=64, bits=8,
            bounds={"x": (0, 4095), "y": (0, 4095)},
        )
        grid.repartition(64).write.parquet(f"{z_dir}/plain")
        ranges = {"x": (512, 1023), "y": (2048, 2559)}
        zst = zorder_pruning_stats(f"{z_dir}/z", ranges)
        pst = zorder_pruning_stats(f"{z_dir}/plain", ranges)
        pred = (F.col("x").between(512, 1023)) & (
            F.col("y").between(2048, 2559)
        )
        got_z = spark.read.parquet(f"{z_dir}/z").where(pred).count()
        got_p = spark.read.parquet(f"{z_dir}/plain").where(pred).count()
        assert got_z == got_p > 0, (got_z, got_p)
        assert pst["skipped"] == 0, pst
        assert zst["skipped"] >= 0.6 * zst["total"], zst
        print(
            f"zorder read witness @2M rows: {zst['skipped']}/"
            f"{zst['total']} row groups skipped on footer stats "
            f"({zst['rows_skipped']}/{zst['rows_total']} rows never "
            f"read); unsorted layout skipped {pst['skipped']}; answers "
            "identical"
        )
    finally:
        shutil.rmtree(z_dir, ignore_errors=True)

    # round-11: segment-stitch EWMA under a PLANTED HOT SERIES — one
    # key carrying 2M samples over 100 days. The plain face collects
    # the whole series into one task (the documented contract this
    # face deletes); the bucketed face's per-task state is one DAY of
    # the series. Assert the bound analytically (max per-(key,bucket)
    # group == series/days, 100× under the series) and the two faces
    # value-equal on the planted data.
    from etl_prometheus2clickhouse_spark.operators.timeseries import (
        ewma,
        ewma_bucketed,
    )

    hot = spark.range(2_000_000).select(
        F.lit("hot").alias("k"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id") * 4.32)
        ).alias("ts"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 10.0).alias(
            "value"
        ),
    )
    max_bucket_rows = (
        hot.groupBy("k", F.date_trunc("day", "ts"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_bucket_rows <= 2_000_000 / 100 + 1, max_bucket_rows
    t0 = time.perf_counter()
    b_row = ewma_bucketed(hot, ["k"]).collect()[0]
    t_b = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    p_row = ewma(hot, ["k"]).collect()[0]
    t_p = round(time.perf_counter() - t0, 1)
    assert (b_row.n_samples, b_row.last_sec, b_row.ewma) == (
        p_row.n_samples, p_row.last_sec, p_row.ewma,
    )
    print(
        f"ewma_bucketed @2M-sample hot series: per-task state capped at "
        f"{max_bucket_rows} rows (plain face: 2,000,000); bucketed "
        f"{t_b}s vs plain {t_p}s, values equal"
    )

    # round-11: incremental dedup probe must scale with the SHARD, not
    # the corpus — build the persisted band index over the K×-
    # multiplied corpus at 512 partition prefixes, probe it with a
    # 5-document shard, and assert (a) the shard's bb set is pushed as
    # a PARTITION filter on the bands read and (b) the probe touches
    # at most the shard's own band count of prefixes (5 docs × 16
    # bands = ≤80 of 512 directories — the other ≥432 are pruned at
    # file listing, exactly the IVFPQ probe-set discipline).
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        dedup_increment,
        minhash_index_build,
        probed_bands_plan,
    )

    idx_dir = tempfile.mkdtemp(prefix="smoke_mhidx_") + "/idx"
    try:
        t0 = time.perf_counter()
        with cached_scope():
            minhash_index_build(
                docs, idx_dir, id_col="doc_id", threshold=0.5,
                index_buckets=512,
            )
        t_build = round(time.perf_counter() - t0, 1)
        shard = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
            F.col("doc_id") < 5
        ).select((F.col("doc_id") + 90_000_000).alias("doc_id"), "text")
        with cached_scope():
            t0 = time.perf_counter()
            inc = dedup_increment(
                docs.select("doc_id"), shard, idx_dir, id_col="doc_id"
            )
            n_inc = inc.where(~F.col("is_canonical")).count()
            t_probe = round(time.perf_counter() - t0, 1)
        print(
            f"dedup_increment: index over {n_docs} docs built in "
            f"{t_build}s; 5-doc shard probed in {t_probe}s "
            f"({n_inc} non-canonical rows)"
        )
        shard_bbs = sorted(
            r.bb
            for r in spark.read.parquet(f"{idx_dir}/bands")
            .select("bb").distinct().collect()
        )
        # re-derive the shard's probe set exactly as the operator does
        # and pin the partition filter on the plan
        probe_plan = probed_bands_plan(spark, idx_dir, shard_bbs[:80])
        pf_line = next(
            (ln for ln in probe_plan.splitlines()
             if "PartitionFilters: [bb" in ln), None
        )
        assert pf_line is not None, (
            "shard bb set not pushed as partition filter"
        )
        if "IN (" in pf_line:
            vals = pf_line.split("IN (")[1].split(")")[0]
        else:
            vals = pf_line.split("INSET ")[1].split("]")[0]
        n_probe_dirs = len(vals.split(","))
        assert n_probe_dirs <= 80 < 512, pf_line
        print(
            f"  probe pruned to {n_probe_dirs}/512 band-bucket "
            "directories (shard-sized, corpus-size-independent)"
        )

        # round-12: probe ECONOMICS — the timing-independent bound the
        # partition-filter assertion implies but doesn't measure: the
        # probed partitions' file/byte share of the index IS the probe's
        # I/O upper bound. An 80-prefix probe of a 512-prefix index may
        # touch at most ~80/512 of the bytes (uniform hashing; 2×
        # slack for file-size variance).
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            probe_economics,
        )

        b_econ = probe_economics(
            spark, f"{idx_dir}/bands", "bb", shard_bbs[:80]
        )
        assert b_econ["files_total"] > 0, b_econ
        assert b_econ["bytes_probed"] <= 2 * (80 / 512) * b_econ[
            "bytes_total"
        ], b_econ
        print(
            f"  band-probe economics: {b_econ['files_probed']}/"
            f"{b_econ['files_total']} files, {b_econ['bytes_probed']}/"
            f"{b_econ['bytes_total']} bytes — ≤ probed-partition share"
        )
        # verify side: the shingles store is id-bucketed at the same
        # 512 prefixes; a 5-doc shard's candidate set maps to ≤ ~10
        # prefixes, so the exact-verify read is bounded by that share
        # of the corpus shingle bytes — probe a 10-prefix set and
        # assert the share (the round-11 gap this round closes)
        s_econ = probe_economics(
            spark, f"{idx_dir}/shingles", "ip", list(range(10))
        )
        assert s_econ["files_total"] > 0, s_econ
        assert s_econ["bytes_probed"] <= 2 * (10 / 512) * s_econ[
            "bytes_total"
        ], s_econ
        print(
            f"  shingle-verify economics: {s_econ['files_probed']}/"
            f"{s_econ['files_total']} files, {s_econ['bytes_probed']}/"
            f"{s_econ['bytes_total']} bytes for a 10-prefix candidate set"
        )

        # round-12: BOUNDED components rewrite — an update-increment
        # must rewrite only the nb= partitions holding touched
        # clusters' members (the shard's 5 docs + their K-multiplied
        # duplicate clusters), never all 512. Snapshot the partition
        # dirs, run an update increment, and assert the changed set is
        # shard-cluster-sized.
        import os

        def _comp_state(d):
            out = {}
            for nb in os.listdir(d):
                if nb.startswith("nb="):
                    p = os.path.join(d, nb)
                    out[nb] = {
                        (f, os.path.getmtime(os.path.join(p, f)))
                        for f in os.listdir(p)
                        if not f.startswith((".", "_"))
                    }
            return out

        comp_dir = f"{idx_dir}/components"
        before = _comp_state(comp_dir)
        empty_corpus = spark.createDataFrame([], "doc_id long")
        with cached_scope():
            inc2 = dedup_increment(
                empty_corpus, shard, idx_dir, id_col="doc_id",
                update_index=True, update_label="w1",
            )
            inc2.where(~F.col("is_canonical")).count()
        after = _comp_state(comp_dir)
        changed = {
            d for d in set(before) | set(after)
            if before.get(d) != after.get(d)
        }
        assert changed, "update increment rewrote nothing"
        assert len(changed) < len(before), "rewrote every partition"
        # 5 shard docs × K-sized duplicate clusters + 5 new nodes:
        # prefix count bounded by member count, far under 512
        assert len(changed) <= 5 * k + 5, (len(changed), len(before))
        print(
            f"  components rewrite touched {len(changed)}/{len(before)} "
            "nb= partitions (shard-cluster-sized, not corpus-sized)"
        )

        # round-12: band-GEOMETRY migration (minhash_index_reband) at
        # K× corpus — the lifecycle event derives the whole new band
        # table from the STORED shingle sets (it takes no corpus
        # argument: corpus text CANNOT be re-read), and after the
        # manifest swap + vacuum the probe must stay partition-pruned
        # and byte-bounded on the NEW mb=reband-* layout.
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            index_stats,
            index_vacuum,
            minhash_index_reband,
        )

        n_ids = n_docs + 5  # corpus + the w1 update shard above
        t0 = time.perf_counter()
        rep = minhash_index_reband(spark, idx_dir, bands=32)
        t_reband = round(time.perf_counter() - t0, 1)
        assert rep["swapped"] and rep["bands"] == 32, rep
        assert rep["bands_rows"] == n_ids * 32, (rep, n_ids)
        st = index_stats(spark, idx_dir)
        assert (st["num_hashes"], st["bands"]) == (64, 32), st
        index_vacuum(spark, idx_dir)
        probe_plan3 = probed_bands_plan(spark, idx_dir, shard_bbs[:80])
        pf3 = next(
            (ln for ln in probe_plan3.splitlines()
             if "PartitionFilters: [bb" in ln), None
        )
        assert pf3 is not None, (
            "post-reband probe lost the bb partition filter"
        )
        r_econ = probe_economics(
            spark, f"{idx_dir}/bands", "bb", shard_bbs[:80]
        )
        assert r_econ["files_total"] > 0, r_econ
        assert r_econ["bytes_probed"] <= 2 * (80 / 512) * r_econ[
            "bytes_total"
        ], r_econ
        print(
            f"minhash_index_reband: 64x16 -> 64x32 over {n_ids} stored "
            f"shingle sets in {t_reband}s (no corpus re-read — the "
            f"operator has no corpus input); post-swap probe still "
            f"pruned: {r_econ['files_probed']}/{r_econ['files_total']} "
            f"files, {r_econ['bytes_probed']}/{r_econ['bytes_total']} "
            "bytes"
        )

        # round-13: the PER-BATCH probe byte witness on the REAL
        # streaming path — the K=10 one-shot witnesses above bound the
        # increments; this runs an actual foreachBatch stream through
        # curation_batch_body over the same 512-prefix index and
        # asserts, per micro-batch, that the batch's probed band bytes
        # ≤ its own probed-partition share (the witness derivation
        # mirrors the operator's probe-set construction and runs
        # BEFORE the body, against exactly the table state the body's
        # probe will read).
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            _read_meta,
            _shingle_sig_bands,
        )
        from etl_prometheus2clickhouse_spark.streaming.curation_stream import (  # noqa: E501
            curation_batch_body,
        )

        smoke_root = idx_dir.rsplit("/", 1)[0]
        ref_lm = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
            F.col("doc_id") % 97 == 0
        ).select("doc_id", "text").localCheckpoint()
        meta = _read_meta(spark, idx_dir)
        body = curation_batch_body(
            idx_dir, ref_lm, f"{smoke_root}/disp", 1e9
        )
        witness: list = []

        def witness_body(batch_df, batch_id):
            bdf = batch_df.select("doc_id", "text")
            with cached_scope():
                _sh, banded = _shingle_sig_bands(
                    bdf, "doc_id", "text", meta["n"],
                    meta["num_hashes"], meta["bands"],
                    meta["index_buckets"],
                )
                bbs = [
                    r.bb for r in banded.select("bb").distinct().collect()
                ]
            econ = probe_economics(spark, f"{idx_dir}/bands", "bb", bbs)
            assert econ["files_total"] > 0, (batch_id, econ)
            assert econ["bytes_probed"] <= 2 * (
                len(bbs) / meta["index_buckets"]
            ) * econ["bytes_total"], (batch_id, bbs, econ)
            witness.append((int(batch_id), len(bbs), econ))
            body(batch_df, batch_id)

        base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        for bn in range(2):
            base_docs.where(
                (F.col("doc_id") >= 5 * bn) & (F.col("doc_id") < 5 * (bn + 1))
            ).select(
                (F.col("doc_id") + 91_000_000).alias("doc_id"), "text"
            ).coalesce(1).write.parquet(f"{smoke_root}/stream_in/b{bn}")
        sq = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{smoke_root}/stream_in/b*")
            .writeStream.foreachBatch(witness_body)
            .option("checkpointLocation", f"{smoke_root}/stream_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        assert len(witness) >= 2, witness
        for bid, nbb, econ in witness:
            print(
                f"  stream batch {bid}: probe {econ['files_probed']}/"
                f"{econ['files_total']} files, {econ['bytes_probed']}/"
                f"{econ['bytes_total']} bytes over {nbb}/"
                f"{meta['index_buckets']} prefixes — per-batch bytes "
                "≤ probed-partition share on the live foreachBatch path"
            )
    finally:
        shutil.rmtree(idx_dir.rsplit("/", 1)[0], ignore_errors=True)

    # round-12: incremental SemDeDup probe — same discipline as the
    # band index, on the embedding side. Build the persisted vector
    # index over the K×-multiplied embeddings at 256 cells, probe it
    # with an 8-vector shard, and assert (a) the shard's cell set is a
    # PARTITION filter on the vectors read and (b) the probed cells'
    # byte share bounds the probe I/O (k-means cells over this corpus
    # are near-balanced; 4× slack covers occupancy variance).
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        probed_partition_plan,
    )
    from etl_prometheus2clickhouse_spark.operators.semantic_index import (
        semantic_increment,
        semantic_index_build,
    )

    sem_dir = tempfile.mkdtemp(prefix="smoke_semidx_") + "/idx"
    try:
        t0 = time.perf_counter()
        with cached_scope():
            semantic_index_build(
                embs, sem_dir, n_cells=256, threshold=0.5
            )
        t_build = round(time.perf_counter() - t0, 1)
        sem_shard = spark.read.parquet(
            f"{SF_DIR}/embeddings.parquet"
        ).where(F.col("vec_id") < 8).select(
            (F.col("vec_id") + 90_000_000).alias("vec_id"), "embedding"
        )
        with cached_scope():
            t0 = time.perf_counter()
            sem_out = semantic_increment(sem_shard, sem_dir)
            sem_rows = sem_out.collect()
            t_probe = round(time.perf_counter() - t0, 1)
        n_dup = sum(1 for r in sem_rows if not r.kept)
        probe_cells = sorted({r.cell for r in sem_rows})
        print(
            f"semantic_increment: index over {n_vecs} vectors built in "
            f"{t_build}s; 8-vector shard probed in {t_probe}s "
            f"({n_dup} duplicates, {len(probe_cells)} probed cells)"
        )
        sem_plan = probed_partition_plan(
            spark, f"{sem_dir}/vectors", "cell", probe_cells
        )
        sem_pf = next(
            (ln for ln in sem_plan.splitlines()
             if "PartitionFilters: [cell" in ln), None
        )
        assert sem_pf is not None, (
            "shard cell set not pushed as partition filter"
        )
        sem_econ = probe_economics(
            spark, f"{sem_dir}/vectors", "cell", probe_cells
        )
        assert sem_econ["files_total"] > 0, sem_econ
        assert sem_econ["bytes_probed"] <= 4 * (
            len(probe_cells) / 256
        ) * sem_econ["bytes_total"], sem_econ
        print(
            f"  vector-probe economics: {sem_econ['files_probed']}/"
            f"{sem_econ['files_total']} files, "
            f"{sem_econ['bytes_probed']}/{sem_econ['bytes_total']} "
            "bytes — ≤ probed-cell share (shard-sized, "
            "corpus-size-independent)"
        )
    finally:
        shutil.rmtree(sem_dir.rsplit("/", 1)[0], ignore_errors=True)

    # round-13: hot-cell skew witness + gated retrain on PLANTED drift.
    # Frozen quantizers are the IVF scale contract; the witness is the
    # telemetry that notices when drift concentrates the corpus into
    # one frozen cell (probe work is |q∩cell|×|corpus∩cell| — a hot
    # cell breaks the Σ|cell|² bound), and the retrain-on-skew hook
    # fires the existing recall-gated lifecycle event to repair it.
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_retrain_on_skew,
        ann_occupancy_skew,
    )

    ann_dir = tempfile.mkdtemp(prefix="smoke_annskew_") + "/idx"
    try:
        dim = 8
        rng_rows = [
            (i, [float(x) for x in np.eye(dim)[i % 4]
                 + 0.05 * np.random.default_rng(i).standard_normal(dim)])
            for i in range(512)
        ]
        base = spark.createDataFrame(
            rng_rows, "vec_id long, embedding array<double>"
        )
        ann_index_build(
            base, ann_dir, dim, n_cells=16, m=4, k_codes=16,
            train_sample=512, vec_buckets=8,
        )
        balanced = ann_occupancy_skew(spark, ann_dir)
        # planted drift: 2× the corpus mass in two WIDE (σ=0.6)
        # far-away clusters — each collapses into ~one frozen cell
        # (the hot-cell witness), and the width gives the exact
        # ground truth real structure, so the retrained per-cell
        # isolation shows up as a recall gain the gate can measure
        drift = spark.createDataFrame(
            [
                (10_000 + i,
                 [float(x) for x in -4.0 * np.eye(dim)[i % 2]
                  + 0.6 * np.random.default_rng(9_000 + i)
                  .standard_normal(dim)])
                for i in range(1024)
            ],
            "vec_id long, embedding array<double>",
        )
        ann_index_append(drift, ann_dir, "drift")
        skewed = ann_occupancy_skew(spark, ann_dir)
        assert skewed["skew"] > max(3.0, balanced["skew"]), (
            balanced, skewed,
        )
        queries = drift.where(F.col("vec_id") < 10_016)
        t0 = time.perf_counter()
        rep = ann_index_retrain_on_skew(
            spark, ann_dir, skew_threshold=3.0, queries=queries,
            k=5, n_probe=2, n_candidates=40, train_sample=768,
        )
        t_retrain = round(time.perf_counter() - t0, 1)
        assert rep["triggered"] and rep["swapped"], rep
        assert rep["recall_new"] >= rep["recall_old"], rep
        assert rep["skew_after"]["skew"] < skewed["skew"], rep
        print(
            "ann_index_retrain_on_skew: planted drift tripped the "
            f"witness (skew {balanced['skew']:.2f} -> "
            f"{skewed['skew']:.2f} of n_cells=16); recall-gated "
            f"retrain rebalanced to {rep['skew_after']['skew']:.2f} "
            f"in {t_retrain}s (recall {rep['recall_old']:.3f} -> "
            f"{rep['recall_new']:.3f})"
        )
    finally:
        shutil.rmtree(ann_dir.rsplit("/", 1)[0], ignore_errors=True)

    # round-13: persisted BM25 inverted index — the retrieval member of
    # the incremental layer. The economics claim: a query reads ONLY its
    # own terms' tp= partitions of the postings table, so serve cost is
    # |query-term buckets|/term_buckets of the index bytes, NOT a corpus
    # scan per query (the one-shot bm25_search's cost). Witnessed with
    # the same byte-counted, timing-independent probe_economics shape.
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        _tp,
        bm25_index_append,
        bm25_index_build,
        bm25_index_search,
    )

    # The economics split into the two inverted-index cost terms: a
    # probed bucket holds (a) ~1/term_buckets of everyone ELSE's
    # postings (uniform term hashing — assertable once the vocabulary
    # is wide enough for the law of large numbers) plus (b) the probed
    # terms' OWN postings lists, which for Zipf-hot terms (stopwords)
    # are a large byte mass in their own right — real inverted-index
    # physics, not a layout failure. The sf tables' synthetic Zipf
    # vocabulary is only tens of terms, so per-bucket mass there is a
    # lottery over which hot terms hash where; the witness therefore
    # PLANTS a wide-uniform-vocabulary corpus (the ann-skew pattern:
    # build the adversary the claim needs) and asserts (a) on it,
    # while recording (b) on the real multiplied corpus.
    bm_dir = tempfile.mkdtemp(prefix="smoke_bm25_") + "/idx"
    try:
        n_wdocs = 50_000 * max(1, k // 2)
        wide = spark.range(n_wdocs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(20)),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id") * 31 + j),
                            F.lit(100_000),
                        ),
                    ),
                ),
            ).alias("text"),
        )
        t0 = time.perf_counter()
        bm25_index_build(
            wide.where(F.col("doc_id") % 10 != 0), bm_dir,
            term_buckets=64,
        )
        t_build = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        bm25_index_append(
            wide.where(F.col("doc_id") % 10 == 0), bm_dir, "shard",
        )
        t_append = round(time.perf_counter() - t0, 1)
        # query terms: the first 4 tokens of 5 known docs — every term
        # has df ≈ n_wdocs·20/100k (uniform), so the probed buckets'
        # byte mass is the uniform share the bound states
        bm_q = wide.where(F.col("doc_id").isin([7, 997, 4242, 9001, 12345])).select(
            F.col("doc_id").alias("query_id"),
            F.slice(_smoke_words(F.col("text")), 1, 4).alias("terms"),
        )
        t0 = time.perf_counter()
        hits = bm25_index_search(bm_q, bm_dir, k=10)
        n_hits = hits.count()
        t_search = round(time.perf_counter() - t0, 1)
        probe_tps = sorted(
            r.tp
            for r in bm_q.select(
                F.explode("terms").alias("t")
            ).select(_tp(F.col("t"), 64).alias("tp")).distinct().collect()
        )
        assert len(probe_tps) <= 20, probe_tps
        bm_plan = probed_partition_plan(
            spark, f"{bm_dir}/postings", "tp", probe_tps
        )
        bm_pf = next(
            (ln for ln in bm_plan.splitlines()
             if "PartitionFilters: [tp" in ln), None
        )
        assert bm_pf is not None, "query tp set not pushed as filter"
        bm_econ = probe_economics(
            spark, f"{bm_dir}/postings", "tp", probe_tps
        )
        assert bm_econ["files_total"] > 0, bm_econ
        assert bm_econ["bytes_probed"] <= 2 * (
            len(probe_tps) / 64
        ) * bm_econ["bytes_total"], bm_econ
        print(
            f"bm25_index: build({n_wdocs * 9 // 10} wide-vocab docs) "
            f"{t_build}s, append {t_append}s, 5-query search {n_hits} "
            f"rows in {t_search}s; probe economics "
            f"{bm_econ['files_probed']}/{bm_econ['files_total']} files, "
            f"{bm_econ['bytes_probed']}/{bm_econ['bytes_total']} bytes "
            f"for {len(probe_tps)}/64 term buckets (≤ 2× uniform "
            "share) — serve cost is query-sized, corpus-size-independent"
        )
    finally:
        shutil.rmtree(bm_dir.rsplit("/", 1)[0], ignore_errors=True)

    # (b) recorded on the REAL multiplied corpus: hot leading tokens'
    # buckets carry the hot terms' own postings mass on top of the
    # uniform share — print, don't assert (the mass is the corpus's
    # term distribution, not the layout's doing)
    bm_dir2 = tempfile.mkdtemp(prefix="smoke_bm25hot_") + "/idx"
    try:
        bm25_index_build(docs, bm_dir2, term_buckets=64)
        hot_q = (
            docs.where(F.col("doc_id") % 997 == 0)
            .select(
                F.col("doc_id").alias("query_id"),
                F.slice(_smoke_words(F.col("text")), 1, 4).alias("terms"),
            )
            .orderBy("query_id")
            .limit(5)
        )
        hot_tps = sorted(
            r.tp
            for r in hot_q.select(
                F.explode("terms").alias("t")
            ).select(_tp(F.col("t"), 64).alias("tp")).distinct().collect()
        )
        hot_econ = probe_economics(
            spark, f"{bm_dir2}/postings", "tp", hot_tps
        )
        print(
            f"bm25_index hot-term record ({n_docs} real docs, tiny Zipf "
            f"vocabulary): {hot_econ['bytes_probed']}/"
            f"{hot_econ['bytes_total']} bytes for {len(hot_tps)}/64 "
            "buckets — uniform share + the hot terms' own postings mass"
        )
    finally:
        shutil.rmtree(bm_dir2.rsplit("/", 1)[0], ignore_errors=True)

    # round-14: the identity/deletion lifecycle's scale claims, on one
    # wide-vocab corpus (the law-of-large-numbers adversary again):
    # (1) REBUCKET — after migrating term_buckets 16 → 64 from the
    #     stored postings, search rows are IDENTICAL and the probe's
    #     byte witness is green AT THE NEW GEOMETRY (the probed share
    #     re-bounds to |query buckets|/64);
    # (2) DELETE — tombstoning docs keeps the probe a partition filter
    #     (the anti-join is a row-level cut on top of the pruned read),
    #     and the tombstone table the search additionally reads is
    #     delete-set-sized, orders below the postings it masks;
    # (3) OVERLAP GUARD — an append's id probe reads only the shard's
    #     own ip= buckets of the identity table (bounded share), never
    #     the postings.
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_delete,
        bm25_index_rebucket,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _ip as _smoke_ip,
    )

    bm_dir3 = tempfile.mkdtemp(prefix="smoke_bm25life_") + "/idx"
    try:
        n_ldocs = 30_000
        lwide = spark.range(n_ldocs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(20)),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id") * 37 + j),
                            F.lit(100_000),
                        ),
                    ),
                ),
            ).alias("text"),
        )
        bm25_index_build(
            lwide.where(F.col("doc_id") % 10 != 0), bm_dir3,
            term_buckets=16, id_buckets=64,
        )
        l_q = lwide.where(
            F.col("doc_id").isin([11, 1001, 4243])
        ).select(
            F.col("doc_id").alias("query_id"),
            F.slice(_smoke_words(F.col("text")), 1, 4).alias("terms"),
        )
        before = sorted(
            (r.query_id, r.doc_id, r.bm25, r.rank)
            for r in bm25_index_search(l_q, bm_dir3, k=10).collect()
        )
        t0 = time.perf_counter()
        rb = bm25_index_rebucket(spark, bm_dir3, 64)
        t_rebucket = round(time.perf_counter() - t0, 1)
        after = sorted(
            (r.query_id, r.doc_id, r.bm25, r.rank)
            for r in bm25_index_search(l_q, bm_dir3, k=10).collect()
        )
        assert before == after and after, "rebucket changed results"
        l_tps = sorted(
            r.tp
            for r in l_q.select(F.explode("terms").alias("t"))
            .select(_tp(F.col("t"), 64).alias("tp")).distinct().collect()
        )
        l_plan = probed_partition_plan(
            spark, f"{bm_dir3}/postings", "tp", l_tps
        )
        assert any(
            "PartitionFilters: [tp" in ln for ln in l_plan.splitlines()
        ), "rebucketed tp set not pushed as a partition filter"
        l_econ = probe_economics(
            spark, f"{bm_dir3}/postings", "tp", l_tps
        )
        assert l_econ["bytes_probed"] <= 2 * (
            len(l_tps) / 64
        ) * l_econ["bytes_total"], l_econ
        print(
            f"bm25_rebucket: 16→64 migration ({rb['posting_rows']} "
            f"stored postings, no corpus re-read) in {t_rebucket}s; "
            f"results identical; NEW-geometry probe economics "
            f"{l_econ['bytes_probed']}/{l_econ['bytes_total']} bytes "
            f"for {len(l_tps)}/64 buckets (≤ 2× uniform share)"
        )

        # (2) delete: tombstone 1% of the corpus, search stays pruned,
        # tombstone bytes are delete-sized
        dele = lwide.where(
            (F.col("doc_id") % 100 == 7) & (F.col("doc_id") % 10 != 0)
        ).select("doc_id")
        t0 = time.perf_counter()
        drep = bm25_index_delete(spark, bm_dir3, dele, "takedown")
        t_delete = round(time.perf_counter() - t0, 1)
        gone = {r.doc_id for r in dele.collect()}
        post_del = bm25_index_search(l_q, bm_dir3, k=10)
        assert not any(
            r.doc_id in gone for r in post_del.collect()
        ), "deleted doc surfaced in search"
        tomb_econ = probe_economics(
            spark, f"{bm_dir3}/tombstones", "ip",
            list(range(64)),
        )
        assert tomb_econ["bytes_total"] < 0.05 * l_econ["bytes_total"], (
            tomb_econ, l_econ,
        )
        print(
            f"bm25_delete: {drep['deleted_docs']} docs tombstoned in "
            f"{t_delete}s; searches stay partition-pruned and the "
            f"anti-join side reads {tomb_econ['bytes_total']} tombstone "
            f"bytes vs {l_econ['bytes_total']} postings bytes "
            "(delete-set-sized, not corpus-sized)"
        )

        # (3) overlap guard: the append probe reads only the shard's
        # own ip= buckets of the identity table
        shard = lwide.where(F.col("doc_id") % 10_000 == 1)
        shard_ips = sorted(
            r.ip
            for r in shard.select(
                _smoke_ip(
                    F.col("doc_id").cast("string"), 64
                ).alias("ip")
            ).distinct().collect()
        )
        ids_econ = probe_economics(
            spark, f"{bm_dir3}/ids", "ip", shard_ips
        )
        assert ids_econ["bytes_probed"] <= 2 * max(
            len(shard_ips) / 64, 1 / 64
        ) * ids_econ["bytes_total"] + 4096, ids_econ
        print(
            f"bm25 append overlap-guard probe: "
            f"{ids_econ['bytes_probed']}/{ids_econ['bytes_total']} "
            f"identity bytes for {len(shard_ips)}/64 id buckets — "
            "guard cost is shard-sized, zero postings bytes"
        )
    finally:
        shutil.rmtree(bm_dir3.rsplit("/", 1)[0], ignore_errors=True)

    # ---- substring-index takedown economics (round-15) ---------------
    # the window-index delete is one tombstone commit: the search-side
    # anti-join reads delete-set-sized tombstone bytes, never the
    # windows table, and probes stay partition-pruned
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        substring_increment,
        substring_index_build,
        substring_index_delete,
    )

    sub_root = tempfile.mkdtemp(prefix="smoke_subdel_")
    sub_dir = f"{sub_root}/idx"
    try:
        sub_corpus = docs.where(F.col("doc_id") % 4 == 0)
        t0 = time.perf_counter()
        substring_index_build(sub_corpus, sub_dir, min_len=5)
        t_build = round(time.perf_counter() - t0, 1)
        sdele = sub_corpus.where(F.col("doc_id") % 100 == 4).select(
            "doc_id"
        )
        t0 = time.perf_counter()
        srep = substring_index_delete(spark, sub_dir, sdele, "takedown")
        t_sdel = round(time.perf_counter() - t0, 1)
        assert srep["deleted_docs"] > 0
        win_econ = probe_economics(
            spark, f"{sub_dir}/windows", "hp", list(range(64))
        )
        stomb_econ = probe_economics(
            spark, f"{sub_dir}/tombstones", "ip", list(range(64))
        )
        assert stomb_econ["bytes_total"] < 0.05 * win_econ["bytes_total"], (
            stomb_econ, win_econ,
        )
        # the post-delete probe still runs (pruned reads + anti-join)
        sshard = docs.where(F.col("doc_id") % 4 == 1).limit(200)
        n_spans = substring_increment(sshard, sub_dir).count()
        print(
            f"substring takedown: build {t_build}s, "
            f"{srep['deleted_docs']} docs tombstoned in {t_sdel}s; "
            f"anti-join side reads {stomb_econ['bytes_total']} tombstone "
            f"bytes vs {win_econ['bytes_total']} window bytes "
            f"(delete-set-sized); post-delete shard probe: {n_spans} "
            "spans"
        )
    finally:
        shutil.rmtree(sub_root, ignore_errors=True)

    # ---- training-shard takedown economics (round-16) ----------------
    # the published-output sweep: with a recorded key spec the affected
    # shard set is recomputed from the delete ids alone (zero corpus
    # bytes, zero file listings to PLAN), and the rewrite touches only
    # those __shard= dirs — bytes rewritten ≈ affected-shard bytes,
    # never the table
    import os as _os

    from etl_prometheus2clickhouse_spark.operators.sampling import (
        mix_corpora,
        write_training_shards,
    )
    from etl_prometheus2clickhouse_spark.operators.shards import (
        shards_delete,
    )

    shard_root = tempfile.mkdtemp(prefix="smoke_shards_")
    shard_dir = f"{shard_root}/shards"
    n_shards = 64
    try:
        # _multiplied_docs carries no lang — synthesize a deterministic
        # two-way split so both mix sources are exercised
        ids_only = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .otherwise("de")
            .alias("lang"),
        )
        mixed = mix_corpora(
            [
                (ids_only.where(F.col("lang") == "en"), "web_en", 0.25),
                (ids_only.where(F.col("lang") != "en"), "curated", 1.0),
            ],
            id_col="doc_id",
        )
        t0 = time.perf_counter()
        write_training_shards(
            mixed, shard_dir, n_shards,
            key_spec={
                "kind": "mix_corpora", "salt": 12345,
                "sources": [{"name": "web_en", "rate": 0.25},
                            {"name": "curated", "rate": 1.0}],
            },
        )
        t_write = round(time.perf_counter() - t0, 1)

        def _dir_bytes(d):
            return sum(
                _os.path.getsize(_os.path.join(d, f))
                for f in _os.listdir(d) if not f.startswith(".")
            )

        total_bytes = sum(
            _dir_bytes(_os.path.join(shard_dir, d))
            for d in _os.listdir(shard_dir) if d.startswith("__shard=")
        )
        sdel = ids_only.where(F.col("doc_id") % 10_000 == 7).select(
            "doc_id"
        )
        n_del_ids = sdel.count()
        t0 = time.perf_counter()
        rep = shards_delete(spark, shard_dir, sdel, "takedown")
        t_del = round(time.perf_counter() - t0, 1)
        assert rep["planned_via"] == "key_spec"
        assert rep["deleted_rows"] > 0
        # plan bound: ≤ one candidate shard per (id, source)
        assert len(rep["affected_shards"]) <= 2 * n_del_ids, rep
        rewritten_bytes = sum(
            _dir_bytes(_os.path.join(shard_dir, f"__shard={s}"))
            for s in rep["affected_shards"]
        )
        frac = len(rep["affected_shards"]) / n_shards
        assert rewritten_bytes <= 1.5 * frac * total_bytes + 65536, (
            rewritten_bytes, total_bytes, rep,
        )
        print(
            f"shards takedown: {n_shards}-shard table written in "
            f"{t_write}s ({total_bytes} bytes); {n_del_ids} ids "
            f"({rep['deleted_rows']} rows) deleted in {t_del}s touching "
            f"{len(rep['affected_shards'])}/{n_shards} shards "
            f"({rewritten_bytes} bytes rewritten) — plan computed from "
            "the key spec, zero corpus bytes read"
        )
    finally:
        shutil.rmtree(shard_root, ignore_errors=True)

    # ---- paragraph-index membership economics (round-16) -------------
    # the split layout's whole point: on a K×-duplicated corpus the
    # hottest paragraphs have K contributors, so the ATTRIBUTION table
    # (read only by deletes/compaction) carries instance-fanout rows
    # while the MEMBERSHIP table every increment probes stays
    # |distinct hashes|-sized — membership bytes must NOT scale with K
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_increment,
        paragraph_index_build,
        paragraph_index_delete,
        probe_economics,
    )

    para_root = tempfile.mkdtemp(prefix="smoke_paraidx_")
    pidx = f"{para_root}/idx"
    try:
        chunked = _chunked(docs)
        t0 = time.perf_counter()
        paragraph_index_build(chunked, pidx, index_buckets=64)
        t_build = round(time.perf_counter() - t0, 1)
        mem = probe_economics(spark, f"{pidx}/paras", "hp", list(range(64)))
        att = probe_economics(spark, f"{pidx}/attrib", "hp", list(range(64)))
        # fanout factor ~K on body paragraphs; demand at least K/3 so
        # the witness fails loudly if membership ever re-absorbs the
        # contributor pairs
        assert att["bytes_total"] >= max(2, k // 3) * mem["bytes_total"], (
            mem, att, k,
        )
        # the increment's probe path reads membership only, pruned to
        # the shard's own buckets
        pshard = _chunked(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(50)
            .select(
                (F.col("doc_id") + 77_000_000).alias("doc_id"), "text"
            )
        )
        n_inc = paragraph_increment(pshard, pidx).count()
        # deletion rewrites touched membership buckets only
        pdel = chunked.where(F.col("doc_id") % 100_000 == 3).select(
            "doc_id"
        )
        t0 = time.perf_counter()
        prep = paragraph_index_delete(spark, pidx, pdel, "takedown")
        t_pdel = round(time.perf_counter() - t0, 1)
        print(
            f"paragraph index @K={k}: build {t_build}s; membership "
            f"{mem['bytes_total']} bytes vs attribution "
            f"{att['bytes_total']} bytes ({att['bytes_total'] / max(1, mem['bytes_total']):.1f}x fanout "
            "kept OUT of the probe path); increment probed "
            f"{n_inc} docs against membership only; delete: "
            f"{prep['deleted_docs']} docs, {prep['dead_hashes']} dead "
            f"hashes, {len(prep['touched_buckets'])}/64 buckets "
            f"rewritten in {t_pdel}s"
        )
    finally:
        shutil.rmtree(para_root, ignore_errors=True)


if __name__ == "__main__":
    main()
