#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is forced end-to-end with a noop write (computes every output
column, unlike count(), which lets Catalyst prune the projections).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope  # noqa: E402
from etl_prometheus2clickhouse_spark.plans.catalog import (  # noqa: E402
    ALL_QUERIES as QUERIES,
)
from etl_prometheus2clickhouse_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    # ETL core: synthesized query_range docs → full parse pipeline → counters
    "prom_parse",
    "prom_counts",
    "tsv_lines",
    # relational analytics
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "events_hourly",
    "events_rate",
    "events_rate_bucketed",
    "events_gaps",
    "user_sessions",
    "user_sessions_bucketed",
    "events_session_window",
    # temporal joins + multi-resolution rollups
    "events_asof",
    "events_asof_forward",
    "events_range_join",
    "events_multires",
    "events_rollup",
    "events_quantiles",
    # round-10 behavior-analytics tier (ClickHouse windowFunnel /
    # retention / cohort semantics, staged slim aggregates)
    "window_funnel",
    "retention_flags",
    "cohort_retention",
    # round-10: recursive EWMA fold + decimal-exact OLS drift
    "events_ewma",
    # round-11: segment-stitch face (skew-proof recursive fold) and
    # the three-scalar stateful streaming face
    "events_ewma_bucketed",
    "stream_ewma",
    "events_trend",
    # LLM layer
    "html_extract",
    "gopher_filter",
    "url_caps",
    "text_stats",
    # round-10 late: Cavnar-Trenkle rank-profile language ID
    "ngram_lang_id",
    "quality_score",
    "repetition_stats",
    "pii_scrub",
    "top_words",
    "doc_keywords",
    # round-10 late: feature-hashed document vectors + retrieval over them
    "doc_vectors",
    "doc_vectors_topk",
    "doc_chunks",
    "seq_packing",
    "seq_packing_bucketed",
    "decontaminate",
    # round-11: the persisted-benchmark-index face
    "decontaminate_increment",
    "bloom_decontaminate",
    # round-9 late: exact substring dedup (Lee et al. ACL'22) and
    # bigram-LM perplexity scoring (CCNet)
    "exact_substring_spans",
    # round-11: persisted window-index build + shard span probe
    "substring_increment",
    "exact_substring_dedup",
    "lm_perplexity",
    "lm_perplexity3",
    # round-10 late: CCNet tercile split over the LM scores + the
    # four-stage curation funnel composition
    "perplexity_buckets",
    "curation_funnel",
    "bpe_tokenize",
    # round-11: Arrow encoder twin (vocab-scale path; crossover vs the
    # chain recorded in BENCH_NOTES.md), token-ID encoding, and the
    # materialized tokenize → pack composition
    "bpe_tokenize_arrow",
    "bpe_encode_ids",
    "bpe_pack_ids",
    # round-15: unigram-LM (SentencePiece-style) tokenizer + the
    # one-call takedown compliance path over both retrieval indexes
    "unigram_tokenize",
    "unigram_encode_ids",
    "takedown_lifecycle",
    "substring_delete",
    # round-16: takedown extended to the published training shards;
    # the n-best half of subword regularization; snapshot reads of
    # the persisted index layer
    "shards_takedown",
    "unigram_nbest",
    "bm25_time_travel",
    "shards_append",
    "nb_classify",
    "bm25_search",
    # round-13: graded ranking evaluation over the BM25 lists
    "bm25_ndcg",
    # round-10: BM25 + dense cosine fused by reciprocal rank, and MMR
    # diversity re-ranking over the embedding-free retrieval stack
    "hybrid_search",
    "mmr_rerank",
    "events_distinct_kmv",
    # round-10 late: HyperLogLog one-shot + partial/merge lifecycle
    "events_distinct_hll",
    "hll_merge",
    "kmv_merge",
    # round-10 late: pairwise overlap estimation from KMV sketches
    "kmv_jaccard",
    # round-10 late: skew diagnostic + salting rewrite + bloom join cut
    "key_skew_stats",
    "salted_join",
    "bloom_join",
    # round-10: deletion-neighborhood fuzzy join (scan scales with SF)
    "fuzzy_token_join",
    # round-10: power iteration over the part->supplier graph
    "pagerank",
    # round-10: seasonal z-score anomaly flags
    "events_anomalies",
    "heavy_hitters_cms",
    "cms_merge_hh",
    "quantile_merge",
    "length_quantile_filter",
    "content_dedup",
    "fingerprint_dedup",
    # round-10 late: CCNet corpus-level paragraph election; round-11:
    # its incremental face over the persisted hash index
    "paragraph_dedup",
    "paragraph_increment",
    "stratified_sample",
    "weighted_sample",
    "corpus_mix",
    # round-13: temperature-allocated mixture with epoch replication,
    # and the row-level data-quality gate
    "mix_temperature",
    "validate_quarantine",
    # round-10 late: Z-order layout pruning witness; round-11: the
    # Hilbert-curve sibling
    "zorder_stats",
    "hilbert_stats",
    # round-10 late: composed paragraph-dedup → Gopher-filter pipeline
    "crawl_pipeline",
    "ngram_jaccard",
    "minhash_lsh",
    # round-11: persisted-band-index build + partition-filtered shard
    # probe (build dominates at bench SF; the probe-side economics are
    # recorded in scripts/scale_smoke.py)
    "dedup_increment",
    "dup_clusters",
    "corpus_dedup",
    "simhash_pairs",
    "cosine_topk",
    # the 100 TB scale paths: Arrow GEMM scorer, banded-LSH ANN +
    # near-dup, multimodal decode plumbing
    "cosine_topk_arrow",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "cosine_topk_pq",
    # round-9: persisted-code-table PQ (build+scan each run — the
    # repeated-query economics are recorded in scripts/scale_smoke.py)
    # and the IVFADC composition
    "cosine_topk_pq_codes",
    "cosine_topk_ivfpq",
    "cosine_topk_ivfpq_residual",
    "cosine_topk_ivfpq_codes",
    # round-11: persisted-model build + shard append + probed search,
    # and the same lifecycle through checkpointed micro-batches
    "ann_increment",
    "stream_ann",
    "embedding_near_dup",
    "embedding_near_dup_exact_baseline",
    # round-10 late: composed recall@k evaluation (exact + IVFADC)
    # and PQ reconstruction-distortion evaluation
    "ann_recall",
    "pq_distortion",
    # round-9 late: SemDeDup cluster-then-prune
    "semantic_dedup",
    # round-12: persisted-vector-index build + two sequential
    # partition-pruned shard increments (the incremental SemDeDup
    # lifecycle; build dominates at bench SF)
    "semantic_increment",
    "decode_pixels",
    "decode_audio_wav",
    "decode_jpeg",
    "decode_jpeg_ac",
    "resize_nn",
    "image_features",
    # round-13: perceptual dedup over real decoded pixels (dHash)
    "image_dhash_dedup",
    "audio_features",
    # round-10 late: codec-free per-video features (demux + rollup)
    "video_features",
    # round-6 faces: consolidated multimodal sniff, GK rank-guarantee
    "multimodal_meta",
    "demux_mp4",
    "events_quantiles_sketch",
    # streaming faces (real AvailableNow runs, memory sink)
    "stream_hourly",
    # round-10: native session_window (merging-window state machine)
    # and the stateful streaming funnel (three-scalar chain state)
    "stream_sessions",
    "stream_funnel",
    "stream_dedup_keys",
    "stream_rate",
    "stream_join",
    "stream_kmv",
    # round-10 late: HLL through real micro-batches
    "stream_hll",
    "stream_kmv_durable",
    "stream_cms_hh",
    # round-11: composed durable curation face (incremental dedup
    # against the persisted index + Gopher + LM through real
    # checkpointed micro-batches)
    "stream_curation",
    # round-12: SemDeDup through checkpointed micro-batches
    "stream_semantic",
    # round-13: persisted BM25 inverted index — build + append +
    # term-prefix-pruned search, and the same lifecycle through
    # checkpointed micro-batches
    "bm25_increment",
    "stream_bm25",
    # round-14: deletion/tombstone lifecycle on all four persisted
    # indexes (each faces the reduced-corpus one-shot), BM25 geometry
    # migration from stored postings, and hybrid retrieval served from
    # the persisted BM25 + IVFADC indexes through RRF
    "bm25_delete",
    "bm25_rebucket",
    "ann_delete",
    "semantic_delete",
    "dedup_delete",
    "hybrid_increment",
]

# Registry entries deliberately NOT benched, each with why. "No silent
# caps": this list is exhaustive — _check_bench_coverage() below fails
# the bench if a registry entry is in neither BENCH_QUERIES nor here,
# so a future catalog addition can't be silently unbenched.
BENCH_EXCLUDED: dict[str, str] = {
    # dominated twins: same physical plan as a benched sibling with a
    # strictly smaller or equal work profile, so their time is already
    # measured under the sibling's entry
    "dup_clusters_twostar": "same contraction kernel as dup_clusters; "
    "only the round-count differs (crossover measured in BENCH_NOTES.md)",
    "events_moving_avg": "single window-frame pass dominated by "
    "events_rate (same scan, same shuffle, cheaper frame)",
    "events_props": "per-key first/last window pass dominated by "
    "user_sessions (same shuffle key, fewer columns)",
    "multimodal_jpeg_meta": "per-kind filter face of multimodal_meta "
    "(benched); same scan + sniff expressions on a subset",
    "multimodal_mp4_meta": "per-kind filter face of multimodal_meta",
    "multimodal_png_meta": "per-kind filter face of multimodal_meta",
    "multimodal_text_meta": "per-kind filter face of multimodal_meta",
    "fingerprints": "projection stage of fingerprint_dedup (benched); "
    "the dedup entry runs this exact plan plus the groupBy",
    "language_id": "expression subset of quality_score (benched): same "
    "scan, same stopword-ratio expressions, no extra shuffle",
    "token_count": "expression subset of text_stats (benched)",
    "sample_frames": "2-sample subset of demux_mp4 (benched): same "
    "per-row stbl walk, strictly less output",
    # sub-second state/metadata scans: measured wall time is dominated
    # by fixed per-query driver overhead (~0.1 s), not by any plan —
    # benching them adds noise rows, not information
    "lease_scan": "state-log scan over O(runs) rows, sub-second at "
    "every SF; no data-dependent plan to regress",
    "state_top1": "same state-log scan, top-1 variant",
    "window_rules": "pure driver arithmetic on one state row",
    "lenient_cast": "37-row golden-corpus cast matrix; input size is "
    "fixed by the corpus, not the SF",
    "prom_labels": "label restructure face of prom_parse (benched): "
    "same parse pipeline, one fewer stage",
    # small-dimension relational drills: scan+join shapes fully covered
    # by the benched TPC-H-style trio (q1/q3/q5) on the same tables
    "events_cube": "grouping-sets pass over events; scan+agg shape "
    "covered by events_hourly, CUBE adds only replicated group keys",
    "events_pivot": "pivot face of events_hourly (same agg, fixed "
    "column fanout)",
    "events_unpivot": "stack() inverse of events_pivot, no shuffle",
    "orders_anti_join": "broadcast anti-join on orders; join shape "
    "covered by q3_top_orders (same tables, same broadcast side)",
    "parts_rank": "WindowGroupLimit top-k over part, covered by "
    "supplier_topk's twin plan at smaller cardinality",
    "supplier_topk": "WindowGroupLimit top-k over the 2nd-smallest "
    "table; sub-second, shape covered by events_quantiles ranks",
    "sequence_match": "window_funnel (benched) with the time-window "
    "predicate dropped and one fewer stage — strictly less work on "
    "the same staged-min-join plan",
}


def _check_bench_coverage() -> None:
    """Every registry entry must be benched or named in BENCH_EXCLUDED."""
    from etl_prometheus2clickhouse_spark.plans.catalog import ALL_QUERIES

    unbenched = set(ALL_QUERIES) - set(BENCH_QUERIES) - set(BENCH_EXCLUDED)
    stale = (set(BENCH_QUERIES) | set(BENCH_EXCLUDED)) - set(ALL_QUERIES)
    overlap = set(BENCH_QUERIES) & set(BENCH_EXCLUDED)
    if unbenched or stale or overlap:
        raise SystemExit(
            f"bench coverage drift: unbenched={sorted(unbenched)} "
            f"stale={sorted(stale)} overlap={sorted(overlap)}"
        )


# --- self-adjudicating swing probes ---------------------------------------
# Rounds 8-10 produced 8 false ≥1.5× in-suite alarms (every one probe-
# cleared as suite contention by hand). The instrument now adjudicates
# itself: after the two passes, any entry ≥ PROBE_RATIO× its previous
# committed recording is re-run in a FRESH PROCESS (its own JVM — the
# exact discipline of the manual probes), and the full two-pass table +
# probe columns are written to BENCH_LOCAL_r{N}.json (committed), so the
# per-query record survives the driver's 2 KB tail truncation
# (BENCH_r07-r10 upstream are all "parsed": null).

PROBE_RATIO = 1.5
PROBE_RUNS = 3
PROBE_MAX = 8  # bound the worst-case suite extension (~45 s/probe)
PROBE_FLOOR_SEC = 0.2  # sub-200ms entries are driver-overhead noise

# Entries probe-cleared as SUITE CONTENTION in two consecutive
# recordings (probe_steady ≈ its reference both times) stop consuming
# probe slots: their flag is recorded with a pin note instead of a
# fresh-JVM re-run. Remove a pin if the entry's plan changes.
# Entries whose PLAN was touched in the current round (maintained per
# round from the git diff): they take probe slots before the
# swing-ranked rest — the round-14 lesson, where all 8 slots went to
# untouched host-variance entries while the four touched appends went
# unadjudicated.
TOUCHED_THIS_ROUND = {
    # round-17: foreachBatch bodies now plan at micro-batch size
    # (streaming/batchconf.py) — every foreachBatch-driven face
    "stream_curation", "stream_semantic", "stream_ann", "stream_bm25",
    "stream_kmv", "stream_hll", "stream_cms_hh", "stream_kmv_durable",
    # round-17: the cached_scope persistent-RDD sweep + hardlinked
    # seed copies ride through every lifecycle face (the sweep is
    # suite-wide, but these are where the effect concentrates)
    "dedup_increment", "dedup_delete", "substring_increment",
    "substring_delete", "paragraph_increment", "bm25_increment",
    "bm25_delete", "bm25_rebucket", "bm25_time_travel",
    "ann_increment", "ann_delete", "semantic_increment",
    "semantic_delete", "hybrid_increment", "takedown_lifecycle",
    "decontaminate_increment", "shards_takedown", "shards_append",
    # round-17: sketch pin now a reordered projection (ADVICE fixes)
    "cms_merge_hh",
}

PROBE_PINNED = {
    # r11: 1.48→probe 1.25s ≈ ref; r12: 2.56→probe 1.32s ≈ ref 1.25s —
    # the postings-build shuffle is cache/GC-sensitive in-suite only
    "bm25_search": "probe-cleared as contention in r11 and r12",
    # r16 adjudication of the r15 flagged-not-cleared residual: fresh-
    # JVM steady 0.52s ≈ in-suite 0.51s ≈ the entry's ~0.5s recording
    # since r9 — the 0.311s reference was a fast-host artifact, not a
    # plan change (plan untouched since r10); re-baselined at the r16
    # recording
    "url_caps": "fresh-JVM steady 0.52s == in-suite; 0.311s reference "
                "was the documented host signature (re-baselined r16)",
}


def _repo_root() -> Path:
    return Path(__file__).resolve().parent


def _current_round() -> int:
    """Next round number = 1 + the newest recorded round artifact."""
    rounds = [0]
    for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json"):
        for f in _repo_root().glob(pat):
            m = re.search(r"_r(\d+)\.json$", f.name)
            if m:
                rounds.append(int(m.group(1)))
    return max(rounds) + 1


def _load_reference() -> tuple[str, dict[str, float]]:
    """Newest committed per-query warm recording, best source first:
    a BENCH_LOCAL_r{N}.json written by this instrument (full table),
    else a driver BENCH_r{N}.json whose JSON line fit (parsed payload),
    else the warm pairs recoverable from the newest driver tail (the
    2 KB truncation keeps the END of the line — mostly queries_warm)."""
    root = _repo_root()
    local = sorted(
        root.glob("BENCH_LOCAL_r*.json"),
        key=lambda f: int(re.search(r"_r(\d+)", f.name).group(1)),
    )
    for f in reversed(local):
        try:
            d = json.loads(f.read_text())
            q = d.get("queries_warm") or d.get("queries") or {}
            if q:
                return f.name, {k: float(v) for k, v in q.items()}
        except (json.JSONDecodeError, ValueError, TypeError):
            continue
    driver = sorted(
        root.glob("BENCH_r*.json"),
        key=lambda f: int(re.search(r"_r(\d+)", f.name).group(1)),
    )
    for f in reversed(driver):
        try:
            d = json.loads(f.read_text())
        except json.JSONDecodeError:
            continue
        p = d.get("parsed")
        if p and (p.get("queries_warm") or p.get("queries")):
            q = p.get("queries_warm") or p["queries"]
            return f.name, {k: float(v) for k, v in q.items()}
        tail = d.get("tail") or ""
        pairs = re.findall(r'"([a-z0-9_]+)": ([0-9]+\.[0-9]+)', tail)
        q = {}
        for k, v in pairs:  # later occurrence wins → the warm section
            if k not in ("value", "value_warm", "sf"):
                q[k] = float(v)
        if q:
            return f"{f.name} (tail)", q
    return "none", {}


def _probe_once(name: str, sf_dir: str, cpus: str) -> list[float] | None:
    """Run one entry PROBE_RUNS times in a fresh subprocess JVM."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, str(Path(__file__).resolve()), "--probe", name],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
             "SPARK_GRAFT_CPUS": cpus},
    )
    for line in reversed(r.stdout.splitlines()):
        if line.startswith('{"probe"'):
            return json.loads(line)["runs"]
    return None


def _probe_main(name: str) -> None:
    """--probe mode: fresh-session timing of ONE entry — warm exactly
    as the suite does, then PROBE_RUNS scoped runs."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"bench-probe-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    QUERIES["prom_parse"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    if name.startswith("stream"):
        warm_dir = os.path.join(
            os.path.dirname(sf_dir.rstrip("/")), "sf0.001"
        )
        if not os.path.isdir(warm_dir):
            warm_dir = sf_dir
        QUERIES["stream_rate"](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    runs = []
    for _ in range(PROBE_RUNS):
        with cached_scope():
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"probe": name, "runs": runs}))


def main() -> None:
    _check_bench_coverage()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # warm the JVM + parquet footers + whole-stage-codegen JIT once so
    # per-query times measure the plans, not session startup or first
    # compilation of the big generated stages (first execution of the
    # parse pipeline pays ~4s of JIT that no steady-state run sees)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    QUERIES["prom_parse"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the Structured Streaming machinery the same way (state-store
    # providers, the Arrow-with-state Python runner, file-stream
    # source): the first stateful stream of a session pays ~5-8 s of
    # one-time init that a long-running streaming deployment never
    # sees per-batch; run the heaviest face once at the smallest
    # sibling SF of the configured data root (falling back to the
    # bench SF itself if no sf0.001 sibling exists)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    QUERIES["stream_rate"](spark, warm_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # pre-build the lifecycle faces' session-scoped seed indexes (r16
    # verdict item 7): the seeds are deterministic in sf_dir and built
    # once per process EITHER WAY — warming them here moves the
    # one-time construction out of the first timed run of each
    # lifecycle face, so the cold pass measures the lifecycle (append /
    # delete / stream / search), not seed construction. Disclosed
    # measurement-scope change; see BENCH_NOTES.md.
    from etl_prometheus2clickhouse_spark.plans.catalog import (
        warm_lifecycle_seeds,
    )

    warm_lifecycle_seeds(spark, sf_dir)

    def run_suite() -> dict[str, float]:
        times: dict[str, float] = {}
        for name in BENCH_QUERIES:
            # scope per query: each run leaves zero persisted
            # partitions behind, so a long suite can't accumulate
            # storage memory. t0 covers BUILD + write: plan building
            # is sub-ms for declarative queries, but driver-iterative
            # operators (dup_clusters' propagation rounds, streaming
            # runs) do their real work at build time and would
            # otherwise bench as ~0
            with cached_scope():
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        return times

    # cold pass first, then one warm re-run of each query: identical
    # code measured twice in one JVM showed ±20%–2.5× cold-in-suite
    # swings (BENCH_NOTES.md) from first-compilation of big codegen
    # stages landing on whichever query triggers them — the warm
    # column separates a real plan regression (slow in BOTH passes)
    # from compile/load noise (slow only cold) without manual probes
    times = run_suite()
    times_warm = run_suite()

    # adjudicate swings against the newest committed recording: an
    # entry slow in BOTH passes AND in its own fresh JVM is a real
    # regression; slow only in-suite is contention (the 8-for-8
    # outcome of rounds 8-10's manual probes)
    ref_label, ref = _load_reference()
    flagged = [
        n
        for n in BENCH_QUERIES
        if n in ref
        and ref[n] >= PROBE_FLOOR_SEC
        and times_warm.get(n, 0.0) >= PROBE_RATIO * ref[n]
    ]
    probes: dict[str, dict] = {}
    for n in [x for x in flagged if x in PROBE_PINNED]:
        probes[n] = {
            "in_suite": times_warm[n],
            "reference": ref[n],
            "pinned": PROBE_PINNED[n],
        }
    flagged = [x for x in flagged if x not in PROBE_PINNED]
    # touched-plan probe policy (round-15, VERDICT item 4): entries
    # whose plan changed in-round take probe slots BEFORE the
    # swing-size-ranked rest — new-guard/new-trim cost and host noise
    # must be separated on exactly the entries that moved, not on
    # whichever untouched entries swung hardest
    flagged.sort(
        key=lambda n: (
            n not in TOUCHED_THIS_ROUND,
            -(times_warm.get(n, 0.0) / ref[n]),
        )
    )
    dropped_probes = flagged[PROBE_MAX:]
    for n in flagged[:PROBE_MAX]:
        runs = _probe_once(n, sf_dir, cpus)
        probes[n] = {
            "in_suite": times_warm[n],
            "reference": ref[n],
            "probe_runs": runs,
            # steady state: best post-first-run time (the first probe
            # run still pays that JVM's first compilation of the
            # query's own stages)
            "probe_steady": (
                round(min(runs[1:] or runs), 3) if runs else None
            ),
        }
    if dropped_probes:
        probes["__unprobed__"] = {  # no silent caps
            "note": f"PROBE_MAX={PROBE_MAX} reached",
            "entries": dropped_probes,
        }

    payload = {
        "metric": f"headline-suite wall seconds ({len(BENCH_QUERIES)} queries, local)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_warm": times_warm,
        "value_warm": round(sum(times_warm.values()), 3),
        "sf": sf,
        "probe_reference": ref_label,
        "probes": probes,
    }
    # the committed full record (survives the driver's tail truncation
    # and becomes the next round's probe reference)
    local = _repo_root() / f"BENCH_LOCAL_r{_current_round()}.json"
    local.write_text(json.dumps(payload, indent=1) + "\n")

    print(json.dumps(payload))


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--probe":
        _probe_main(sys.argv[2])
    else:
        main()
