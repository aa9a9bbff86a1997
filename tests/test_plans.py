"""Physical-plan regression tests: the scale properties the engine
claims (pushdown, column pruning, map-side combine, broadcast
discipline, JVM-only hot paths, top-k instead of global sort) asserted
against the actual Catalyst output, so a refactor that silently turns a
pruned scan into a full scan or drops a partial aggregate fails CI —
the 100 TB behavior is encoded, not just hoped for.

These assert plan SHAPE, not sizes: properties that must hold at any
scale factor (AQE may re-choose join strategies per actual size — that
freedom is exactly what the no-forced-broadcast rule preserves)."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.plans.catalog import (
    ALL_QUERIES as QUERIES,
)

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str, mode: str = "simple") -> str:
    df = QUERIES[name](spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_q1_scan_pruned_and_pushed(spark):
    p = _plan(spark, "q1_pricing_summary", "formatted")
    # filter reaches the parquet reader
    assert "LessThanOrEqual(l_shipdate" in p
    # column pruning: 6 needed columns, not lineitem's full width
    # (formatted mode prints the untruncated ReadSchema)
    scan = next(l for l in p.splitlines() if l.startswith("ReadSchema"))
    read_schema = scan.split("ReadSchema:")[1]
    assert read_schema.count(":") == 6
    assert "l_comment" not in read_schema
    # map-side combine before the one exchange
    assert "partial_sum" in p
    import re

    shuffles = re.findall(r"^\(\d+\) Exchange$", p, flags=re.M)
    assert len(shuffles) == 1


def test_q3_q5_no_forced_broadcast_on_scaling_tables(spark):
    # analyzed plans keep hint nodes: q5 hints exactly its two
    # fixed-size dims (nation, region); q3 hints nothing — customer
    # scales with sf, AQE must stay free to choose
    def analyzed(name: str) -> str:
        p = _plan(spark, name, "extended")
        return p.split("== Analyzed Logical Plan ==")[1].split(
            "== Optimized Logical Plan =="
        )[0]

    assert analyzed("q5_region_revenue").count("ResolvedHint") == 2
    assert analyzed("q3_top_orders").count("ResolvedHint") == 0
    # physical: the big-table scan is pruned to the referenced columns
    q5p = _plan(spark, "q5_region_revenue", "formatted")
    chunks = [c for c in q5p.split("\n\n") if "lineitem.parquet" in c]
    assert chunks
    schema_line = next(
        l for l in chunks[0].splitlines() if l.startswith("ReadSchema")
    )
    assert schema_line.split("ReadSchema:")[1].count(":") == 3


def test_topk_queries_avoid_global_sort(spark):
    # order-by + limit must plan as TakeOrderedAndProject (per-partition
    # top-k + driver merge), never a full Sort of the input
    for name in ("supplier_topk", "q3_top_orders"):
        p = _plan(spark, name)
        assert "TakeOrderedAndProject" in p, name


def test_text_ops_are_shuffle_free(spark):
    # per-document column math: a scan and a project, nothing else
    for name in ("text_stats", "token_count", "language_id", "fingerprints"):
        p = _plan(spark, name)
        assert "Exchange" not in p, name
        assert "EvalPython" not in p, name  # pure JVM, no Python workers


def test_exact_dedup_partial_combines_before_shuffle(spark):
    p = _plan(spark, "content_dedup")
    # one data exchange; duplicates collapse map-side first
    assert p.count("Exchange") == 1
    assert "partial_min_by" in p
    # and no window/row_number formulation (that would sort every row)
    assert "Window" not in p


def test_etl_core_is_jvm_only(spark):
    # the parse pipeline's hot path must stay inside codegen: no
    # row-at-a-time Python UDFs anywhere, no Arrow UDFs either (the
    # sink-boundary float formatter is outside this query)
    p = _plan(spark, "prom_parse")
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
    # codegen mode reports the compiled subtrees even under AQE
    assert "WholeStageCodegen subtrees" in _plan(spark, "prom_parse", "codegen")


def test_tsv_lines_python_is_arrow_only(spark):
    # the reference-parity float formatter is the one sanctioned Python
    # site in the sink path — it must be Arrow-vectorized, never
    # row-at-a-time
    p = _plan(spark, "tsv_lines")
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" in p


def test_minhash_python_is_arrow_only(spark):
    p = _plan(spark, "minhash_lsh")
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" in p  # the vectorized signature kernel


def test_cosine_topk_broadcasts_queries_not_corpus(spark):
    p = _plan(spark, "cosine_topk")
    assert "BroadcastExchange" in p
    # corpus side streams straight from the scan into the join: the only
    # non-broadcast exchange is the per-query top-k window's
    assert p.count("Exchange") - p.count("BroadcastExchange") == 1


def test_range_join_is_equi_join_not_nested_loop(spark):
    # the whole point of the bucketed formulation: Catalyst must plan a
    # hash/sort-merge equi-join on (key, bucket), never the nested-loop
    # or cartesian fallback a raw inequality join degenerates to
    p = _plan(spark, "events_range_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p) or ("HashJoin" in p)


def test_asof_join_is_one_keyed_window(spark):
    # union + single window: exactly one sort over the unioned data,
    # no join operator at all in the matching stage
    p = _plan(spark, "events_asof")
    assert "Window" in p
    assert "NestedLoopJoin" not in p and "CartesianProduct" not in p


def test_near_dup_auto_routes_to_block_gemm_here(spark):
    # at this corpus size × threshold no banding is sub-quadratic, so
    # the self-sizing headline must plan the tiled block-GEMM: packed
    # per-block lists aggregated, scored in MapInPandas — and NO band
    # explode (a Generate over band structs would mean the LSH route)
    p = _plan(spark, "embedding_near_dup", "formatted")
    assert "MapInPandas" in p
    assert "Generate" not in p


@pytest.mark.parametrize("name", ["cosine_topk_lsh"])
def test_lsh_band_rows_not_vectors_in_candidate_join(spark, name):
    # the band explode and the candidate-dedup shuffle must carry only
    # (id, band/bits, bucket) — embedding arrays join back once AFTER
    # candidate dedup, so the ×bands fan-out never multiplies vector
    # payloads (at 100 TB that fan-out on vectors IS the bill)
    p = _plan(spark, name, "formatted")
    blocks = p.split("\n\n")
    generates = [b for b in blocks if b.startswith("(") and "Generate\n" in b]
    assert generates, "expected explode nodes in the LSH plan"
    for b in generates:
        input_line = next(l for l in b.splitlines() if l.startswith("Input"))
        assert "__v" not in input_line, f"vector rides the explode: {input_line}"
    # the candidate-dedup exchange carries ids only, never vectors
    for b in blocks:
        if b.startswith("(") and "\nExchange\n" not in b and not b.split("\n")[0].endswith("Exchange"):
            continue
        if b.startswith("(") and b.split("\n")[0].endswith("Exchange"):
            input_line = next(
                (l for l in b.splitlines() if l.startswith("Input")), ""
            )
            for veccol in ("__v", "va#", "vb#", "cvec", "qvec"):
                if "Broadcast" in b.split("\n")[0]:
                    continue  # vector joins are broadcast by design here
                assert veccol not in input_line, (veccol, input_line)


def test_ivf_corpus_streams_once_queries_broadcast(spark):
    # the IVF scale contract: the corpus is scanned once, cell-assigned
    # by a single Arrow UDF pass, and joined via a BROADCAST of the
    # (small) probed-query side — the corpus never shuffles before the
    # candidate join, and the top-k is rank-limited (WindowGroupLimit),
    # never a global sort
    p = _plan(spark, "cosine_topk_ivf")
    assert "BroadcastHashJoin" in p
    assert "WindowGroupLimit" in p
    # exactly one Exchange: the per-query rank shuffle of candidates;
    # a corpus-side exchange before the join would mean the broadcast
    # discipline broke
    import re

    exchanges = [
        l for l in p.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(exchanges) == 1, exchanges


def test_pq_adc_scan_once_candidates_broadcast(spark):
    # the PQ scale contract: one Arrow scan computes codes + ADC scores
    # with a per-partition candidate cut (output bounded at partitions
    # × queries × C), the rescore join BROADCASTS the (bounded)
    # candidate set so the corpus never shuffles, and both rank cuts
    # are group-limited — no global sort anywhere
    p = _plan(spark, "cosine_topk_pq")
    assert "MapInPandas" in p
    assert "BroadcastHashJoin" in p
    assert "WindowGroupLimit" in p
    assert "BatchEvalPython" not in p


def test_decode_jpeg_is_shuffle_free_arrow(spark):
    # synth + decode are two Arrow mapInPandas stages over the part
    # scan — embarrassingly parallel, no row-at-a-time Python, and the
    # ONLY exchange is the r16 single-split input spread (round-robin
    # repartition straight off the one-row-group scan, guide §2.5);
    # no key shuffle anywhere
    p = _plan(spark, "decode_jpeg")
    assert p.count("MapInPandas") == 2
    assert "BatchEvalPython" not in p
    assert p.count("Exchange") <= 1
    assert "hashpartitioning" not in p
    if "Exchange" in p:
        assert "RoundRobinPartitioning" in p


def test_decode_jpeg_ac_is_shuffle_free_arrow(spark):
    # the AC face keeps the same two-Arrow-stage shape (plus the same
    # r16 input-spread round-robin, never a key shuffle)
    p = _plan(spark, "decode_jpeg_ac")
    assert p.count("MapInPandas") == 2
    assert "BatchEvalPython" not in p
    assert p.count("Exchange") <= 1
    assert "hashpartitioning" not in p
    if "Exchange" in p:
        assert "RoundRobinPartitioning" in p


def test_pii_scrub_is_shuffle_free_jvm(spark):
    # regex counting + redaction is per-row column math: scan + project
    p = _plan(spark, "pii_scrub")
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_repetition_stats_partial_aggregates(spark):
    # the word-count half must partially aggregate map-side (keyed on
    # (doc, word) — no hot key) and never drop to Python
    p = _plan(spark, "repetition_stats")
    assert "partial_count" in p or "partial_" in p
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_decontaminate_is_hash_equi_join(spark):
    # shingle collision must plan as an equi-join on the shingle key
    # (shuffle hash / sort-merge / broadcast), never a nested loop, and
    # the benchmark side must be deduplicated (an aggregate) pre-join
    p = _plan(spark, "decontaminate")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_kmv_bottom_k_is_group_limited(spark):
    # the per-group k-limit must sit below the shuffle (WindowGroupLimit)
    # so map tasks emit <= k rows/group, and the hash must stay JVM-side
    p = _plan(spark, "events_distinct_kmv")
    assert "WindowGroupLimit" in p
    assert "EvalPython" not in p


def test_top_words_group_limited(spark):
    # heavy hitters: vocabulary count must partially aggregate map-side
    # and the per-stratum k-limit must push below the shuffle
    p = _plan(spark, "top_words")
    assert "WindowGroupLimit" in p
    assert "partial_count" in p or "partial_" in p
    assert "EvalPython" not in p


def test_exact_substring_is_jvm_only_equi_join(spark):
    # rolling-hash windows, dup-set join, island windows, span cut:
    # all JVM (no Python workers anywhere), the dup-hash candidate
    # join an equi-join (never a nested loop), and the dup set built
    # by an aggregate with map-side partial combine on the hash key
    for name in ("exact_substring_spans", "exact_substring_dedup"):
        p = _plan(spark, name)
        assert "EvalPython" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name
        assert "partial_count" in p, name


def test_exact_substring_island_windows_share_one_sort(spark):
    # the two window functions (running max(pos+L), island cumsum) are
    # both partitioned by doc and ordered by pos — they must share ONE
    # exchange+sort, not re-shuffle between
    p = _plan(spark, "exact_substring_spans", "formatted")
    import re

    win_sorts = re.findall(r"^\(\d+\) Sort", p, flags=re.M)
    assert len(win_sorts) <= 1, p


def test_lm_perplexity_broadcasts_lm_never_corpus(spark):
    # the LM tables (bigram counts, context counts, the 1-row vocab)
    # are reference-sized → every join to the corpus bigram stream is
    # a broadcast; the only non-broadcast exchanges are the LM-count
    # aggregates' own and the final slim per-doc aggregate — the
    # corpus token stream itself never shuffles on a word key
    p = _plan(spark, "lm_perplexity")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "EvalPython" not in p
    # per-doc aggregate partially combines map-side
    assert "partial_count" in p and "partial_avg" in p


def test_semantic_dedup_assignment_udf_runs_once(spark):
    # the (id, vec, cell) frame feeds both pair-join sides and the
    # final annotate: persisted, the assignment GEMM appears as ONE
    # ArrowEvalPython over InMemoryTableScans — unpersisted it planned
    # five (double-planned under each join side's not-null filter)
    df = QUERIES["semantic_dedup"](spark, SF)
    p = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    try:
        assert "BatchEvalPython" not in p
        # every ArrowEvalPython mention is the cached frame's BUILD
        # plan reprinted inside an InMemoryTableScan (one per
        # consumer) — none in the live path, so the GEMM executes
        # exactly once to populate the cache
        assert p.count("InMemoryTableScan") == 3
        assert p.count("ArrowEvalPython") == p.count("InMemoryTableScan")
    finally:
        from etl_prometheus2clickhouse_spark.operators.dedup import (
            release_cached,
        )

        release_cached(df)


# ---------------------------------------------------------------------------
# round-10 late operators
# ---------------------------------------------------------------------------

def test_paragraph_dedup_is_jvm_only(spark):
    """The CCNet paragraph election must never leave the JVM: winner
    election, keep-position rollup, and filter-with-index reassembly
    are all expressions and hash aggregates."""
    p = _plan(spark, "paragraph_dedup", "formatted")
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the winner election partial-aggregates before its exchange
    assert "partial_min" in p or "partial_merge" in p or "min(" in p


def test_zorder_key_with_bounds_is_narrow(spark):
    """Caller-supplied bounds make the Morton key a pure expression:
    zero exchanges, zero Python, zero actions."""
    from etl_prometheus2clickhouse_spark.operators.layout import zorder_key

    df = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    )
    keyed = zorder_key(
        df, ["event_id", "user_id"],
        bits=8,
        bounds={"event_id": (0, 100000), "user_id": (0, 4096)},
    )
    p = spark._jvm.PythonSQLUtils.explainString(
        keyed._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p
    assert "Python" not in p
    assert "codegen id" in p  # whole-stage codegen covers the project


def test_hll_distinct_partial_aggregates(spark):
    """HLL's whole point: register maxima partial-combine map-side —
    no distinct pre-pass, no sort, no window anywhere in the plan."""
    p = _plan(spark, "events_distinct_hll", "formatted")
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "partial_max" in p
    assert "Window" not in p
    assert "Sort" not in p.replace("SortAggregate", "")


def test_bloom_join_probes_without_shuffling_left(spark):
    """The Bloom pre-filter must reach the orders scan as a broadcast
    single-row probe: the only exchanges in the plan belong to the
    sketch build and the final join, never to a pre-join shuffle of
    the unfiltered big side."""
    p = _plan(spark, "bloom_join", "formatted")
    assert "BroadcastNestedLoopJoin" in p  # the single-row probe
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_salted_join_shuffles_on_salted_key(spark):
    """The salting rewrite must actually change the partitioning key:
    the join exchange hashes (event_type, __salt), not event_type
    alone."""
    p = _plan(spark, "salted_join", "formatted")
    assert "__salt" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_kmv_jaccard_pair_stage_is_array_arithmetic(spark):
    """The corpus-sized work is the bottom-k pass; the pairwise stage
    must be array expressions over sketch rows (no explode of the
    sketches back into row space)."""
    p = _plan(spark, "kmv_jaccard", "formatted")
    assert "Generate" not in p  # no explode anywhere
    assert "array_intersect" in p and "array_union" in p


def test_window_funnel_filters_pushed_and_no_full_window(spark):
    # each stage's step condition must reach the parquet scan as a
    # pushed filter, and the operator must never plan a full-table
    # window (its whole point: staged slim aggregates, not per-event
    # state) or fall into a nested loop
    p = _plan(spark, "window_funnel", "formatted")
    assert "EqualTo(event_type,signup)" in p
    assert "EqualTo(event_type,purchase)" in p
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    # every stage aggregate combines map-side
    assert "partial_min" in p


def test_retention_is_one_partial_aggregate_pass(spark):
    import re

    p = _plan(spark, "retention_flags")
    assert "partial_max" in p
    assert "EvalPython" not in p
    shuffles = re.findall(r"^\s*\+?-?\s*Exchange", p, flags=re.M)
    assert len(shuffles) == 1


def test_ewma_single_shuffle_jvm_fold(spark):
    import re

    # collect_list partials combine map-side; the fold runs as an
    # expression (no Python, no second exchange)
    p = _plan(spark, "events_ewma")
    assert "EvalPython" not in p
    assert "aggregate(" in p or "partial_collect_list" in p
    shuffles = re.findall(r"^\s*\+?-?\s*Exchange", p, flags=re.M)
    assert len(shuffles) == 1


def test_linear_trend_decimal_sums_jvm(spark):
    p = _plan(spark, "events_trend")
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    # the sufficient statistics must aggregate map-side
    assert "partial_sum" in p


def test_fuzzy_join_is_equi_join_not_cross(spark):
    # the whole point of deletion-neighborhood blocking: candidates
    # meet on an equi-join over the variant key — never a cartesian /
    # nested-loop over token pairs
    p = _plan(spark, "fuzzy_token_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_rrf_fusion_stays_result_sized(spark):
    # hybrid fusion: the rank lists entering rrf_fuse are top-k
    # bounded (WindowGroupLimit on both retrieval paths), so the
    # fusion joins move result-sized frames only
    p = _plan(spark, "hybrid_search")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_pagerank_rounds_are_joins_plus_partial_aggs(spark):
    # the Pregel shape: equi-joins + map-side-combining message sums;
    # never a nested loop over node pairs, never Python. The catalog
    # entry localCheckpoints each round (so its final plan is just a
    # scan); materialize=False exposes the composed round plans.
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.graph import pagerank

    li = QUERIES["q1_pricing_summary"].__globals__["_t"](
        spark, SF, "lineitem"
    )
    edges = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    df = pagerank(edges, n_iter=2, materialize=False)
    p = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "partial_sum" in p
