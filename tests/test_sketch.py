"""KMV distinct sketch (operators/sketch.py): exactness below k,
estimate accuracy above k, determinism under repartitioning, and the
WindowGroupLimit plan shape that makes the bottom-k scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.sketch import (
    kmv_distinct,
    uniform_hash32,
)


def test_hash_is_md5_prefix(spark):
    df = spark.range(1).select(uniform_hash32(F.lit(42)).alias("h"))
    # md5('42') = a1d0c6e8... → 0xa1d0c6e8 = 2714814184
    assert df.collect()[0].h == 2714814184


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(1000)], "g string, v int"
    )
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row.n_k == 10
    assert row.est_distinct == 10.0


def test_estimate_accuracy_above_k(spark):
    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    row = kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert row.n_k == 256
    # bottom-k relative error concentrates around 1/sqrt(k) ≈ 6%
    assert abs(row.est_distinct - n) / n < 0.25


def test_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i * 7919 % 500) for i in range(4000)],
        "g string, v int",
    )
    a = sorted(map(tuple, kmv_distinct(df, ["g"], "v", k=32).collect()))
    b = sorted(
        map(tuple, kmv_distinct(df.repartition(13, "v"), ["g"], "v", k=32).collect())
    )
    assert a == b


def test_k_must_be_at_least_two(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=1)


def test_bottom_k_uses_window_group_limit(spark):
    """The rank filter must push a per-group k-limit below the shuffle
    (WindowGroupLimit) so map tasks never emit a full distinct set."""
    df = spark.createDataFrame(
        [("a", i) for i in range(100)], "g string, v int"
    )
    plan = (
        kmv_distinct(df, ["g"], "v", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# quantile_threshold_filter
# ---------------------------------------------------------------------------


def test_quantile_filter_known_answer(spark):
    """100 rows valued 1..100, p90, bucket width 10: cumulative count
    reaches ceil(0.9*100)=90 in bucket 9 (values 90..99; buckets below
    hold 1..89 = 89 rows), so the kept set is value >= 90 — the true
    p90 value's own bucket edge."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        quantile_threshold_filter,
    )

    df = spark.range(1, 101).select(F.col("id").alias("v"))
    got = sorted(
        r.v for r in quantile_threshold_filter(df, "v", 0.9, 10).collect()
    )
    assert got == list(range(90, 101))


def test_quantile_filter_overincludes_at_most_one_bucket(spark):
    """The histogram bound must be over-inclusive (never drops a row
    above the true quantile) and off by at most bucket_width."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        quantile_threshold_filter,
    )

    import random

    rng = random.Random(3)
    vals = [rng.randrange(0, 5000) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    kept = {r.v for r in quantile_threshold_filter(df, "v", 0.75, 64).collect()}
    true_q = sorted(vals)[int(0.75 * len(vals)) - 1]
    assert all(v in kept for v in vals if v >= true_q)
    assert min(kept) >= true_q - 64


def test_quantile_filter_no_driver_scalar(spark):
    """The threshold must flow through a broadcast join, not a collect:
    the returned frame is one lazy plan containing the histogram."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        quantile_threshold_filter,
    )

    df = spark.range(100).select(F.col("id").alias("v"))
    out = quantile_threshold_filter(df, "v", 0.5, 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_quantile_filter_validates_args(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        quantile_threshold_filter,
    )

    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        quantile_threshold_filter(df, "v", 1.0, 8)
    with pytest.raises(ValueError):
        quantile_threshold_filter(df, "v", 0.5, 0)


def test_kmv_matches_pure_python_model(spark):
    """End-to-end hash-pipeline parity: the Spark plan (md5 → hex
    prefix → conv → bottom-k → estimate) must equal a pure-Python
    reimplementation on randomized inputs — any drift in the hash
    spelling (substr bounds, base, signedness) breaks equality."""
    import hashlib
    import random

    rng = random.Random(11)
    rows = [
        (f"g{i % 4}", rng.randrange(0, 3000)) for i in range(5000)
    ]
    k = 16
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n_k, r.kth_hash, r.est_distinct)
        for r in kmv_distinct(df, ["g"], "v", k=k).collect()
    }

    def h32(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    want = {}
    by_g: dict[str, set] = {}
    for g, v in rows:
        by_g.setdefault(g, set()).add(h32(v))
    for g, hs in by_g.items():
        bottom = sorted(hs)[:k]
        n_k, kth = len(bottom), bottom[-1]
        est = float(n_k) if n_k < k else (k - 1) * 2.0**32 / kth
        want[g] = (n_k, kth, est)
    assert got == want


def test_kmv_and_quantile_ignore_nulls(spark):
    """NULL values must be excluded (SQL COUNT(DISTINCT)/quantile
    semantics) — a NULL hash or NULL histogram bucket would also sort
    engine-dependently (Spark ASC nulls-first vs DuckDB nulls-last)."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        quantile_threshold_filter,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("a", None)],
        "g string, v int",
    )
    row = kmv_distinct(df, ["g"], "v", k=8).collect()[0]
    assert (row.n_k, row.est_distinct) == (2, 2.0)
    # p50 of {1,2}: cum reaches ceil(0.5*2)=1 in bucket 1 → keep v>=1;
    # the NULL rows are excluded from both the histogram and the output
    kept = quantile_threshold_filter(df, "v", 0.5, 1).collect()
    assert sorted(r.v for r in kept) == [1, 2]


def test_kmv_rejects_engine_unstable_value_types(spark):
    """Doubles/timestamps stringify differently across engines — the
    hash input would silently diverge, so the operator refuses them."""
    df = spark.createDataFrame([("a", 1.5)], "g string, v double")
    with pytest.raises(ValueError, match="engine-stable"):
        kmv_distinct(df, ["g"], "v", k=8)


def test_kmv_merge_equals_one_shot(spark):
    """Partial-sketch-then-merge must reproduce the one-shot estimate
    exactly (bottom-k of a union == bottom-k of the union of per-batch
    bottom-ks), for k both above and below the group cardinality."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_merge,
        kmv_partial_sketches,
    )

    rows = [("g1", i % 200, i % 5) for i in range(1000)]
    rows += [("g2", i % 7, i % 3) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v int, b int")
    for k in (8, 64, 500):
        one_shot = {
            r.g: (r.n_k, r.kth_hash, r.est_distinct)
            for r in kmv_distinct(df, ["g"], "v", k=k).collect()
        }
        partials = kmv_partial_sketches(df, ["g"], "v", "b", k=k)
        merged = {
            r.g: (r.n_k, r.kth_hash, r.est_distinct)
            for r in kmv_merge(partials, ["g"], k=k).collect()
        }
        assert merged == one_shot, f"k={k}"


def test_kmv_partials_are_sorted_bounded_arrays(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_partial_sketches,
    )

    df = spark.createDataFrame(
        [("g", i, i % 4) for i in range(100)], "g string, v int, b int"
    )
    rows = kmv_partial_sketches(df, ["g"], "v", "b", k=10).collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r.sketch) <= 10
        assert list(r.sketch) == sorted(r.sketch)


def test_kmv_merge_uses_window_group_limit(spark):
    """The merge's bottom-k must keep the WindowGroupLimit shape —
    partial sketches can number in the millions of batches at 100 TB."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_merge,
        kmv_partial_sketches,
    )

    df = spark.createDataFrame(
        [("g", i, i % 4) for i in range(100)], "g string, v int, b int"
    )
    partials = kmv_partial_sketches(df, ["g"], "v", "b", k=10)
    plan = (
        kmv_merge(partials, ["g"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def _word_occurrences(spark, counts: dict[str, int]):
    rows = [("g", w) for w, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "g string, w string")


def test_cms_no_false_negatives_and_one_sided_error(spark):
    """Every true phi-heavy item must appear (CMS only over-counts),
    with est_count >= n_occurrences on every row — even at a tiny
    width that forces collisions."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters,
    )

    counts = {"a": 50, "b": 30, "c": 15, **{f"r{i}": 1 for i in range(25)}}
    total = sum(counts.values())  # 120
    occ = _word_occurrences(spark, counts)
    for width in (4, 1024):
        rows = cms_heavy_hitters(
            occ, ["g"], "w", phi=0.1, depth=3, width=width
        ).collect()
        got = {r.w: (r.n_occurrences, r.est_count) for r in rows}
        # true heavies: count >= ceil(0.1 * 120) = 12 -> a, b, c
        assert {"a", "b", "c"} <= set(got), f"width={width}"
        for w, (n, est) in got.items():
            assert n == counts[w]
            assert est >= n, f"CMS under-counted {w} at width={width}"


def test_cms_exact_when_collision_free(spark):
    """With a wide sketch and tiny vocabulary, estimates are exact and
    the output is exactly the true heavy-hitter set."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters,
    )

    counts = {"a": 6, "b": 3, "c": 1}
    rows = cms_heavy_hitters(
        _word_occurrences(spark, counts), ["g"], "w", phi=0.3,
        depth=3, width=4096,
    ).collect()
    # threshold ceil(0.3 * 10) = 3 -> a and b
    assert {r.w: (r.n_occurrences, r.est_count) for r in rows} == {
        "a": (6, 6),
        "b": (3, 3),
    }


def test_cms_validates_args(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters,
    )

    occ = _word_occurrences(spark, {"a": 1})
    with pytest.raises(ValueError, match="phi"):
        cms_heavy_hitters(occ, ["g"], "w", phi=1.5)
    with pytest.raises(ValueError, match="depth"):
        cms_heavy_hitters(occ, ["g"], "w", phi=0.1, depth=0)
    bad = spark.createDataFrame([("g", 1.5)], "g string, v double")
    with pytest.raises(ValueError, match="engine-stable"):
        cms_heavy_hitters(bad, ["g"], "v", phi=0.1)


def test_cms_probe_is_broadcast_joins(spark):
    """The counter probes must be broadcast hash joins — the sketch is
    tiny by construction; a shuffle join over occurrences would defeat
    the vocabulary-independence argument."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters,
    )

    occ = _word_occurrences(spark, {"a": 5, "b": 2})
    plan = (
        cms_heavy_hitters(occ, ["g"], "w", phi=0.2, depth=3, width=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_histogram_merge_equals_one_shot_and_brackets_quantile(spark):
    """Merged per-batch histograms must equal the single-batch sketch,
    and the located bucket edge must sit at or below the true p90 by
    less than one bucket width."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        histogram_merge_quantile,
        histogram_partial_sketches,
    )

    vals = [(i % 100, i % 4) for i in range(1000)]
    df = spark.createDataFrame(
        [("g", v, b) for v, b in vals], "g string, v int, b int"
    )
    split = histogram_partial_sketches(df, ["g"], "v", 10, "b")
    one = histogram_partial_sketches(
        df.withColumn("b", F.lit(0)), ["g"], "v", 10, "b"
    )
    merged = histogram_merge_quantile(split, ["g"], 0.9, 10).collect()[0]
    single = histogram_merge_quantile(one, ["g"], 0.9, 10).collect()[0]
    assert (merged.n_total, merged.q_bucket, merged.q_lo) == (
        single.n_total,
        single.q_bucket,
        single.q_lo,
    )
    true_p90 = sorted(v for v, _ in vals)[int(0.9 * 1000) - 1]  # 89
    assert merged.q_lo <= true_p90 < merged.q_lo + 10


def test_histogram_sketch_validates_args(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        histogram_merge_quantile,
        histogram_partial_sketches,
    )

    df = spark.createDataFrame([("g", 1, 0)], "g string, v int, b int")
    with pytest.raises(ValueError, match="bucket_width"):
        histogram_partial_sketches(df, ["g"], "v", 0, "b")
    p = histogram_partial_sketches(df, ["g"], "v", 10, "b")
    with pytest.raises(ValueError, match="phi"):
        histogram_merge_quantile(p, ["g"], 1.2, 10)


def test_kmv_partials_accumulate_across_micro_batches(spark, tmp_path):
    """The incremental-sketch lifecycle end-to-end under Structured
    Streaming: each micro-batch (maxFilesPerTrigger=1 over a 3-file
    source) sketches its slice via foreachBatch into a partials store;
    merging the accumulated partials reproduces the one-shot estimate
    over the whole stream — the 100 TB pattern where corpus stats
    accumulate across ingestion windows without re-scans."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_merge,
        kmv_partial_sketches,
    )

    rows = [("g1", i % 97) for i in range(300)] + [
        ("g2", i % 11) for i in range(60)
    ]
    full = spark.createDataFrame(rows, "g string, v int")
    src_dir, store = str(tmp_path / "src"), str(tmp_path / "partials")
    for i in range(3):
        full.where(F.expr(f"pmod(hash(g, v), 3) = {i}")).coalesce(1).write.parquet(
            f"{src_dir}/f{i}"
        )
    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/f*")
    )

    def _sink(batch_df, batch_id):
        part = kmv_partial_sketches(
            batch_df.withColumn("b", F.lit(int(batch_id))),
            ["g"], "v", "b", k=16,
        )
        part.write.mode("append").parquet(store)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    partials = spark.read.parquet(store)
    assert partials.select("b").distinct().count() >= 2  # real multi-batch
    merged = {
        r.g: (r.n_k, r.kth_hash, r.est_distinct)
        for r in kmv_merge(partials, ["g"], k=16).collect()
    }
    one_shot = {
        r.g: (r.n_k, r.kth_hash, r.est_distinct)
        for r in kmv_distinct(full, ["g"], "v", k=16).collect()
    }
    assert merged == one_shot


def test_sketch_operators_reject_reserved_columns(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters,
        histogram_partial_sketches,
        kmv_merge,
        kmv_partial_sketches,
    )

    df = spark.createDataFrame([("x", 1, 0)], "h string, v int, b int")
    with pytest.raises(ValueError, match="reserves"):
        kmv_distinct(df, ["h"], "v", k=8)
    with pytest.raises(ValueError, match="reserves"):
        kmv_partial_sketches(df, ["h"], "v", "b", k=8)
    cms_df = spark.createDataFrame([("x", "w")], "bucket string, w string")
    with pytest.raises(ValueError, match="reserves"):
        cms_heavy_hitters(cms_df, ["bucket"], "w", phi=0.1)
    hist_df = spark.createDataFrame([("x", 1, 0)], "cnt string, v int, b int")
    with pytest.raises(ValueError, match="reserves"):
        histogram_partial_sketches(hist_df, ["cnt"], "v", 10, "b")
    part = spark.createDataFrame(
        [("x", [1, 2])], "h string, sketch array<bigint>"
    )
    with pytest.raises(ValueError, match="reserves"):
        kmv_merge(part, ["h"], k=8)


def test_kmv_merge_rejects_tighter_partials(spark):
    """Partials truncated at a smaller k cannot reconstruct the global
    bottom-k — merging them at a larger k must fail loud, not
    underestimate silently."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_merge,
        kmv_partial_sketches,
    )

    df = spark.createDataFrame(
        [("g", i, i % 3) for i in range(100)], "g string, v int, b int"
    )
    partials = kmv_partial_sketches(df, ["g"], "v", "b", k=8)
    with pytest.raises(Exception, match="cannot be merged at k=16"):
        kmv_merge(partials, ["g"], k=16).collect()
    # equal k still merges fine
    assert kmv_merge(partials, ["g"], k=8).count() == 1


def test_bloom_no_false_negatives_and_merge_equals_one_shot(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"m{i}", i % 3) for i in range(30)], "v string, b int"
    )
    probe_rows = [(f"m{i}",) for i in range(30)] + [
        (f"x{i}",) for i in range(200)
    ] + [(None,)]
    probe = spark.createDataFrame(probe_rows, "v string")

    one_shot = bloom_build(members, "v", m_bits=4096, k_hashes=4)
    merged = bloom_merge(
        bloom_build(members, "v", m_bits=4096, k_hashes=4, batch_col="b")
    )
    assert one_shot.first().bloom == merged.first().bloom

    hits = {
        r.v: r.bloom_hit
        for r in bloom_probe(probe, "v", merged, 4096, 4).collect()
    }
    assert all(hits[f"m{i}"] for i in range(30))  # no false negatives
    assert hits[None] is False
    # false positives are rare at this sizing and deterministic:
    # two probes agree exactly
    again = {
        r.v: r.bloom_hit
        for r in bloom_probe(probe, "v", one_shot, 4096, 4).collect()
    }
    assert hits == again
    fp = sum(1 for i in range(200) if hits[f"x{i}"])
    assert fp <= 5  # (k*n/m)^k ~ 7e-7 per probe; 5 allows huge slack


def test_bloom_merge_rejects_mixed_parameters(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_merge,
    )

    a = bloom_build(
        spark.createDataFrame([("x",)], "v string"), "v", m_bits=1024
    )
    b = bloom_build(
        spark.createDataFrame([("y",)], "v string"), "v", m_bits=2048
    )
    with pytest.raises(Exception, match="disagree"):
        bloom_merge(a.unionByName(b)).collect()


def test_bloom_probe_is_broadcast_no_shuffle(spark):
    """The probed corpus must not shuffle — the sketch broadcasts."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame([("m",)], "v string")
    probe = spark.createDataFrame([("m",), ("x",)], "v string")
    sketch = bloom_build(members, "v", m_bits=256, k_hashes=2)
    plan = (
        bloom_probe(probe, "v", sketch, 256, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning(v" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    with pytest.raises(ValueError, match="reserves"):
        bloom_probe(
            probe.withColumn("bloom_hit", F.lit(True)), "v", sketch, 256, 2
        )


def test_bloom_probe_validates_sketch_geometry(spark):
    """Probing at a different (m_bits, k_hashes) than the sketch was
    built with computes wrong positions — the no-false-negative
    guarantee silently breaks — so the probe must fail loud on the
    geometry the sketch row carries."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame([("m",)], "v string")
    probe = spark.createDataFrame([("m",)], "v string")
    sketch = bloom_build(members, "v", m_bits=1024, k_hashes=3)
    with pytest.raises(Exception, match="mismatched geometry"):
        bloom_probe(probe, "v", sketch, m_bits=2048, k_hashes=3).collect()
    with pytest.raises(Exception, match="mismatched geometry"):
        bloom_probe(probe, "v", sketch, m_bits=1024, k_hashes=4).collect()
    # agreeing geometry still probes
    ok = bloom_probe(probe, "v", sketch, m_bits=1024, k_hashes=3).collect()
    assert ok[0].bloom_hit is True


def test_bloom_probe_multirow_sketch_fails_loud(spark):
    """Unmerged per-batch partials passed as the sketch would silently
    probe against ONE nondeterministic batch — fail loud instead."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [("m0", 0), ("m1", 1)], "v string, b int"
    )
    partials = bloom_build(members, "v", m_bits=256, k_hashes=2, batch_col="b")
    probe = spark.createDataFrame([("m0",)], "v string")
    with pytest.raises(Exception, match="multiple rows"):
        bloom_probe(probe, "v", partials, 256, 2).collect()


def test_bloom_probe_empty_sketch_is_all_miss(spark):
    """A zero-row sketch frame (e.g. per-batch build over an empty
    benchmark set) means the member set is empty: every probe misses,
    no rows are dropped or duplicated."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    empty_members = spark.createDataFrame([], "v string, b int")
    partials = bloom_build(
        empty_members, "v", m_bits=256, k_hashes=2, batch_col="b"
    )
    assert partials.count() == 0
    probe = spark.createDataFrame([("a",), ("b",), (None,)], "v string")
    out = bloom_probe(probe, "v", partials, 256, 2).collect()
    assert len(out) == 3
    assert all(r.bloom_hit is False for r in out)


def test_bloom_merge_empty_partials_fails_loud(spark):
    """A global agg over zero partials would emit bloom=[] with NULL
    geometry — a sketch that can no longer be validated — so the merge
    raises instead."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_merge,
    )

    empty_members = spark.createDataFrame([], "v string, b int")
    partials = bloom_build(
        empty_members, "v", m_bits=256, k_hashes=2, batch_col="b"
    )
    with pytest.raises(Exception, match="no partial sketches"):
        bloom_merge(partials).collect()


def test_cms_merge_equals_one_shot(spark):
    """Counters are counts, so summing per-batch partials must yield
    the EXACT one-shot counter table — and therefore identical heavy
    hitters on the same corpus."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters,
        cms_heavy_hitters_from_sketch,
        cms_merge,
        cms_partial_sketches,
    )

    rows = []
    for i in range(400):
        rows.append(("g1", i % 4, "hot"))         # heavy in g1
        rows.append(("g1", i % 4, f"rare{i}"))
        rows.append(("g2", i % 4, "warm" if i % 2 else f"x{i}"))
    df = spark.createDataFrame(rows, "g string, b int, item string")

    one_shot = cms_heavy_hitters(df, ["g"], "item", phi=0.2, depth=3, width=64)
    partials = cms_partial_sketches(df, ["g"], "item", "b", depth=3, width=64)
    merged = cms_merge(partials, ["g"])
    from_sketch = cms_heavy_hitters_from_sketch(
        df.drop("b"), merged, ["g"], "item", phi=0.2, depth=3, width=64
    )
    a = {tuple(r) for r in one_shot.collect()}
    b = {tuple(r) for r in from_sketch.collect()}
    assert a == b and len(a) > 0

    # the merged counter table is bit-identical to the one-shot build
    occ = df.where(F.col("item").isNotNull()).select("g", "item")
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        _cms_counters,
    )
    one_cnt = {tuple(r) for r in _cms_counters(occ, ["g"], "item", 3, 64).collect()}
    mrg_cnt = {
        tuple(r)
        for r in merged.select("g", "r", "bucket", "cnt").collect()
    }
    assert one_cnt == mrg_cnt


def test_cms_merge_rejects_mixed_geometry(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_merge,
        cms_partial_sketches,
    )

    df = spark.createDataFrame(
        [("g", 0, "a"), ("g", 1, "b")], "g string, b int, item string"
    )
    p1 = cms_partial_sketches(df, ["g"], "item", "b", depth=3, width=64)
    p2 = cms_partial_sketches(df, ["g"], "item", "b", depth=3, width=128)
    with pytest.raises(Exception, match="disagree"):
        cms_merge(p1.unionByName(p2), ["g"]).select("depth").collect()


def test_cms_from_sketch_validates_geometry(spark):
    """Probing at a different (depth, width) than the sketch was built
    with reads the wrong counters — fail loud, same contract as
    bloom_probe."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters_from_sketch,
        cms_merge,
        cms_partial_sketches,
    )

    df = spark.createDataFrame(
        [("g", i % 2, "hot") for i in range(20)],
        "g string, b int, item string",
    )
    sketch = cms_merge(
        cms_partial_sketches(df, ["g"], "item", "b", depth=3, width=64),
        ["g"],
    )
    with pytest.raises(Exception, match="does not match probe"):
        cms_heavy_hitters_from_sketch(
            df.drop("b"), sketch, ["g"], "item", phi=0.2, depth=3, width=128
        ).collect()
    with pytest.raises(Exception, match="does not match probe"):
        cms_heavy_hitters_from_sketch(
            df.drop("b"), sketch, ["g"], "item", phi=0.2, depth=2, width=64
        ).collect()
    # empty sketch frame also fails loud
    empty = sketch.where(F.lit(False))
    with pytest.raises(Exception, match="empty"):
        cms_heavy_hitters_from_sketch(
            df.drop("b"), empty, ["g"], "item", phi=0.2, depth=3, width=64
        ).collect()

def test_hash_family_xxhash64_across_sketches(spark):
    """The production xxhash64 family must (a) produce sane estimates,
    (b) keep merge == one-shot for every mergeable sketch, and
    (c) keep the Bloom no-false-negative guarantee — estimates DIFFER
    from md5 (different hash order) but the structural guarantees are
    family-independent."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_merge,
        bloom_probe,
        cms_heavy_hitters,
        cms_heavy_hitters_from_sketch,
        cms_merge,
        cms_partial_sketches,
        kmv_distinct,
        kmv_merge,
        kmv_partial_sketches,
    )

    df = spark.createDataFrame(
        [("g", i, i % 4) for i in range(2000)], "g string, v int, b int"
    )
    # KMV: one-shot ~= truth, merge == one-shot
    one = kmv_distinct(df, ["g"], "v", k=64, hash_family="xxhash64").first()
    assert abs(one.est_distinct - 2000) / 2000 < 0.35
    merged = kmv_merge(
        kmv_partial_sketches(df, ["g"], "v", "b", k=64, hash_family="xxhash64"),
        ["g"], k=64,
    ).first()
    assert merged.kth_hash == one.kth_hash
    assert merged.est_distinct == one.est_distinct

    # mixing families in a KMV merge fails loud
    mixed = kmv_partial_sketches(
        df.where(F.col("b") < 2), ["g"], "v", "b", k=64, hash_family="md5"
    ).unionByName(
        kmv_partial_sketches(
            df.where(F.col("b") >= 2), ["g"], "v", "b", k=64,
            hash_family="xxhash64",
        )
    )
    with pytest.raises(Exception, match="mix"):
        kmv_merge(mixed, ["g"], k=64).collect()

    # Bloom: no false negatives under xxhash64; family mismatch raises
    members = spark.createDataFrame(
        [(f"m{i}", i % 3) for i in range(30)], "v string, b int"
    )
    sk = bloom_merge(
        bloom_build(
            members, "v", m_bits=4096, k_hashes=4, batch_col="b",
            hash_family="xxhash64",
        )
    )
    probe = spark.createDataFrame([(f"m{i}",) for i in range(30)], "v string")
    hits = bloom_probe(
        probe, "v", sk, 4096, 4, hash_family="xxhash64"
    ).collect()
    assert all(r.bloom_hit for r in hits)
    with pytest.raises(Exception, match="mismatched geometry"):
        bloom_probe(probe, "v", sk, 4096, 4, hash_family="md5").collect()

    # CMS: from-sketch == one-shot under xxhash64; mismatch raises
    occ = spark.createDataFrame(
        [("g", i % 4, "hot" if i % 2 else f"rare{i}") for i in range(400)],
        "g string, b int, item string",
    )
    hh_one = cms_heavy_hitters(
        occ, ["g"], "item", phi=0.2, depth=3, width=64,
        hash_family="xxhash64",
    )
    cms_sk = cms_merge(
        cms_partial_sketches(
            occ, ["g"], "item", "b", depth=3, width=64,
            hash_family="xxhash64",
        ),
        ["g"],
    )
    hh_merged = cms_heavy_hitters_from_sketch(
        occ.drop("b"), cms_sk, ["g"], "item", phi=0.2, depth=3, width=64,
        hash_family="xxhash64",
    )
    assert {tuple(r) for r in hh_one.collect()} == {
        tuple(r) for r in hh_merged.collect()
    }
    with pytest.raises(ValueError, match="does not match probe"):
        cms_heavy_hitters_from_sketch(
            occ.drop("b"), cms_sk, ["g"], "item", phi=0.2, depth=3,
            width=64, hash_family="md5",
        )


def test_uniform_hash32_rejects_unknown_family(spark):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        uniform_hash32,
    )

    with pytest.raises(ValueError, match="unknown hash family"):
        uniform_hash32(F.lit("x"), family="sha1")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.sketch import (  # noqa: E402
    hll_distinct,
    hll_merge,
    hll_partial_sketches,
)


@pytest.fixture(scope="module")
def hll_rows(spark):
    # two groups: g=a has 300 distinct values (x3 duplicates each),
    # g=b has 80 distinct — both above the m=16 linear-counting knee
    rows = [("a", i % 300) for i in range(900)] + [
        ("b", 1000 + i % 80) for i in range(240)
    ]
    return spark.createDataFrame(rows, "g string, v bigint")


def test_hll_distinct_estimates_within_sigma(spark, hll_rows):
    out = {r.g: r for r in hll_distinct(hll_rows, ["g"], "v", p=6).collect()}
    # sigma = 1.04/sqrt(64) ~ 13%; allow 4 sigma
    assert abs(out["a"].est_distinct - 300) < 0.52 * 300
    assert abs(out["b"].est_distinct - 80) < 0.52 * 80
    assert out["a"].m == 64
    # duplicates must not move the estimate (register max is idempotent)
    once = {
        r.g: r
        for r in hll_distinct(
            hll_rows.dropDuplicates(["g", "v"]), ["g"], "v", p=6
        ).collect()
    }
    assert once["a"].est_distinct == out["a"].est_distinct
    assert once["b"].harmonic_scaled == out["b"].harmonic_scaled


def test_hll_merge_equals_one_shot(spark, hll_rows):
    batched = hll_rows.withColumn(
        "batch", (F.col("v") % 4).cast("int")
    )
    partials = hll_partial_sketches(
        batched, ["g"], "v", "batch", p=6
    )
    assert partials.count() == 8  # 2 groups x 4 batches
    first = partials.first()
    assert len(first["sketch"]) == 64 and first["p"] == 6
    merged = {r.g: r for r in hll_merge(partials, ["g"], p=6).collect()}
    oneshot = {r.g: r for r in hll_distinct(hll_rows, ["g"], "v", p=6).collect()}
    for g in ("a", "b"):
        assert merged[g].harmonic_scaled == oneshot[g].harmonic_scaled
        assert merged[g].est_distinct == oneshot[g].est_distinct
        assert merged[g].v_empty == oneshot[g].v_empty


def test_hll_merge_rejects_mixed_geometry(spark, hll_rows):
    batched = hll_rows.withColumn("batch", F.lit(0))
    p4 = hll_partial_sketches(batched, ["g"], "v", "batch", p=4)
    p5 = hll_partial_sketches(batched, ["g"], "v", "batch", p=5)
    with pytest.raises(ValueError, match="geometry"):
        hll_merge(p4.unionByName(p5), ["g"], p=4)
    with pytest.raises(ValueError, match="geometry"):
        hll_merge(p5, ["g"], p=4)


def test_hll_linear_counting_branch_flags(spark):
    tiny = spark.createDataFrame(
        [("t", i) for i in range(5)], "g string, v bigint"
    )
    row = hll_distinct(tiny, ["g"], "v", p=6).collect()[0]
    assert row.corrected  # 5 distincts on m=64 is deep in LC regime
    assert abs(row.est_distinct - 5) < 3


# ---------------------------------------------------------------------------
# KMV pairwise overlap
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.sketch import (  # noqa: E402
    kmv_jaccard,
)


def test_kmv_jaccard_exact_regime(spark):
    # A = {0..9}, B = {5..14}, C = {100..104}; k=64 > every union size,
    # so the sketches ARE the sets and every estimate is exact
    rows = (
        [("A", i) for i in range(10)]
        + [("B", i) for i in range(5, 15)]
        + [("C", i) for i in range(100, 105)]
    )
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {(r.g_a, r.g_b): r for r in kmv_jaccard(df, "g", "v").collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab.n_k == 15 and ab.n_overlap == 5
    assert ab.jaccard_est == round(5 / 15, 6)
    assert ab.est_union == 15.0
    assert ab.est_intersect == round(round(5 / 15, 6) * 15.0, 4)
    ac = out[("A", "C")]
    assert ac.n_overlap == 0 and ac.jaccard_est == 0.0
    assert ac.est_union == 15.0 and ac.est_intersect == 0.0


def test_kmv_jaccard_estimator_regime_sane_and_deterministic(spark):
    # unions far above k=16: the estimator kicks in; identical inputs
    # must produce identical estimates (pure function of the set)
    rows = [("A", i) for i in range(300)] + [("B", i) for i in range(150, 450)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    r1 = kmv_jaccard(df, "g", "v", k=16).collect()[0]
    r2 = kmv_jaccard(
        df.repartition(7), "g", "v", k=16
    ).collect()[0]
    assert r1 == r2  # partitioning-independent
    assert r1.n_k == 16
    # true union 450, true jaccard 150/450=0.333; 4-sigma-ish slack at k=16
    assert 100 < r1.est_union < 1300
    assert 0.0 <= r1.jaccard_est <= 0.9


# ---------------------------------------------------------------------------
# quantile band labels
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.sketch import (  # noqa: E402
    quantile_bucket_labels,
)


def test_quantile_bucket_labels_terciles(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "id bigint, v double"
    )
    out = {
        r.id: r.bucket
        for r in quantile_bucket_labels(
            df, "v", (1 / 3, 2 / 3), ("head", "middle", "tail")
        ).collect()
    }
    # ceil(10) → threshold bins 9 and 19; bins below go to the lower band
    assert [out[i] for i in (0, 8)] == ["head", "head"]
    assert [out[i] for i in (9, 18)] == ["middle", "middle"]
    assert [out[i] for i in (19, 29)] == ["tail", "tail"]
    assert sum(1 for b in out.values() if b == "head") == 9


def test_quantile_bucket_labels_validates(spark):
    df = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    with pytest.raises(ValueError, match="labels"):
        quantile_bucket_labels(df, "v", (0.5,), ("a", "b", "c"))
    with pytest.raises(ValueError, match="increasing"):
        quantile_bucket_labels(df, "v", (0.7, 0.3), ("a", "b", "c"))


def test_quantile_bucket_labels_scale_lifts_fractions(spark):
    # values in [0,1): scale=1000 resolves them onto the bin grid
    df = spark.createDataFrame(
        [(i, i / 100.0) for i in range(100)], "id bigint, v double"
    )
    out = quantile_bucket_labels(
        df, "v", (0.5,), ("low", "high"), scale=1000
    ).collect()
    lows = [r.id for r in out if r.bucket == "low"]
    assert len(lows) == 49 and max(lows) == 48


def test_cms_from_sketch_persists_sketch_and_scope_releases(spark):
    """r16 optimization: cms_heavy_hitters_from_sketch pins the
    (sketch-sized) merged counter frame before its geometry check so a
    composed partials->merge subtree is built once, not once per
    driver action — and the pin must obey the cached_scope lifecycle
    (released on scope exit, no storage growth in a long session)."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        cached_scope,
    )
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters,
        cms_heavy_hitters_from_sketch,
        cms_merge,
        cms_partial_sketches,
    )

    rows = []
    for i in range(200):
        rows.append(("g", i % 3, "hot"))
        rows.append(("g", i % 3, f"rare{i}"))
    df = spark.createDataFrame(rows, "g string, b int, item string")

    def persisted_ids():
        it = (
            spark.sparkContext._jsc.getPersistentRDDs()
            .keySet()
            .iterator()
        )
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    base = persisted_ids()
    with cached_scope():
        partials = cms_partial_sketches(
            df, ["g"], "item", "b", depth=3, width=64
        )
        merged = cms_merge(partials, ["g"])
        out = cms_heavy_hitters_from_sketch(
            df.drop("b"), merged, ["g"], "item", phi=0.2, depth=3, width=64
        )
        got = {tuple(r) for r in out.collect()}
        # the sketch pin (and the probe's counter pin) really cached
        assert persisted_ids() - base
    assert not (persisted_ids() - base)

    one_shot = cms_heavy_hitters(
        df, ["g"], "item", phi=0.2, depth=3, width=64
    )
    assert got == {tuple(r) for r in one_shot.collect()} and got


def _persisted_ids(spark):
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_cms_from_sketch_unscoped_release_and_error_path(spark):
    """ADVICE r16: the sketch pin must be attached to the result's
    _cached_deps (unscoped use → release_cached(result) frees it), the
    caller's own frame must not be the pinned object, and the
    geometry-mismatch failure path must unpersist before raising."""
    import pytest

    from etl_prometheus2clickhouse_spark.operators.dedup import (
        release_cached,
    )
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_heavy_hitters_from_sketch,
        cms_merge,
        cms_partial_sketches,
    )
    from pyspark import StorageLevel

    rows = []
    for i in range(100):
        rows.append(("g", i % 2, "hot"))
        rows.append(("g", i % 2, f"rare{i}"))
    df = spark.createDataFrame(rows, "g string, b int, item string")
    partials = cms_partial_sketches(
        df, ["g"], "item", "b", depth=3, width=64
    )
    merged = cms_merge(partials, ["g"])

    # unscoped use: the pins land on the result's _cached_deps and
    # release_cached frees every one of them
    base = _persisted_ids(spark)
    out = cms_heavy_hitters_from_sketch(
        df.drop("b"), merged, ["g"], "item", phi=0.2, depth=3, width=64
    )
    assert out.collect()
    # the caller-owned frame was never the pinned object
    assert merged.storageLevel == StorageLevel.NONE
    assert _persisted_ids(spark) - base
    release_cached(out)
    assert not (_persisted_ids(spark) - base)

    # geometry mismatch: fails loud AND leaks nothing
    base = _persisted_ids(spark)
    with pytest.raises(ValueError, match="geometry"):
        cms_heavy_hitters_from_sketch(
            df.drop("b"), merged, ["g"], "item", phi=0.2, depth=4,
            width=64,
        )
    assert not (_persisted_ids(spark) - base)
