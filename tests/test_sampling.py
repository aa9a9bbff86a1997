"""Deterministic stratified sampling (operators/sampling.py): pure
id-hash membership, explicit-recipe stratum handling, shuffle-free
plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.sampling import (
    sample_bucket,
    stratified_sample,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rates(spark, pairs):
    return spark.createDataFrame(pairs, "lang string, rate double")


def test_membership_is_deterministic_and_subset(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rates = _rates(spark, [("en", 0.3), ("de", 0.5)])
    a = {r.doc_id for r in stratified_sample(d, rates, "lang", "doc_id").collect()}
    b = {r.doc_id for r in stratified_sample(d, rates, "lang", "doc_id").collect()}
    assert a == b  # pure function of id — no seed-per-partition drift
    all_ids = {r.doc_id for r in d.select("doc_id").collect()}
    assert a <= all_ids and a


def test_rate_edges_and_unknown_strata(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rates = _rates(spark, [("en", 1.0), ("de", 0.0)])
    out = stratified_sample(d, rates, "lang", "doc_id")
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    # rate 1.0 keeps the stratum whole, rate 0 drops it entirely,
    # strata missing from the recipe (es/fr/zh) never ride through
    assert langs == {"en"}
    n_en = d.where(F.col("lang") == "en").count()
    assert out.count() == n_en


def test_sampled_fraction_tracks_rate(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rate = 0.25
    out = stratified_sample(d, _rates(spark, [("en", rate)]), "lang", "doc_id")
    n = d.where(F.col("lang") == "en").count()
    k = out.count()
    # multiplicative hashing over dense ids: loose 2.5x band, no flakes
    assert 0.1 * n <= k <= 0.45 * n, (k, n)


def test_membership_survives_repartitioning(spark, sf_dir):
    """The df.sample() failure mode this operator exists to avoid:
    membership must be identical under a different partitioning."""
    d = _docs(spark, sf_dir)
    rates = _rates(spark, [("en", 0.3), ("zh", 0.6)])
    a = {r.doc_id for r in stratified_sample(d, rates, "lang", "doc_id").collect()}
    b = {
        r.doc_id
        for r in stratified_sample(
            d.repartition(7, "lang"), rates, "lang", "doc_id"
        ).collect()
    }
    assert a == b


def test_plan_is_broadcast_join_no_shuffle(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rates = _rates(spark, [("en", 0.5)])
    out = stratified_sample(d, rates, "lang", "doc_id")
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    # the only Exchange is the broadcast of the rate table — the big
    # side never shuffles
    import re

    non_broadcast = [
        l for l in plan.splitlines()
        if re.search(r"\bExchange (hash|range|Single)", l)
    ]
    assert non_broadcast == [], non_broadcast
    assert "PythonUDF" not in plan  # pure JVM expressions


def test_bucket_matches_wide_integer_spelling(spark):
    """ANSI-overflow safety: the decimal spelling must equal the exact
    mathematical value for ids big enough that BIGINT math would
    overflow (and error under ANSI)."""
    big = 2**62 + 12345
    df = spark.createDataFrame([(big,)], "id long")
    got = df.select(sample_bucket("id").cast("long").alias("b")).first().b
    assert got == (big * 2654435761 + 12345) % 2**32


def test_weighted_sample_known_answer(spark):
    """ES sampling on a hand-checkable input: priorities recomputed in
    Python must select the same rows in the same rank order."""
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, "s", float(1 + i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, g string, w double")
    got = [
        (r.id, r.sample_rank)
        for r in weighted_sample(df, "g", "id", "w", k=5)
        .orderBy("sample_rank")
        .collect()
    ]
    pri = {
        i: (((i * 2654435761 + 12345) % 2**32 + 1.0) / 2**32) ** (1.0 / w)
        for i, _, w in rows
    }
    want = sorted(pri, key=lambda i: (-pri[i], i))[:5]
    assert got == [(i, r + 1) for r, i in enumerate(want)]


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, "g", 0.0), (2, "g", -3.0), (3, "g", 5.0)],
        "id bigint, g string, w double",
    )
    got = weighted_sample(df, "g", "id", "w", k=10).collect()
    assert [r.id for r in got] == [3]


def test_weighted_sample_deterministic_across_partitionings(spark):
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, f"g{i % 3}", float(1 + (i * 13) % 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, g string, w double")
    a = sorted(map(tuple, weighted_sample(df, "g", "id", "w", k=7).collect()))
    b = sorted(
        map(
            tuple,
            weighted_sample(df.repartition(17, "w"), "g", "id", "w", k=7)
            .collect(),
        )
    )
    assert a == b and len(a) == 21


def test_weighted_sample_higher_weight_wins_same_bucket(spark):
    """With equal hash buckets impossible to arrange, pin monotonicity
    the cheap way: duplicating a row id with a larger weight must rank
    it at least as high (u^(1/w) is increasing in w for u in (0,1))."""
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(7, "a", 2.0), (7, "b", 20.0)], "id bigint, g string, w double"
    )
    got = {r.g: r.sample_rank for r in weighted_sample(df, "g", "id", "w", k=1).collect()}
    assert got == {"a": 1, "b": 1}


def test_weighted_sample_uses_window_group_limit(spark):
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, "g", 1.0 + i) for i in range(50)], "id bigint, g string, w double"
    )
    plan = (
        weighted_sample(df, "g", "id", "w", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_weighted_sample_rejects_reserved_columns(spark):
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        weighted_sample,
    )

    for reserved in ("__pri", "sample_rank"):
        df = spark.createDataFrame(
            [(1, "g", 1.0, 0)], f"id bigint, g string, w double, {reserved} int"
        )
        with pytest.raises(ValueError, match=reserved):
            weighted_sample(df, "g", "id", "w", k=1)


def test_mix_corpora_membership_and_interleave(spark):
    """Mixture membership is per-source-salted (the same id draws
    independent coins in different sources), rates are honored in
    expectation, mix_key is independent of u_bucket, and validation
    is loud."""
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        _MODULUS,
        _MULT,
        mix_corpora,
        sample_bucket,
    )

    a = spark.range(2000).select(F.col("id").alias("doc_id"))
    b = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = mix_corpora(
        [(a, "a", 0.3), (b, "b", 1.0)], id_col="doc_id"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, {})[r.doc_id] = r
    assert len(by_src["b"]) == 2000  # rate 1.0 keeps everything
    frac = len(by_src["a"]) / 2000
    assert 0.25 < frac < 0.35  # hash-uniform at rate 0.3
    # per-source salts: source a row i uses salt 12345, b uses 12346
    for i, r in list(by_src["a"].items())[:50]:
        assert r.u_bucket == (i * _MULT + 12345) % _MODULUS
        assert r.mix_key == (i * _MULT + 12345 + 7919) % _MODULUS
    some_b = next(iter(by_src["b"].values()))
    assert some_b.u_bucket == (some_b.doc_id * _MULT + 12346) % _MODULUS
    # determinism: same call, same membership
    again = {
        (r.source, r.doc_id)
        for r in mix_corpora(
            [(a, "a", 0.3), (b, "b", 1.0)], id_col="doc_id"
        ).collect()
    }
    assert again == {(r.source, r.doc_id) for r in out}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="rate"):
        mix_corpora([(a, "a", 1.5)], id_col="doc_id")
    with _pytest.raises(ValueError, match="reserves"):
        mix_corpora(
            [(a.withColumn("source", F.lit("x")), "a", 0.5)],
            id_col="doc_id",
        )
    with _pytest.raises(ValueError, match="at least one"):
        mix_corpora([], id_col="doc_id")


def test_write_training_shards_ranges_and_determinism(spark, tmp_path):
    """Shard assignment is an equal-width cut of the hash key space:
    non-overlapping contiguous ranges aligned to the cut, internally
    sorted files, exact reproducibility across writes (which
    repartitionByRange's sampled boundaries cannot give)."""
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        _MODULUS,
        mix_corpora,
        write_training_shards,
    )

    a = spark.range(3000).select(F.col("id").alias("doc_id"))
    mixed = mix_corpora([(a, "a", 1.0)], id_col="doc_id")
    n = 4
    width = -(-_MODULUS // n)
    p1 = str(tmp_path / "s1")
    manifest = write_training_shards(mixed, p1, n_shards=n).collect()
    assert [r.shard for r in manifest] == [0, 1, 2, 3]
    assert sum(r.n_rows for r in manifest) == 3000
    for r in manifest:
        # every observed key inside the shard's deterministic interval
        assert r.shard * width <= r.key_min <= r.key_max < (r.shard + 1) * width
    # hash-uniform keys → balanced shards (loose bound)
    assert max(r.n_rows for r in manifest) < 2 * min(
        r.n_rows for r in manifest
    )
    # rows inside each shard directory are sorted by the key
    from pyspark.sql.window import Window as W

    back = spark.read.parquet(p1)
    unsorted = (
        back.withColumn("f", F.input_file_name())
        .withColumn(
            "prev",
            F.lag("mix_key").over(
                W.partitionBy("f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .where(F.col("prev") > F.col("mix_key"))
        .count()
    )
    assert unsorted == 0
    # determinism: same frame → byte-identical manifest
    p2 = str(tmp_path / "s2")
    manifest2 = write_training_shards(mixed, p2, n_shards=n).collect()
    assert [tuple(r) for r in manifest] == [tuple(r) for r in manifest2]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        write_training_shards(mixed, str(tmp_path / "x"), n_shards=0)


# ---------------------------------------------------------------------------
# temperature / UniMax epoch allocation + materialization
# ---------------------------------------------------------------------------


def test_temperature_epochs_allocation_math():
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        temperature_epochs,
    )

    counts = {"web": 1_000_000, "code": 100_000, "books": 10_000}
    total = sum(counts.values())
    # τ=1: proportional sampling → exactly one epoch everywhere
    e1 = temperature_epochs(counts, total, temperature=1.0)
    assert all(abs(v - 1.0) < 1e-9 for v in e1.values()), e1
    # τ=0.5 (α=2) sharpens toward the head: web upsampled relative to
    # its share, books' epochs collapse
    e05 = temperature_epochs(counts, total, temperature=0.5)
    assert e05["web"] > 1.0 > e05["code"] > e05["books"]
    # τ→∞ flattens toward uniform TOKEN budget per source → the small
    # source repeats many times
    eflat = temperature_epochs(counts, total, temperature=100.0)
    assert eflat["books"] > eflat["code"] > eflat["web"]
    # budget scales allocations linearly
    e2x = temperature_epochs(counts, 2 * total, temperature=1.0)
    assert all(abs(v - 2.0) < 1e-9 for v in e2x.values())
    with pytest.raises(ValueError, match="temperature"):
        temperature_epochs(counts, total, temperature=0.0)
    with pytest.raises(ValueError, match="positive token count"):
        temperature_epochs({"a": 0}, 10, temperature=1.0)


def test_unimax_epochs_waterfilling():
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        unimax_epochs,
    )

    counts = {"web": 1_000_000, "code": 100_000, "books": 10_000}
    # generous budget: small sources hit the cap, the head absorbs the
    # remainder
    e = unimax_epochs(counts, 2_000_000, max_epochs=4.0)
    assert e["books"] == 4.0 and e["code"] == 4.0
    spent = sum(e[s] * counts[s] for s in counts)
    assert abs(spent - 2_000_000) < 1.0  # budget exhausted
    assert all(v <= 4.0 for v in e.values())
    # tiny budget: nobody caps, uniform token split
    e_small = unimax_epochs(counts, 30_000, max_epochs=4.0)
    for s, n in counts.items():
        assert abs(e_small[s] * n - 10_000) < 1.0, (s, e_small)
    # monotone in budget
    e_mid = unimax_epochs(counts, 1_000_000, max_epochs=4.0)
    assert all(e_small[s] <= e_mid[s] <= e[s] for s in counts)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_epochs(counts, 10, max_epochs=0)


def test_mix_epochs_materialization(spark):
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        _MODULUS,
        mix_epochs,
        sample_bucket,
    )

    a = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    b = spark.range(1000, 1400).select(F.col("id").alias("doc_id"))
    epochs = {"head": 0.25, "tail": 2.5}
    out = mix_epochs(
        [(a, "head"), (b, "tail")], epochs, id_col="doc_id"
    ).persist()
    rows = out.collect()
    # head: each row 0 or 1 copies, ~25%; tail: 2 or 3 copies each
    head = [r for r in rows if r.source == "head"]
    tail = [r for r in rows if r.source == "tail"]
    assert all(r.n_copies in (0, 1) for r in head)
    assert all(r.copy == 1 for r in head)
    assert 150 < len(head) < 350  # ~250 expected
    assert all(r.n_copies in (2, 3) for r in tail)
    per_doc = {}
    for r in tail:
        per_doc.setdefault(r.doc_id, []).append(r.copy)
    # every tail doc present with copies 1..n_copies, ~40% get a third
    assert len(per_doc) == 400
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_doc.values())
    n3 = sum(1 for v in per_doc.values() if len(v) == 3)
    assert 120 < n3 < 280  # ~200 expected
    # expansion volume ≈ Σ e_s·|s|
    assert abs(len(rows) - (0.25 * 1000 + 2.5 * 400)) < 120
    # membership of the fractional copy is the documented hash coin
    sample = spark.createDataFrame(
        [(r.doc_id, r.n_copies) for r in tail], "doc_id long, n_copies int"
    ).withColumn("bucket", sample_bucket("doc_id", salt=12345 + 1).cast("long"))
    for r in sample.collect():
        expected = 2 + (1 if r.bucket < 0.5 * _MODULUS else 0)
        assert r.n_copies == expected
    # mix_key distinct per copy, deterministic across recomputation
    keys = sorted((r.doc_id, r.copy, r.mix_key) for r in rows)
    keys2 = sorted(
        (r.doc_id, r.copy, r.mix_key)
        for r in mix_epochs(
            [(a, "head"), (b, "tail")], epochs, id_col="doc_id"
        ).collect()
    )
    assert keys == keys2
    assert len({k[2] for k in keys if k[0] >= 1000}) > 350  # keys spread
    out.unpersist()


def test_mix_epochs_guards(spark):
    from etl_prometheus2clickhouse_spark.operators.sampling import (
        mix_epochs,
    )

    a = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="max_epochs"):
        mix_epochs([(a, "x")], {"x": 500.0}, id_col="doc_id")
    with pytest.raises(ValueError, match="no epoch allocation"):
        mix_epochs([(a, "x")], {"y": 1.0}, id_col="doc_id")
    with pytest.raises(ValueError, match="reserves column"):
        mix_epochs(
            [(a.withColumn("copy", F.lit(1)), "x")],
            {"x": 1.0},
            id_col="doc_id",
        )
    # zero epochs drops the source entirely
    out = mix_epochs([(a, "x")], {"x": 0.0}, id_col="doc_id")
    assert out.count() == 0


def test_mix_epochs_plan_pure_jvm_no_shuffle(spark):
    """The materialization's scale claim as a plan assertion: copy
    counts, membership, and keys are JVM hash expressions, the
    expansion is a generator — no Python eval node, no shuffle of the
    corpus side."""
    import re

    from etl_prometheus2clickhouse_spark.operators.sampling import (
        mix_epochs,
    )

    a = spark.range(100).select(F.col("id").alias("doc_id"))
    out = mix_epochs([(a, "x")], {"x": 1.5}, id_col="doc_id")
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "PythonUDF" not in plan and "EvalPython" not in plan
    non_broadcast = [
        l for l in plan.splitlines()
        if re.search(r"\bExchange (hash|range|Single)", l)
    ]
    assert non_broadcast == [], non_broadcast
    # the generator expression must not be cloned into an injected
    # size()>0 filter (the InferFiltersFromGenerate blowup): the plan
    # carries explode_outer (Generate ... false) — outer generate is
    # exempt from the rule
    assert "sequence(" in plan
