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
