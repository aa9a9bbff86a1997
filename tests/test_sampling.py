"""Deterministic stratified sampling (operators/sampling.py): pure
id-hash membership, explicit-recipe stratum handling, shuffle-free
plan."""

from __future__ import annotations

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
