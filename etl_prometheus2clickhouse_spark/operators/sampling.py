"""Deterministic sampling for training-data pipelines (engine
extension; BASELINE.json north star).

Data mixing — "keep 25% of English web text, all of the German, a
tenth of the boilerplate source" — is a core training-pipeline
operation at 100 TB, and the naive tools are wrong for it:
``df.sample()`` is seed-per-partition (membership changes under
repartitioning, retries, and scale-up), and sorting-based subsampling
is a full shuffle. The right primitive is a *pure function of the row
id*: deterministic multiplicative hashing.

Scale shape: sampling is a broadcast join (the per-stratum rate table
is tiny) plus a JVM filter over a hash expression — NO shuffle, no
Python, fully pushdown-friendly; membership of a row is stable across
runs, partitionings, cluster sizes, and even engines. The hash
arithmetic is spelled in exact wide-integer math (``decimal(38,0)`` in
Spark, ``HUGEINT`` in DuckDB) so it is ANSI-overflow-safe and
bit-identical in the oracle: an auditor can recompute membership of
any row with one line of SQL.

Why multiplicative hashing (Knuth): ``(id * 2654435761 + salt) mod
2^32`` scatters sequential ids uniformly (2654435761 ≈ 2^32/φ), which
is exactly the common case for training corpora with dense monotone
doc ids; the low bits of ``id`` itself would correlate with ingest
order and bias the sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant: floor(2^32 / golden ratio), odd.
_MULT = 2654435761
_MODULUS = 2**32


def sample_bucket(id_col: Column | str, salt: int = 12345) -> Column:
    """Deterministic uniform bucket in ``[0, 2^32)`` from a numeric id.

    Exact wide-integer arithmetic (``decimal(38,0)``): a 64-bit id
    times a 32-bit constant overflows BIGINT, which under Spark 4's
    default ANSI mode is a runtime error, not a wrap — decimal math
    sidesteps it and matches DuckDB's HUGEINT spelling digit for
    digit."""
    wide = F.col(id_col).cast("decimal(38,0)") if isinstance(id_col, str) else id_col.cast("decimal(38,0)")
    return (wide * F.lit(_MULT) + F.lit(salt)) % F.lit(_MODULUS)


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    stratum_col: str,
    id_col: str,
    salt: int = 12345,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample.

    ``rates`` is a tiny (stratum, rate) table — broadcast; a row
    survives iff ``sample_bucket(id) < rate * 2^32``. Rate 0 drops a
    stratum entirely, rate 1.0 keeps it whole, and a stratum absent
    from ``rates`` is dropped (inner join) — the explicit-recipe
    contract: a new surprise stratum in the data does not silently
    ride through at some default rate.

    Output keeps the input columns plus ``u_bucket`` (the hash bucket)
    so every membership decision is auditable after the fact.
    """
    for reserved in ("rate", "u_bucket"):
        if reserved in df.columns:
            raise ValueError(
                f"stratified_sample reserves column name {reserved!r}; "
                "rename it on the input frame first"
            )
    bucket = sample_bucket(id_col, salt=salt).cast("long").alias("u_bucket")
    joined = df.join(F.broadcast(rates), stratum_col, "inner")
    return joined.select("*", bucket).where(
        F.col("u_bucket") < F.col("rate") * F.lit(float(_MODULUS))
    ).drop("rate")


def weighted_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: int = 12345,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: k rows per
    stratum, selection probability proportional to weight (Efraimidis &
    Spirakis, "Weighted random sampling with a reservoir", IPL 2006).

    Each row gets priority ``u^(1/w)`` with ``u = (bucket+1) / 2^32``
    drawn from the same multiplicative hash as the Bernoulli sampler —
    a pure function of the row id, so the sample is reproducible across
    runs, partitionings, and engines (the oracle recomputes it in SQL).
    The top-k priorities per stratum ARE a weighted sample without
    replacement — the one-pass distributed form of "pick k docs
    proportional to quality/length" that a naive cumulative-weight
    scheme needs a global prefix sum for.

    Scale shape: one hash projection (no Python), then per-stratum
    top-k via ``row_number() <= k``, which Spark executes with
    WindowGroupLimit — map tasks emit at most k rows per stratum, so
    the shuffle carries O(strata × k), not the corpus. Rows with
    weight <= 0 are excluded (ES defines priorities for positive
    weights).

    Determinism note: ``pow`` is the one libm call in the engine's
    oracle surface; both JVM ``Math.pow`` and DuckDB guarantee <1 ulp,
    so a selection flip would need two priorities within ~1e-16 at the
    rank-k boundary — ruled out on hash-spread inputs. Ties (equal
    weight AND equal hash bucket) break on id.
    """
    if k < 1:
        raise ValueError("weighted_sample k must be >= 1")
    for reserved in ("__pri", "sample_rank"):
        if reserved in df.columns:
            raise ValueError(
                f"weighted_sample reserves column name {reserved!r}; "
                "rename it on the input frame first"
            )
    from pyspark.sql import Window

    u = (sample_bucket(id_col, salt=salt).cast("double") + 1.0) / float(
        _MODULUS
    )
    w = F.col(weight_col).cast("double")
    pri = F.pow(u, 1.0 / w)
    ranked = (
        # w > 0 excludes NULL weights too; a NULL id would hash to a
        # NULL priority whose sort position is engine-dependent
        df.where((w > 0) & F.col(id_col).isNotNull())
        .withColumn("__pri", pri)
        .withColumn(
            "sample_rank",
            F.row_number()
            .over(
                Window.partitionBy(stratum_col).orderBy(
                    F.col("__pri").desc(), F.col(id_col)
                )
            )
            .cast("int"),
        )
        .where(F.col("sample_rank") <= k)
        .drop("__pri")
    )
    return ranked


def mix_corpora(
    sources: list[tuple[DataFrame, str, float]],
    id_col: str,
    salt: int = 12345,
) -> DataFrame:
    """Deterministic corpus mixing — the pretraining data-mixture
    step: each source corpus contributes a deterministic Bernoulli
    sample at its own rate ("25% of web text, all of the curated
    set"), the survivors are unioned with a ``source`` tag, and every
    row carries a ``mix_key`` — a second independent hash of its id —
    so writing the mixture ordered by ``mix_key`` (e.g.
    ``repartitionByRange(n, "mix_key")`` at shard-write time) yields a
    reproducible global interleave of the sources instead of
    source-contiguous shards. No shuffle happens HERE: membership and
    keys are pure per-row hash expressions (the same
    :func:`sample_bucket` arithmetic, per-source salted with
    ``salt + i`` so identical ids in different sources draw
    independent coins); the one range shuffle is the caller's explicit
    write-time choice.

    ``sources`` is ``[(df, name, rate), ...]``; frames must share the
    selected schema (align columns first — loud union error
    otherwise). Membership, like all sampling here, is stable across
    runs, partitionings, and engines, and every decision is auditable
    from the emitted ``u_bucket`` (the ``corpus_mix`` catalog oracle
    recomputes the whole mixture in SQL)."""
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    parts = []
    for i, (df, name, rate) in enumerate(sources):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"source {name!r}: rate {rate} not in [0, 1]")
        for reserved in ("source", "u_bucket", "mix_key"):
            if reserved in df.columns:
                raise ValueError(
                    f"mix_corpora reserves column name {reserved!r}; "
                    "rename it on the input frame first"
                )
        bucket = (
            sample_bucket(id_col, salt=salt + i).cast("long")
        ).alias("u_bucket")
        mix_key = (
            sample_bucket(id_col, salt=salt + i + 7919).cast("long")
        ).alias("mix_key")
        parts.append(
            df.select("*", bucket, mix_key)
            .where(F.col("u_bucket") < F.lit(float(rate) * _MODULUS))
            .withColumn("source", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    order_col: str = "mix_key",
) -> DataFrame:
    """Materialize a corpus (typically a :func:`mix_corpora` output)
    into ``n_shards`` internally-sorted parquet shards keyed on
    ``order_col`` — the final write step of a training-data pipeline.

    Shard assignment is ``floor(key / ceil(2^32 / n_shards))`` — an
    equal-width cut of the hash key space, NOT Spark's
    ``repartitionByRange`` (whose boundaries come from reservoir
    sampling with a per-run seed, so two writes of the same frame
    would shard differently — the opposite of this module's
    determinism contract). Because ``mix_key`` is hash-uniform, equal
    key widths give balanced shards; each shard is a contiguous key
    interval, so sources interleave uniformly WITHIN a shard instead
    of arriving source-contiguous, and the row→shard mapping is a
    pure function of the row — reproducible across runs, cluster
    sizes, and engines, auditable with one line of SQL. The write is
    ``partitionBy`` on the shard id (one directory per shard); the
    single shuffle is the per-shard clustering for the sorted write.

    Returns a slim audit manifest read back from the written table:
    one row per shard with its row count and observed key range."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if "__shard" in df.columns:
        raise ValueError(
            "write_training_shards reserves column name '__shard'"
        )
    width = -(-_MODULUS // n_shards)  # ceil: shard ids in [0, n_shards)
    (
        df.withColumn(
            "__shard", (F.col(order_col) / F.lit(width)).cast("int")
        )
        .repartition(n_shards, F.col("__shard"))
        # the partitionBy writer requires task rows sorted by the
        # partition column and would insert its own (unstable) sort —
        # leading with __shard satisfies that requirement so the
        # secondary order_col sort survives into the files
        .sortWithinPartitions("__shard", order_col)
        .write.mode("overwrite")
        .partitionBy("__shard")
        .parquet(path)
    )
    back = df.sparkSession.read.parquet(path)
    return (
        back.groupBy(F.col("__shard").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(order_col).alias("key_min"),
            F.max(order_col).alias("key_max"),
        )
        .orderBy("shard")
    )
