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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant: floor(2^32 / golden ratio), odd.
_MULT = 2654435761
_MODULUS = 2**32
# second independent odd multiplier for per-copy key strides
# (xxHash32's PRIME32_2 — public constant, coprime to 2^32)
_MULT2 = 2246822519


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


def _round6(x: float) -> float:
    """Explicit HALF-UP rounding to 6 dp via ``floor(x·10⁶ + 0.5)/10⁶``
    — the engine's cross-engine rounding convention (identical
    computation on identical doubles; the EWMA lesson)."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def temperature_epochs(
    token_counts: dict[str, int],
    budget_tokens: int,
    temperature: float,
) -> dict[str, float]:
    """Temperature-based mixture allocation — the multilingual-
    pretraining sampling rule (mT5/XLM-R lineage; UniMax, Chung et al.
    ICLR 2023, is the capped alternative below): source ``s`` receives
    ``budget · n_s^(1/τ) / Σ_t n_t^(1/τ)`` tokens, i.e. τ=1 samples
    proportional to size, τ→∞ flattens toward uniform, τ<1 sharpens
    toward the head. Returned as EPOCHS per source
    (``target_s / n_s``): epochs < 1 is downsampling, > 1 means the
    source repeats — :func:`mix_epochs` materializes either.

    Determinism contract: when ``1/τ`` is integral the weights are
    exact integer powers and every float op is pinned to the order
    ``((budget · w_s) / Σw) / n_s`` then 6-dp-rounded with the
    ``floor(x·10⁶+0.5)`` spelling — bit-reproducible in ANSI SQL, so a
    catalog oracle can re-derive the allocation from the corpus (the
    ``mix_temperature`` entry runs at τ=0.5, α=2)."""
    if not token_counts:
        raise ValueError("temperature_epochs: empty token_counts")
    if temperature <= 0:
        raise ValueError(
            f"temperature_epochs: temperature must be > 0, got {temperature}"
        )
    if any(n <= 0 for n in token_counts.values()):
        raise ValueError(
            "temperature_epochs: every source needs a positive token count"
        )
    alpha = 1.0 / temperature
    if alpha == int(alpha):
        weights = {s: n ** int(alpha) for s, n in token_counts.items()}
    else:
        weights = {s: float(n) ** alpha for s, n in token_counts.items()}
    total_w = sum(weights.values())
    # every operand double-cast BEFORE the pinned ((B·w)/Σw)/n order —
    # Python's exact big-int division would otherwise round differently
    # from an engine's double arithmetic (each cast and op below is a
    # single IEEE rounding, identical in any engine that evaluates the
    # same order)
    return {
        s: _round6(
            float(budget_tokens) * float(weights[s]) / float(total_w)
            / float(n)
        )
        for s, n in token_counts.items()
    }


def unimax_epochs(
    token_counts: dict[str, int],
    budget_tokens: int,
    max_epochs: float = 4.0,
) -> dict[str, float]:
    """UniMax mixture allocation (Chung et al., ICLR 2023): split the
    token budget as UNIFORMLY across sources as the per-source epoch
    cap allows — greedy waterfilling in ascending capacity order: each
    source takes ``min(remaining / sources_left, cap · n_s)`` tokens.
    Low-resource sources are repeated up to the cap instead of being
    temperature-upweighted past usefulness; the budget lands on the
    sources that can still absorb it. Returns epochs per source,
    6-dp-rounded; allocation never exceeds ``max_epochs`` and is
    monotone in the budget."""
    if not token_counts:
        raise ValueError("unimax_epochs: empty token_counts")
    if max_epochs <= 0:
        raise ValueError(
            f"unimax_epochs: max_epochs must be > 0, got {max_epochs}"
        )
    if any(n <= 0 for n in token_counts.values()):
        raise ValueError(
            "unimax_epochs: every source needs a positive token count"
        )
    remaining = float(budget_tokens)
    out: dict[str, float] = {}
    # ascending capacity: a source that hits its cap frees budget for
    # the ones after it (the paper's allocation order)
    pending = sorted(token_counts, key=lambda s: (max_epochs * token_counts[s], s))
    for idx, s in enumerate(pending):
        quota = remaining / (len(pending) - idx)
        alloc = min(quota, max_epochs * token_counts[s])
        remaining -= alloc
        out[s] = _round6(alloc / token_counts[s])
    return out


def mix_epochs(
    sources: list[tuple[DataFrame, str]],
    epochs: dict[str, float],
    id_col: str,
    salt: int = 12345,
    max_epochs: float = 128.0,
) -> DataFrame:
    """Materialize an epoch allocation (:func:`temperature_epochs` /
    :func:`unimax_epochs`) into actual training rows: every row of
    source ``s`` appears ``floor(e_s)`` times plus one more copy with
    probability ``frac(e_s)`` — the deterministic realization of "this
    source runs 2.3 epochs". The fractional coin is the same
    multiplicative-hash Bernoulli as :func:`mix_corpora` (per-source
    salt ``salt + i``), so membership of the extra copy is a pure
    function of the row id; each copy carries its own ``mix_key``
    (``u_bucket + copy · 2246822519 mod 2^32`` — an independent odd
    stride, exact wide-integer math) so shard writes interleave copies
    apart instead of adjacent (repeated data adjacent in a batch is
    the failure mode epoch replication must avoid).

    Scale shape: membership and copy counts are pure JVM hash
    expressions; the only row expansion is ``explode_outer`` of a
    ``sequence(1, n_copies)`` materialized in its own projection (the
    InferFiltersFromGenerate discipline), so output volume is exactly
    Σ_s e_s·|s| — the training budget, not a blowup. ``max_epochs`` is
    a loud guard against an allocation bug replicating a corpus
    hundreds of times. Emits ``source``, ``u_bucket``, ``n_copies``,
    ``copy`` (1-based), ``mix_key`` beside the input columns."""
    if not sources:
        raise ValueError("mix_epochs needs at least one source")
    parts = []
    for i, (df, name) in enumerate(sources):
        if name not in epochs:
            raise ValueError(f"mix_epochs: no epoch allocation for {name!r}")
        e = float(epochs[name])
        if e < 0:
            raise ValueError(f"source {name!r}: epochs {e} < 0")
        if e > max_epochs:
            raise ValueError(
                f"source {name!r}: epochs {e} exceeds max_epochs "
                f"{max_epochs} — an allocation this high replicates the "
                "corpus that many times; raise the guard only on purpose"
            )
        for reserved in ("source", "u_bucket", "n_copies", "copy",
                         "mix_key"):
            if reserved in df.columns:
                raise ValueError(
                    f"mix_epochs reserves column name {reserved!r}; "
                    "rename it on the input frame first"
                )
        whole = int(math.floor(e))
        frac = e - whole  # exact: both doubles, |e - whole| < 1
        bucket = sample_bucket(id_col, salt=salt + i).cast("long")
        n_copies = (
            F.lit(whole)
            + F.when(
                F.col("u_bucket") < F.lit(frac) * F.lit(float(_MODULUS)),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).cast("int")
        wide_id = F.col(id_col).cast("decimal(38,0)")
        copy_key = (
            (
                wide_id * F.lit(_MULT)
                + F.lit(salt + i + 7919)
                + F.col("copy").cast("decimal(38,0)") * F.lit(_MULT2)
            )
            % F.lit(_MODULUS)
        ).cast("long")
        part = (
            df.select("*", bucket.alias("u_bucket"))
            .select("*", n_copies.alias("n_copies"))
            # own projection for the sequence, explode_outer + null
            # filter — the InferFiltersFromGenerate discipline (a plain
            # explode of a computed array gets the generator expression
            # cloned into an injected size()>0 filter)
            .select(
                "*",
                F.when(
                    F.col("n_copies") >= 1,
                    F.sequence(
                        F.lit(1), F.col("n_copies"), F.lit(1)
                    ),
                ).alias("__copies"),
            )
            .select("*", F.explode_outer("__copies").alias("copy"))
            .where(F.col("copy").isNotNull())
            .drop("__copies")
            .withColumn("source", F.lit(name))
            .withColumn("mix_key", copy_key)
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    order_col: str = "mix_key",
    key_spec: "dict | None" = None,
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

    ``key_spec`` (optional) records how ``order_col`` derives from the
    row id (:func:`.shards.write_shards_meta` format) in a
    ``_shards_meta.json`` beside the shards — it makes a later
    :func:`.shards.shards_delete` takedown scan-free (the affected
    shard set is recomputed from the delete ids alone). The geometry
    (order_col, n_shards, width) is recorded unconditionally.

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
    from etl_prometheus2clickhouse_spark.operators.shards import (
        write_shards_meta,
    )

    write_shards_meta(
        df.sparkSession, path, order_col, n_shards, key_spec=key_spec
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
