"""Deterministic distinct-count sketching (engine extension).

K-minimum-values (KMV / bottom-k) cardinality estimation: hash every
value uniformly into [0, 2^32), keep the k smallest DISTINCT hashes per
group, and estimate ``|distinct| ~= (k-1) * 2^32 / h_(k)`` from the
k-th smallest hash (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM 2002 — the classic bottom-k estimator HLL
descends from).

Unlike ``approx_count_distinct`` (HLL++, whose register merges are
implementation-specific), KMV over a fixed public hash (md5 prefix) is
a pure function of the input SET — the same estimate on any engine, in
any execution order. That makes it the rare *approximate* operator
whose result is exactly reproducible by an ANSI-SQL oracle.

Scale shape: one distinct aggregation on (group, hash) with map-side
combine — identical to the dedup scan shape — then a per-group bottom-k
via ``row_number() <= k``, which Spark >= 3.5 executes with
WindowGroupLimit (the k-limit is pushed below the shuffle, so each map
task emits at most k rows per group, never the full distinct set), then
a k-row-per-group final aggregate. Bounded memory at any cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^32 and (k-1) * 2^32 are exactly representable doubles, so the
# estimate is a single IEEE division — bit-identical cross-engine.
_HASH_SPACE = float(2**32)


def uniform_hash32(col) -> "F.Column":
    """Deterministic uniform hash into [0, 2^32): the first 8 hex
    digits of md5 of the value's canonical string form. Public,
    engine-independent (DuckDB: ``('0x' || substr(md5(CAST(v AS
    VARCHAR)), 1, 8))::UBIGINT``) — **for integer and string columns
    only**. Doubles and timestamps render to strings differently per
    engine (scientific notation, fractional-second formatting), so the
    md5 inputs would silently diverge cross-engine; callers with such
    types must cast to bigint/string with explicit, engine-agreed
    semantics first (:func:`kmv_distinct` enforces this)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


# types whose CAST(v AS STRING) is identical across Spark and DuckDB —
# the only ones uniform_hash32 may see (see its docstring)
_HASHABLE_TYPES = ("byte", "short", "int", "bigint", "string", "long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns one row per group: ``n_k`` (hashes retained, == k unless
    the group has fewer distinct hashes), ``kth_hash`` (the largest
    retained hash), and ``est_distinct`` — the bottom-k estimate, or
    the exact distinct-hash count when the group is smaller than k
    (where the sketch IS the exact answer).
    """
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    vtype = df.schema[value_col].dataType.simpleString()
    if vtype not in _HASHABLE_TYPES:
        raise ValueError(
            f"kmv_distinct value column {value_col!r} has type {vtype}; "
            "uniform_hash32 is engine-stable only for integer/string "
            "types — cast explicitly (e.g. to bigint or string) first"
        )
    h = uniform_hash32(F.col(value_col))
    # NULL values are excluded, matching SQL COUNT(DISTINCT) — and a
    # NULL hash would also rank engine-dependently (Spark ASC puts
    # nulls first, DuckDB last), a silent cross-engine divergence
    distinct_h = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    bottom_k = (
        distinct_h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    agg = bottom_k.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_k"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(F.col("n_k") < k, F.col("n_k").cast("double")).otherwise(
        F.lit((k - 1) * _HASH_SPACE) / F.col("kth_hash")
    )
    return agg.withColumn("est_distinct", est)


def quantile_threshold_filter(
    df: DataFrame,
    value_col: str,
    phi: float,
    bucket_width: int,
) -> DataFrame:
    """Keep rows at or above the corpus-level ``phi``-quantile of a
    numeric column, located via a fixed-width histogram — the global-
    percentile filter ("drop everything under the corpus p90 length")
    without a global sort.

    Pass 1 is one map-side-combining aggregation into
    ``value div bucket_width`` bins: state is O(value range /
    bucket_width), independent of row count. The cumulative scan and
    threshold pick run as window/agg over the HISTOGRAM (thousands of
    rows at most — the single-partition window is over sketch state,
    never data). The threshold joins back as a broadcast single-row
    frame, so no scalar ever passes through the driver and the whole
    filter is one plan.

    Threshold semantics (deterministic, oracle-exact): the kept set is
    ``value >= lo(b*)`` where ``b*`` is the smallest bucket whose
    cumulative count reaches ``ceil(phi * total)`` — i.e. the bucket
    edge UNDER the true quantile, an over-inclusive bound off by at
    most one bucket width. Integer bucket math end to end; the one
    float op (``ceil(phi*total)``) is a single IEEE multiply both
    engines share.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError("phi must be in (0, 1)")
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    v = F.col(value_col)
    # NULL values fall outside any quantile and would create a NULL
    # histogram bucket whose sort position is engine-dependent
    df = df.where(v.isNotNull())
    hist = df.groupBy(
        F.floor(v / bucket_width).cast("long").alias("__b")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    cum = hist.select(
        "__b",
        F.sum("__cnt").over(w_cum).alias("__cum"),
        F.sum("__cnt").over(w_tot).alias("__total"),
    )
    thr = cum.where(
        F.col("__cum") >= F.ceil(F.lit(phi) * F.col("__total"))
    ).agg(F.min("__b").alias("__thr_b"))
    return (
        df.crossJoin(F.broadcast(thr))
        .where(v >= F.col("__thr_b") * bucket_width)
        .drop("__thr_b")
    )
