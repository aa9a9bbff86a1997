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
    """Deterministic uniform hash of any value into [0, 2^32): the
    first 8 hex digits of md5 of the value's canonical string form.
    Public, engine-independent (DuckDB: ``('0x' || substr(md5(CAST(v
    AS VARCHAR)), 1, 8))::UBIGINT``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


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
    h = uniform_hash32(F.col(value_col))
    distinct_h = df.select(*group_cols, h.alias("h")).distinct()
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
