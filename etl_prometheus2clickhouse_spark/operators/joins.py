"""Temporal joins Spark lacks as built-ins — expressed as compositions
of existing DataFrame ops (no UDFs, no custom physical operators).

:func:`asof_join` — for each left row, attach the most recent right
row of the same key with ``right_ts <= left_ts`` (backward as-of, the
market-data/config-lookup join). The classic scalable formulation:

    tag both sides → union → one window per key ordered by
    (ts, side-tag) → ``last(right payload, ignorenulls)`` carries the
    latest right values forward onto every left row.

Why union+window instead of a join: a naive inequality join is a
per-key cross product (O(n·m) per key); the union sorts each key ONCE
and streams it — the same single shuffle+sort any keyed window costs,
independent of match fan-out. Right-side rows sort before left rows at
equal timestamps, so the match is inclusive (``<=``), matching DuckDB
``ASOF JOIN``'s semantics (its oracle in the catalog).

Skew note: a single giant key is the usual keyed-window failure mode;
the bucket-window-stitch recipe in ``operators/timeseries.py`` applies
here identically (carry the per-bucket last right-payload through the
slim frame) if a deployment needs it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.functions.ts import epoch_seconds


def _ts_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds (double, µs precision) from a timestamp,
    timestamp_ntz, or numeric-seconds column — WITHOUT consulting the
    session timezone. TZ-sensitive coercions (NTZ→LTZ casts,
    unix_timestamp) would make join results depend on whoever created
    the SparkSession; see :func:`functions.ts.epoch_seconds` (the
    engine-wide dispatch this delegates to)."""
    return epoch_seconds(df, col)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Interval-containment join: left rows × right intervals of the
    same key with ``start <= ts <= end`` (inner; one output row per
    matching pair — fan-out is the semantics).

    Spark plans a raw inequality join as a nested loop; the scalable
    shape buckets time: each right interval explodes into one slim row
    per covered bucket, each left row computes its single bucket, and
    the join becomes an equi-join on ``(key, bucket)`` followed by the
    exact BETWEEN filter. A (row, interval) pair can only meet in the
    row's own bucket, so no dedup is needed. Size ``bucket_seconds``
    near the typical interval length: the explode factor is
    ``interval/bucket + 1`` and candidate precision is
    ``interval/(interval + bucket)``.
    """
    on = list(on)
    g = int(bucket_seconds)
    l_sec = _ts_seconds(left, left_ts)
    s_sec = _ts_seconds(right, start_col)
    e_sec = _ts_seconds(right, end_col)
    l_tagged = left.withColumn("__sec", l_sec).withColumn(
        "__bucket", F.floor(F.col("__sec") / g).cast("long")
    )
    r_exploded = (
        right.withColumn("__s", s_sec)
        .withColumn("__e", e_sec)
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s") / g).cast("long"),
                    F.floor(F.col("__e") / g).cast("long"),
                )
            ),
        )
    )
    joined = l_tagged.join(r_exploded, [*on, "__bucket"]).where(
        (F.col("__sec") >= F.col("__s")) & (F.col("__sec") <= F.col("__e"))
    )
    return joined.drop("__bucket", "__sec", "__s", "__e")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + the nearest right values at or before
    (``direction="backward"``, the default — latest ``rts <= lts``) or
    at or after (``"forward"`` — earliest ``rts >= lts``) the left
    timestamp; NULLs when no right row qualifies.

    Both directions are the same single keyed sort: forward simply
    orders the union DESCENDING, so "carry the last right payload
    forward" becomes "carry the next one backward" — no second recipe,
    no join. ``right`` must be unique per ``(on, right_ts)`` — dedupe
    first if not (ties would make "the nearest row" ambiguous in ANY
    as-of implementation). ``tolerance_seconds`` optionally voids
    matches farther than the window (pandas ``merge_asof`` tolerance
    semantics, direction-aware).
    Output: all left columns + the right side's non-key, non-ts columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    on = list(on)
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    lcols = [c for c in left.columns]

    tagged_r = right.select(
        *on,
        _ts_seconds(right, right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        *on,
        _ts_seconds(left, left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)

    # right rows (__side=0) sort before left rows at equal __ts →
    # inclusive matching in both directions; forward just walks the
    # timeline from the other end
    order = (
        [F.col("__ts").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__side").asc()]
    )
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rcols
        ],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__m_ts"),
    )
    out = carried.where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # __ts is epoch seconds (see _ts_seconds) — plain arithmetic,
        # no interval types, no session-timezone dependence
        if direction == "backward":
            stale = F.col("__m_ts") < (
                F.col("__ts") - F.lit(float(tolerance_seconds))
            )
        else:
            stale = F.col("__m_ts") > (
                F.col("__ts") + F.lit(float(tolerance_seconds))
            )
        matched = [
            F.when(~stale, F.col(f"__m_{c}")).alias(c) for c in rcols
        ]
    else:
        matched = [F.col(f"__m_{c}").alias(c) for c in rcols]
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *matched,
    )


# ---------------------------------------------------------------------------
# skew tooling: measure, then mitigate
# ---------------------------------------------------------------------------

def key_skew_stats(
    df: DataFrame, key_cols: Sequence[str], top: int = 20
) -> DataFrame:
    """Per-key concentration report — the diagnostic you run BEFORE
    deciding a join needs salting: the ``top`` heaviest keys with
    their row counts and corpus share, rank 1 = heaviest (count desc,
    then key for determinism). A share_pct worth of rows landing on
    one shuffle partition is exactly the wall-clock a plain
    shuffle-key join loses to its slowest task.

    One map-side-combining count aggregate; the top-N cut is a global
    WindowGroupLimit over key-count rows (already reduced to one row
    per key), so nothing heavier than the distinct key set ever
    sorts."""
    counted = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.orderBy(
        F.col("n_rows").desc(), *[F.col(c) for c in key_cols]
    )
    total = counted.agg(F.sum("n_rows").alias("__total"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("rank").cast("int").alias("rank"),
            F.round(F.col("n_rows") / F.col("__total"), 6).alias(
                "share"
            ),
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the classic salting rewrite for skewed keys:
    the left side's rows are spread across ``n_salts`` sub-keys by a
    deterministic hash of ``salt_col`` (any left column that varies
    within a key — a row id, a timestamp), the right side is
    replicated once per salt, and the join runs on
    ``(key…, salt)`` — a single hot key's probe work lands on
    ``n_salts`` tasks instead of one. Result set is EXACTLY the plain
    join's (the salt matches by construction: every left row meets
    its key's full right payload exactly once), which is what the
    catalog oracle checks — the plain-join SQL.

    Trade: right-side shuffle volume × n_salts in exchange for an
    n_salts-way split of the hottest reduce task. Use after
    :func:`key_skew_stats` shows a dominant key; AQE's skew-join
    handles sort-merge spills adaptively, but salting also covers
    the hash-agg-above-join and stateful-streaming shapes AQE can't
    re-plan. Deterministic (xxhash64 salt), so results are stable
    across runs and engines. ``how`` supports the payload-preserving
    variants (inner / left); asymmetric anti/semi shapes don't need
    salting (their right side reduces to the key set — dedup it
    instead)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}"
        )
    keys = list(on)
    salt_l = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast(
        "int"
    )
    lhs = left.withColumn("__salt", salt_l)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lhs.join(rhs, [*keys, "__salt"], how)
    return out.drop("__salt")


def bloom_filtered_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k_hashes: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Inner equi-join with Bloom semi-join reduction — the standard
    big-join shuffle cut (the rewrite engines ship as runtime row-level
    filtering): build a membership sketch of the right side's keys,
    probe the LEFT side against it with a single-row broadcast (zero
    shuffle of the big side), and only the survivors enter the real
    join. True members always pass (Bloom has no false negatives), and
    the join itself removes the deterministic false positives — so the
    result set is EXACTLY the plain join's, which is what the catalog
    oracle checks.

    100 TB shape: the left exchange shrinks from |left| rows to
    |matching| + the ~(k·n/m)^k false-positive trickle; the sketch
    costs one pass over the (small) right side and ships as ≤ m_bits
    bit positions. Worth it exactly when the right side is selective —
    for a non-selective right side the probe filters nothing and you
    paid one extra scan; :func:`key_skew_stats` on the key column
    tells you which case you are in. Composes the existing
    bloom_build/bloom_probe artifacts, so the same sketch can also be
    persisted and reused across joins (the mergeable-sketch
    lifecycle)."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    sketch = bloom_build(
        right.select(key_col), key_col, m_bits, k_hashes,
        hash_family=hash_family,
    )
    survivors = (
        bloom_probe(
            left, key_col, sketch, m_bits, k_hashes,
            hash_family=hash_family,
        )
        .where(F.col("bloom_hit"))
        .drop("bloom_hit")
    )
    return survivors.join(right, key_col, "inner")


def _deletion_neighborhood(token: Column) -> Column:
    """The token plus every single-character-deletion variant — the
    SymSpell blocking key set. Two strings at Levenshtein distance
    ≤ 1 always share at least one key (equal → the string itself;
    deletion/insertion → the shorter string; substitution at i →
    both drop position i), so the equi-join below has EXACT recall
    and the explicit distance check only removes false positives."""
    n = F.length(token)
    dels = F.transform(
        # guard: sequence(1, 0) would count DOWN — empty strings get
        # no deletion variants
        F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.concat(
            # 1-based substr; lengths clipping past the end is fine
            token.substr(F.lit(1), i - 1),
            token.substr(i + 1, n),
        ),
    )
    return F.array_distinct(F.concat(F.array(token), dels))


def fuzzy_token_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str = "token",
    right_col: str = "token",
) -> DataFrame:
    """All pairs of (left token, right token) within Levenshtein
    distance 1 — WITHOUT the quadratic cross join.

    Deletion-neighborhood blocking (the SymSpell scheme, public):
    each side expands to its ≤ len+1 deletion variants, candidates
    meet on an equi-join over the variant key, duplicates from
    multi-key matches collapse, and ``F.levenshtein`` verifies
    exactly. At 100 TB the variant frames are (token-count × avg-len)
    slim string pairs feeding a hash join — broadcastable when one
    side is a reference lexicon — versus the unrunnable |L|×|R|
    cross product; candidate fan-out is bounded by key collisions
    among near-identical strings, not corpus size.

    Inputs are deduplicated on the token column first, so the output
    is one row per distinct pair: (left token, right token,
    distance 0 or 1).
    """
    lt = left.select(F.col(left_col).alias("lt")).where(
        F.col("lt").isNotNull()
    ).distinct()
    rt = right.select(F.col(right_col).alias("rt")).where(
        F.col("rt").isNotNull()
    ).distinct()
    lv = lt.select(
        "lt", F.explode(_deletion_neighborhood(F.col("lt"))).alias("__k")
    )
    rv = rt.select(
        "rt", F.explode(_deletion_neighborhood(F.col("rt"))).alias("__k")
    )
    cand = lv.join(rv, "__k").select("lt", "rt").distinct()
    return cand.select(
        F.col("lt").alias("left_token"),
        F.col("rt").alias("right_token"),
        F.levenshtein("lt", "rt").cast("int").alias("distance"),
    ).where(F.col("distance") <= 1)
