"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the dominant cost of every query is scan volume, and scan
volume is governed by file-level min/max statistics: a parquet reader
skips a whole file when the predicate's column range misses the file's
(min, max). Sorting on one column gives perfect pruning on that column
and none on any other; interleaving the bits of several columns into
one Morton key and clustering on THAT gives bounded per-file ranges on
ALL participating dimensions at once (the classic multi-dimensional
index trade — Morton 1966; the same layout Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``, re-derived here from the public construction).

Production write recipe (the layout itself)::

    keyed = zorder_key(df, ["user_id", "ts_s"], bits=16)
    keyed.repartitionByRange(n_files, "zkey") \\
         .sortWithinPartitions("zkey") \\
         .write.parquet(...)

``repartitionByRange`` balances file SIZES even when the key space is
populated unevenly (its sampled boundaries adapt to density), at the
cost of run-seeded boundary placement; :func:`zorder_stats` instead
uses deterministic fixed z-prefix buckets so the per-bucket range
bounds are a pure function of the data and can be oracle-verified —
the pruning WITNESS, not the write path.

Everything is integer arithmetic (bucketing uses exact integer
division, never float), JVM-side, whole-stage-codegen friendly; the
only action is an optional bounded min/max collect (2 values per
dimension) when ``bounds`` isn't supplied by the caller — at scale you
pass known bounds and the operator is a pure narrow expression.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def _bucket(col: str, lo: int, hi: int, bits: int):
    """Exact integer bucketing of ``col`` in [lo, hi] to [0, 2**bits).

    ``((x - lo) * 2**bits) div (hi - lo + 1)`` — integer ``div``, not
    float division + floor: a correctly-rounded double quotient can
    land exactly on an integer boundary that true rational division
    falls just short of, and the oracle's BIGINT ``//`` would then
    disagree by one bucket."""
    b = 1 << bits
    raw = F.expr(
        f"(({col} - {lo}L) * {b}L) div ({hi - lo + 1}L)"
    )
    return F.least(F.greatest(raw, F.lit(0)), F.lit(b - 1))


def zorder_key(
    df: DataFrame,
    dims: list[str],
    bits: int = 8,
    bounds: dict[str, tuple[int, int]] | None = None,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a Morton key interleaving ``bits`` bits of each integer
    column in ``dims`` (dimension j contributes bit i to key bit
    ``i*d + j``). ``bounds`` maps dim -> (lo, hi); omitted bounds are
    computed with one min/max aggregate (a bounded collect of two
    numbers per dimension — pass known bounds at scale to keep the
    operator a pure narrow expression). Values outside supplied bounds
    clamp to the edge buckets."""
    d = len(dims)
    if d == 0:
        raise ValueError("zorder_key needs at least one dimension")
    if bits * d > 62:
        raise ValueError(
            f"bits={bits} over {d} dims needs {bits * d} key bits; "
            "the key is a signed 64-bit long (max 62)"
        )
    need = [c for c in dims if bounds is None or c not in bounds]
    bounds = dict(bounds or {})
    if need:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in need],
            *[F.max(c).alias(f"hi_{c}") for c in need],
        ).first()
        for c in need:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    buckets = [
        _bucket(c, int(bounds[c][0]), int(bounds[c][1]), bits)
        for c in dims
    ]
    terms = [
        F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), i * d + j
        ).cast("long")
        for i in range(bits)
        for j, b in enumerate(buckets)
    ]
    return df.withColumn(key_col, reduce(lambda a, t: a + t, terms))


def zorder_stats(
    df: DataFrame,
    dims: list[str],
    bits: int = 8,
    prefix_bits: int = 4,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Per-bucket range report for a Z-order clustering — the pruning
    witness. Rows are grouped into ``2**prefix_bits`` deterministic
    buckets by the Morton key's top bits and each bucket reports its
    row count and (min, max) of every dimension: bounded per-bucket
    ranges on EVERY dim are exactly what makes file-level min/max
    skipping effective after a z-ordered write. One slim shuffle (the
    map-side-combining stats aggregate); the key itself is a pure
    expression."""
    if prefix_bits > bits * len(dims):
        raise ValueError(
            f"prefix_bits={prefix_bits} exceeds the {bits * len(dims)}"
            "-bit key"
        )
    keyed = zorder_key(df, dims, bits=bits, bounds=bounds)
    part = F.shiftright("zkey", bits * len(dims) - prefix_bits)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in dims:
        aggs.append(F.min(c).cast("long").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"max_{c}"))
    return (
        keyed.groupBy(part.cast("long").alias("part_id"))
        .agg(*aggs)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[str],
    n_files: int,
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton key — the production write path whose effect
    :func:`zorder_stats` predicts. ``repartitionByRange`` on the key
    balances file SIZES even over unevenly populated key space (its
    sampled boundaries adapt to density — the right trade for a write
    path, where skewed file sizes hurt more than run-seeded boundary
    placement), and the within-partition sort tightens each file's
    per-column min/max envelope so footer-level statistics prune on
    EVERY participating dimension. The key column is dropped before
    writing; tests verify the claim directly from the written parquet
    footers (pyarrow metadata), not from the plan."""
    keyed = zorder_key(df, dims, bits=bits, bounds=bounds)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_pruning_stats(
    path: str, ranges: dict[str, tuple[int, int]]
) -> dict[str, int]:
    """Read-side pruning WITNESS for a z-ordered table: given a
    conjunctive range predicate ``{dim: (lo, hi)}``, count — from the
    written parquet FOOTERS, the same statistics any engine's
    row-group filter consults — how many row groups are provably
    disjoint from the query rectangle (min > hi or max < lo on any
    dim) and therefore skipped without reading a byte of data pages.

    This is the query-side complement of the write-side envelope test:
    the layout is only worth its sort if a 2-dim range predicate
    actually skips, which is file-format arithmetic, not a plan
    property — so it is measured here from metadata, engine-agnostic.
    Returns ``{"skipped": k, "total": n, "rows_skipped": r,
    "rows_total": m}``."""
    import pathlib

    import pyarrow.parquet as pq

    skipped = total = rows_skipped = rows_total = 0
    for f in sorted(pathlib.Path(path).glob("part-*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        names = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            total += 1
            rows_total += g.num_rows
            prunable = False
            for dim, (lo, hi) in ranges.items():
                st = g.column(names[dim]).statistics
                if st is None:
                    continue
                if st.min > hi or st.max < lo:
                    prunable = True
                    break
            if prunable:
                skipped += 1
                rows_skipped += g.num_rows
    return {
        "skipped": skipped,
        "total": total,
        "rows_skipped": rows_skipped,
        "rows_total": rows_total,
    }


def hilbert_key(
    df: DataFrame,
    dims: list[str],
    bits: int = 8,
    bounds: dict[str, tuple[int, int]] | None = None,
    key_col: str = "hkey",
) -> DataFrame:
    """Append a 2-D HILBERT curve key (Hilbert 1891; the xy→d bit
    iteration in its standard integer form) — the locality-tighter
    sibling of :func:`zorder_key`: the Hilbert curve has no Morton
    quadrant jumps, so consecutive key ranges cover more compact
    rectangles and file envelopes tighten further (measured in
    tests/test_layout.py on the same data/write path).

    Exactly TWO dimensions (the classic curve; Morton generalizes to
    any d trivially, Hilbert does not — use :func:`zorder_key` for
    d ≠ 2). Same exact-integer bucketing as the Morton key (engine-
    reproducible `div` arithmetic, clamped edges), then ``bits``
    unrolled rotation steps as pure JVM expressions — a Python loop
    builds the expression chain; no Python executes per row. The
    DuckDB oracle replicates the identical unrolled arithmetic."""
    if len(dims) != 2:
        raise ValueError(
            f"hilbert_key is the 2-D curve (got {len(dims)} dims); "
            "zorder_key handles arbitrary dimensionality"
        )
    if 2 * bits > 62:
        raise ValueError(f"bits={bits} needs {2 * bits} key bits (max 62)")
    need = [c for c in dims if bounds is None or c not in bounds]
    bounds = dict(bounds or {})
    if need:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in need],
            *[F.max(c).alias(f"hi_{c}") for c in need],
        ).first()
        for c in need:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    bx = _bucket(dims[0], int(bounds[dims[0]][0]), int(bounds[dims[0]][1]), bits)
    by = _bucket(dims[1], int(bounds[dims[1]][0]), int(bounds[dims[1]][1]), bits)
    out = df.withColumn("__hx", bx.cast("long")).withColumn(
        "__hy", by.cast("long")
    ).withColumn("__hd", F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        # s*s can reach 2^60 (bits up to 31): the multiplier MUST be a
        # LongType literal and the quadrant index cast to long BEFORE
        # multiplying — int32 arithmetic here overflows at bits >= 16
        # (ANSI mode: runtime ARITHMETIC_OVERFLOW; non-ANSI: silent
        # wrong keys).
        d_step = F.lit(s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
        )
        # quadrant rotation: when ry == 0 the frame flips (and mirrors
        # when rx == 1); when ry == 1 coordinates pass through
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("__hy")).otherwise(
                F.col("__hy")
            ),
        ).otherwise(F.col("__hx"))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("__hx")).otherwise(
                F.col("__hx")
            ),
        ).otherwise(F.col("__hy"))
        out = (
            out.withColumn("__hd2", F.col("__hd") + d_step)
            .withColumn("__nx", nx)
            .withColumn("__ny", ny)
            .drop("__hd", "__hx", "__hy")
            .withColumnRenamed("__hd2", "__hd")
            .withColumnRenamed("__nx", "__hx")
            .withColumnRenamed("__ny", "__hy")
        )
    return (
        out.withColumn(key_col, F.col("__hd"))
        .drop("__hd", "__hx", "__hy")
    )


def hilbert_stats(
    df: DataFrame,
    dims: list[str],
    bits: int = 8,
    prefix_bits: int = 4,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Per-bucket range report for a Hilbert clustering — the same
    pruning witness as :func:`zorder_stats`, over the Hilbert key's
    top bits."""
    if prefix_bits > 2 * bits:
        raise ValueError(
            f"prefix_bits={prefix_bits} exceeds the {2 * bits}-bit key"
        )
    keyed = hilbert_key(df, dims, bits=bits, bounds=bounds)
    part = F.shiftright("hkey", 2 * bits - prefix_bits)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in dims:
        aggs.append(F.min(c).cast("long").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"max_{c}"))
    return keyed.groupBy(part.cast("long").alias("part_id")).agg(*aggs)


def write_hilbert(
    df: DataFrame,
    path: str,
    dims: list[str],
    n_files: int,
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> None:
    """Clustered write on the Hilbert key — same recipe as
    :func:`write_zordered` (range-partition for balanced file sizes,
    within-partition sort for tight footer envelopes, key dropped)."""
    keyed = hilbert_key(df, dims, bits=bits, bounds=bounds)
    (
        keyed.repartitionByRange(n_files, "hkey")
        .sortWithinPartitions("hkey")
        .drop("hkey")
        .write.mode("overwrite")
        .parquet(path)
    )
