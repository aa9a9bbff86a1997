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
