"""Z-order (Morton) layout: key construction and pruning stats."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.operators.layout import (
    zorder_key,
    zorder_stats,
)


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(x, y) for x in range(4) for y in range(4)]
    return spark.createDataFrame(rows, "x bigint, y bigint")


def test_zorder_key_interleaves_bits(spark, grid):
    out = {
        (r.x, r.y): r.zkey
        for r in zorder_key(
            grid, ["x", "y"], bits=2, bounds={"x": (0, 3), "y": (0, 3)}
        ).collect()
    }
    # dim j contributes bit i at key position i*d + j:
    # zkey = x0 + 2*y0 + 4*x1 + 8*y1
    def morton(x, y):
        return (
            (x & 1)
            | ((y & 1) << 1)
            | (((x >> 1) & 1) << 2)
            | (((y >> 1) & 1) << 3)
        )

    assert out == {(x, y): morton(x, y) for x in range(4) for y in range(4)}
    # the classic property: z-order visits the 4x4 grid quadrant by
    # quadrant — keys 0-3 are the low-low quadrant, 12-15 high-high
    assert sorted(out[(x, y)] for x in range(2) for y in range(2)) == [0, 1, 2, 3]
    assert sorted(out[(x, y)] for x in (2, 3) for y in (2, 3)) == [12, 13, 14, 15]


def test_zorder_stats_buckets_are_quadrants(spark, grid):
    stats = {
        r.part_id: r
        for r in zorder_stats(
            grid,
            ["x", "y"],
            bits=2,
            prefix_bits=2,
            bounds={"x": (0, 3), "y": (0, 3)},
        ).collect()
    }
    assert set(stats) == {0, 1, 2, 3}
    # every bucket holds exactly one quadrant: both dims' ranges are
    # halved — the per-file min/max bound that makes skipping work
    for part, r in stats.items():
        assert r.n_rows == 4
        assert r.max_x - r.min_x == 1
        assert r.max_y - r.min_y == 1
    assert (stats[0].min_x, stats[0].min_y) == (0, 0)
    assert (stats[3].min_x, stats[3].min_y) == (2, 2)


def test_zorder_key_computes_bounds_when_omitted(spark, grid):
    with_bounds = zorder_key(
        grid, ["x", "y"], bits=2, bounds={"x": (0, 3), "y": (0, 3)}
    )
    computed = zorder_key(grid, ["x", "y"], bits=2)
    assert sorted(r.zkey for r in with_bounds.collect()) == sorted(
        r.zkey for r in computed.collect()
    )


def test_zorder_key_clamps_outside_supplied_bounds(spark):
    df = spark.createDataFrame([(-5,), (99,)], "x bigint")
    keys = sorted(
        r.zkey
        for r in zorder_key(df, ["x"], bits=2, bounds={"x": (0, 3)}).collect()
    )
    assert keys == [0, 3]


def test_zorder_key_rejects_oversized_keys(spark, grid):
    with pytest.raises(ValueError, match="62"):
        zorder_key(grid, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="prefix_bits"):
        zorder_stats(grid, ["x", "y"], bits=2, prefix_bits=5)


def test_write_zordered_tightens_file_envelopes(spark, tmp_path):
    """The written files' FOOTER statistics must show bounded per-file
    rectangles on both dims — measured from parquet metadata, not the
    plan. Baseline: the same data written unsorted has files covering
    (nearly) the full range of both dims."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.layout import (
        write_zordered,
    )

    grid = spark.range(100_000).select(
        (F.col("id") % 256).alias("x"),
        F.pmod(F.col("id") * 2654435761, F.lit(256)).alias("y"),
    )

    def envelopes(path):
        out = []
        for f in sorted(path.glob("part-*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if name in lo and st is not None:
                        lo[name] = (
                            st.min if lo[name] is None
                            else min(lo[name], st.min)
                        )
                        hi[name] = (
                            st.max if hi[name] is None
                            else max(hi[name], st.max)
                        )
            out.append((hi["x"] - lo["x"], hi["y"] - lo["y"]))
        return out

    zpath = tmp_path / "zordered"
    write_zordered(
        grid, str(zpath), ["x", "y"], n_files=16, bits=8,
        bounds={"x": (0, 255), "y": (0, 255)},
    )
    plain = tmp_path / "plain"
    grid.repartition(16).write.parquet(str(plain))

    z_env = envelopes(zpath)
    p_env = envelopes(plain)
    assert len(z_env) == 16
    # unsorted files each cover ~the whole 0..255 range on both dims
    assert all(ex > 250 and ey > 250 for ex, ey in p_env)
    # z-ordered files must be materially tighter on BOTH dims at
    # once. Files that straddle a Morton quadrant boundary can
    # legitimately span most of one dim (the curve's discontinuity),
    # so the guarantee is aggregate, not per-file: the mean covered
    # AREA collapses (here ≥ 6x; ideal 16 files = 16x), and at most
    # a quarter of the files are boundary-straddlers
    z_area = sum(ex * ey for ex, ey in z_env) / len(z_env)
    p_area = sum(ex * ey for ex, ey in p_env) / len(p_env)
    assert z_area * 6 <= p_area, (z_area, p_area, z_env)
    wide = [e for e in z_env if e[0] > 160 or e[1] > 160]
    assert len(wide) <= len(z_env) // 4, z_env


def test_zordered_read_prunes_row_groups_and_answers_match(spark, tmp_path):
    """Query-side witness: a 2-dim range predicate over the z-ordered
    table must SKIP most row groups on footer statistics alone, while
    the same predicate over the unsorted layout skips none — and the
    surviving groups still contain every matching row (Spark's answer
    over both layouts is identical)."""
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.layout import (
        write_zordered,
        zorder_pruning_stats,
    )

    grid = spark.range(100_000).select(
        (F.col("id") % 256).alias("x"),
        F.pmod(F.col("id") * 2654435761, F.lit(256)).alias("y"),
    )
    zpath, plain = tmp_path / "zq", tmp_path / "pq"
    write_zordered(
        grid, str(zpath), ["x", "y"], n_files=16, bits=8,
        bounds={"x": (0, 255), "y": (0, 255)},
    )
    grid.repartition(16).write.parquet(str(plain))

    ranges = {"x": (32, 63), "y": (96, 127)}  # a 1/64 query rectangle
    z = zorder_pruning_stats(str(zpath), ranges)
    p = zorder_pruning_stats(str(plain), ranges)
    assert z["total"] >= 16 and z["skipped"] >= 0.5 * z["total"], z
    assert p["skipped"] == 0, p  # unsorted: every group straddles

    pred = (
        (F.col("x").between(32, 63)) & (F.col("y").between(96, 127))
    )
    got_z = spark.read.parquet(str(zpath)).where(pred).count()
    got_p = spark.read.parquet(str(plain)).where(pred).count()
    want = grid.where(pred).count()
    assert got_z == got_p == want > 0


def test_hilbert_key_matches_reference_walk(spark):
    """The unrolled expression chain must equal the classic xy2d bit
    iteration cell-for-cell, and the resulting curve must be CONTINUOUS
    (consecutive keys are plane-adjacent — the property Morton lacks)."""
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.layout import (
        hilbert_key,
    )

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 4, 16
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    got = {
        (r.x, r.y): r.hkey
        for r in hilbert_key(
            grid, ["x", "y"], bits=bits,
            bounds={"x": (0, n - 1), "y": (0, n - 1)},
        ).collect()
    }
    want = {(x, y): xy2d(n, x, y) for x in range(n) for y in range(n)}
    assert got == want
    inv = {v: k for k, v in want.items()}
    assert all(
        abs(inv[d][0] - inv[d - 1][0]) + abs(inv[d][1] - inv[d - 1][1]) == 1
        for d in range(1, n * n)
    )


def test_hilbert_write_prunes_at_least_as_well_as_unsorted(spark, tmp_path):
    """The Hilbert clustered write must produce bounded per-file
    envelopes (like the Morton write) and a 2-dim range predicate must
    skip row groups on footer statistics with identical answers."""
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.layout import (
        write_hilbert,
        zorder_pruning_stats,
    )

    grid = spark.range(100_000).select(
        (F.col("id") % 256).alias("x"),
        F.pmod(F.col("id") * 2654435761, F.lit(256)).alias("y"),
    )
    hpath = tmp_path / "hq"
    write_hilbert(
        grid, str(hpath), ["x", "y"], n_files=16, bits=8,
        bounds={"x": (0, 255), "y": (0, 255)},
    )
    ranges = {"x": (32, 63), "y": (96, 127)}
    st = zorder_pruning_stats(str(hpath), ranges)
    assert st["total"] >= 16 and st["skipped"] >= 0.5 * st["total"], st
    pred = (F.col("x").between(32, 63)) & (F.col("y").between(96, 127))
    assert (
        spark.read.parquet(str(hpath)).where(pred).count()
        == grid.where(pred).count()
        > 0
    )


def test_hilbert_fails_loud_off_2d(spark):
    import pytest
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.layout import (
        hilbert_key,
    )

    grid = spark.range(10).select(
        F.col("id").alias("x"), F.col("id").alias("y"),
        F.col("id").alias("z"),
    )
    with pytest.raises(ValueError, match="2-D"):
        hilbert_key(grid, ["x", "y", "z"])
    with pytest.raises(ValueError, match="62"):
        hilbert_key(grid, ["x", "y"], bits=32)


def test_hilbert_key_wide_bits_no_overflow(spark):
    """bits=16 (the write_hilbert default) and bits=31 (the guard's
    max) exercise s*s up to 2^60: the step arithmetic must run in
    LongType — int32 math here raises ARITHMETIC_OVERFLOW under ANSI
    mode and silently corrupts keys without it. Checked cell-for-cell
    against the classic xy2d walk at sampled corner/edge points."""
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.layout import (
        hilbert_key,
    )

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    for bits in (16, 31):
        n = 1 << bits
        pts = [
            (0, 0), (n - 1, 0), (0, n - 1), (n - 1, n - 1),
            (n // 2, n // 2 - 1), (n // 3, 2 * n // 3), (1, n - 2),
        ]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {
            (r.x, r.y): r.hkey
            for r in hilbert_key(
                df, ["x", "y"], bits=bits,
                bounds={"x": (0, n - 1), "y": (0, n - 1)},
            ).collect()
        }
        want = {(x, y): xy2d(n, x, y) for x, y in pts}
        assert got == want, f"bits={bits}"
        assert max(got.values()) >= (1 << 32) - 1, f"bits={bits} keys stayed small"
