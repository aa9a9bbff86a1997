"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` in DuckDB: row count, column names, and an
order-insensitive multiset of stringified rows (columns sorted by name,
exact value equality — stricter than any reasonable hash).

Usage: python scripts/check_correctness.py [name ...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter
from decimal import Decimal
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope  # noqa: E402
from etl_prometheus2clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _arrow_type_names(schema):
    """Normalized per-column Arrow type names, keyed by column.

    The driver's value hash is type-sensitive at the Arrow layer, where
    e.g. DuckDB HUGEINT surfaces as decimal128(38,0) while Spark's
    BIGINT is int64 — both are plain ``int`` in Python, so the
    row-value multiset alone cannot catch that class of break.
    """
    import pyarrow as pa

    out = {}
    for field in schema:
        t = field.type
        if pa.types.is_large_string(t) or pa.types.is_string(t):
            name = "string"
        elif pa.types.is_large_binary(t) or pa.types.is_binary(t):
            name = "binary"
        elif pa.types.is_timestamp(t):
            name = "timestamp"
        elif pa.types.is_large_list(t) or pa.types.is_list(t):
            name = "list"
        else:
            name = str(t)
        out[field.name] = name
    return out


def _spark_arrow_types(sdf):
    from pyspark.sql.pandas.types import to_arrow_schema

    return _arrow_type_names(to_arrow_schema(sdf.schema))


def _norm(v):
    if isinstance(v, Decimal):
        # No normalize(): the driver's value hash sees scale/trailing-zero
        # differences (1.50 vs 1.5), so the local gate must too.
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if v is None:
        return "null"
    return f"{type(v).__name__}:{v}"


def _multiset(rows, cols_order):
    idx = sorted(range(len(cols_order)), key=lambda i: cols_order[i])
    return Counter(tuple(_norm(r[i]) for i in idx) for r in rows)


def main() -> int:
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark(app_name="check", master="local[8]", shuffle_partitions=8)

    # the driver sees queries()/oracle_sql(); locally also verify the
    # cross-checked variants so retired-from-window entries stay honest
    from etl_prometheus2clickhouse_spark.plans.catalog import (
        CROSS_CHECKED_ORACLES,
        CROSS_CHECKED_QUERIES,
    )

    qs = {**entry_mod.queries(), **CROSS_CHECKED_QUERIES}
    oracles = {**entry_mod.oracle_sql(), **CROSS_CHECKED_ORACLES}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            with cached_scope():
                sdf = fn(spark, SF_DIR)
                srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            if len(srows) == 0:
                print(f"      WARNING: rows-only entry returned 0 rows")
            continue
        try:
            cur = con.execute(oracles[name])
            otbl = cur.fetch_arrow_table()
            ocols = otbl.column_names
            orows = [tuple(r.values()) for r in otbl.to_pylist()]
            otypes = _arrow_type_names(otbl.schema)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            ok = False
        elif (stypes := _spark_arrow_types(sdf)) != otypes:
            diff = {
                c: (stypes[c], otypes[c])
                for c in stypes
                if stypes[c] != otypes[c]
            }
            print(f"FAIL  {name}: arrow type mismatch (spark, oracle): {diff}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        else:
            sm = _multiset([tuple(r) for r in srows], scols)
            om = _multiset(orows, ocols)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                print(f"FAIL  {name}: value mismatch")
                for d in diff_s:
                    print(f"      spark-only: {d}")
                for d in diff_o:
                    print(f"      oracle-only: {d}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
