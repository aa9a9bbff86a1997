"""Oracle checks for the CROSS_CHECKED catalog variants.

These entries were retired from the driver-facing ``QUERIES`` registry
(they duplicate a primary entry's oracle — bucketed/direction twins,
the Arrow scorer twin, the per-kind multimodal faces folded into
``multimodal_meta``) so the driver's fixed verification window covers
every *distinct* operator. Retirement must not mean unverified: this
module runs each variant against its oracle in DuckDB at sf0.001,
the same three-way compare (schema, rowcount, value multiset) the
driver applies to primary entries.
"""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

import duckdb
import pytest

from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope
from etl_prometheus2clickhouse_spark.plans.catalog import (
    CROSS_CHECKED_ORACLES,
    CROSS_CHECKED_QUERIES,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if v is None:
        return "null"
    return f"{type(v).__name__}:{v}"


def _multiset(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in idx) for r in rows)


def test_registries_align():
    assert set(CROSS_CHECKED_QUERIES) == set(CROSS_CHECKED_ORACLES)


@pytest.mark.parametrize("name", sorted(CROSS_CHECKED_QUERIES))
def test_cross_checked_matches_oracle(spark, sf_dir, duck, name):
    with cached_scope():
        sdf = CROSS_CHECKED_QUERIES[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(CROSS_CHECKED_ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), f"{len(srows)} vs {len(orows)}"
    assert len(srows) > 0, "vacuous oracle row"
    assert _multiset(srows, sdf.columns) == _multiset(orows, ocols)
