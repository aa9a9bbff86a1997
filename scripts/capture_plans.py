#!/usr/bin/env python
"""Capture ``explain("formatted")`` for catalog entries into
``plans/$SPARK_GRAFT_PLANS_DIR/<name>_<tag>.txt`` (default r17 —
the optimization round's plan
evidence; guide §1 / §7.2).

Usage:
    python scripts/capture_plans.py <tag> [entry ...]

With no entries listed, captures every bench entry. NOTE: building a
frame for driver-iterative faces (streaming, lifecycle) executes their
work; their final frame is a driver-local result and the interesting
plans are internal — the capture still records the face's shape for
the judge.
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_prometheus2clickhouse_spark.operators.dedup import (  # noqa: E402
    cached_scope,
)
from etl_prometheus2clickhouse_spark.plans.catalog import (  # noqa: E402
    ALL_QUERIES as QUERIES,
)
from etl_prometheus2clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: capture_plans.py <tag> [entry ...]")
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import BENCH_QUERIES  # noqa: E402

        names = list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", "r17"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        app_name="capture-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    for name in names:
        try:
            with cached_scope():
                df = QUERIES[name](spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
            (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"captured {name}")
        except Exception:
            print(f"FAILED {name}")
            traceback.print_exc()


if __name__ == "__main__":
    main()
