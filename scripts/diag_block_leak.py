#!/usr/bin/env python
"""Diagnose persistent-RDD block accumulation across scoped queries.

Runs the named entries sequentially in ONE JVM (bench.py's exact
scoping) and prints, after each entry: the number of persistent RDDs
the JVM still holds, their total memory/disk bytes, and the entry's
wall seconds. A monotonically growing RDD count after scope exit means
localCheckpoint blocks outlive cached_scope — storage pressure that
probes (fresh JVMs) never see but a 150-entry suite accumulates.

Usage: python scripts/diag_block_leak.py <entry> [<entry>...] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_prometheus2clickhouse_spark.operators.dedup import (  # noqa: E402
    cached_scope,
)
from etl_prometheus2clickhouse_spark.plans.catalog import (  # noqa: E402
    ALL_QUERIES as QUERIES,
)
from etl_prometheus2clickhouse_spark.session import get_spark  # noqa: E402


def _storage(spark) -> tuple[int, int, int]:
    jsc = spark.sparkContext._jsc
    m = jsc.getPersistentRDDs()
    n = m.size()
    mem = disk = 0
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    for i in infos:
        mem += i.memSize()
        disk += i.diskSize()
    return n, mem, disk


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="diag-block-leak",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    QUERIES["prom_parse"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for rep in range(reps):
        for name in args:
            with cached_scope():
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            dt = time.perf_counter() - t0
            n, mem, disk = _storage(spark)
            print(
                f"rep{rep} {name}: {dt:.2f}s | persistent RDDs after "
                f"scope exit: {n}, mem {mem/1e6:.1f} MB, "
                f"disk {disk/1e6:.1f} MB",
                flush=True,
            )


if __name__ == "__main__":
    main()
