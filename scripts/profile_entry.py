#!/usr/bin/env python
"""Profile ONE catalog entry empirically (guide §1): run it in a fresh
JVM with the Spark event log enabled, then summarize per-job/per-stage
wall time, task time, shuffle read/write bytes, input bytes and spill
from the event log — the measurement the optimization round starts
from (the UI is disabled in this sandbox; the event log carries the
same task metrics).

Usage:
    python scripts/profile_entry.py <entry> [<entry>...]
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... apply as in bench.py

Prints, per entry: total wall seconds (same scoping as bench.py), then
the top stages by task time with their metrics, and the physical-plan
node histogram of the final frame (Exchange count, join strategies,
Python eval nodes).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_prometheus2clickhouse_spark.operators.dedup import (  # noqa: E402
    cached_scope,
)
from etl_prometheus2clickhouse_spark.plans.catalog import (  # noqa: E402
    ALL_QUERIES as QUERIES,
)
from etl_prometheus2clickhouse_spark.session import get_spark  # noqa: E402


def _summarize_eventlog(log_dir: str, t_start_ms: float) -> None:
    """Aggregate stage metrics from the newest event log file."""
    files = sorted(
        (f for f in Path(log_dir).rglob("*") if f.is_file()
         and "appstatus" not in f.name),
        key=lambda f: f.stat().st_mtime,
    )
    if not files:
        print("  (no event log found)")
        return
    raw = files[-1].read_bytes()
    stages = {}
    jobs = {}
    for line in raw.decode("utf-8", "replace").splitlines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            if si.get("Submission Time", 0) < t_start_ms:
                continue
            acc = {a["Name"]: a.get("Value", 0) for a in si.get(
                "Accumulables", [])}
            stages[sid] = {
                "name": si.get("Stage Name", "")[:70],
                "tasks": si.get("Number of Tasks", 0),
                "wall_s": (si.get("Completion Time", 0)
                           - si.get("Submission Time", 0)) / 1e3,
                "task_s": acc.get("internal.metrics.executorRunTime", 0)
                / 1e3,
                "cpu_s": acc.get("internal.metrics.executorCpuTime", 0)
                / 1e9,
                "sh_read_mb": (
                    acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                    + acc.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0
                    )
                ) / 1e6,
                "sh_write_mb": acc.get(
                    "internal.metrics.shuffle.write.bytesWritten", 0
                ) / 1e6,
                "input_mb": acc.get(
                    "internal.metrics.input.bytesRead", 0) / 1e6,
                "spill_mb": acc.get(
                    "internal.metrics.diskBytesSpilled", 0) / 1e6,
            }
        elif k == "SparkListenerJobStart":
            jid = ev["Job ID"]
            if ev.get("Submission Time", 0) < t_start_ms:
                continue
            jobs[jid] = {
                "t0": ev.get("Submission Time", 0),
                "desc": (ev.get("Properties", {}) or {}).get(
                    "spark.job.description", ""
                )[:60],
            }
        elif k == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["wall_s"] = (
                    ev.get("Completion Time", 0) - jobs[jid]["t0"]
                ) / 1e3
    n_jobs = len(jobs)
    job_wall = sum(j.get("wall_s", 0) for j in jobs.values())
    print(f"  jobs: {n_jobs}, summed job wall: {job_wall:.2f}s")
    top = sorted(stages.items(), key=lambda kv: -kv[1]["task_s"])[:14]
    print(
        "  stage  wall_s  task_s   cpu_s  tasks  in_MB  shR_MB shW_MB"
        " spill  name"
    )
    for sid, s in top:
        print(
            f"  {sid:>5} {s['wall_s']:7.2f} {s['task_s']:7.2f}"
            f" {s['cpu_s']:7.2f} {s['tasks']:6d} {s['input_mb']:6.1f}"
            f" {s['sh_read_mb']:7.1f} {s['sh_write_mb']:6.1f}"
            f" {s['spill_mb']:5.1f}  {s['name']}"
        )
    # tiny-stage overhead: stages whose task time is < 50 ms
    tiny = [s for s in stages.values() if s["task_s"] < 0.05]
    print(
        f"  stages: {len(stages)} total, {len(tiny)} with <50ms task"
        " time (fixed-overhead candidates)"
    )


def _plan_histogram(df) -> None:
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        try:
            plan = df._jdf.queryExecution().toString()
        except Exception:
            return
    counts: dict[str, int] = defaultdict(int)
    for line in plan.splitlines():
        t = line.strip().lstrip("+-*: ()0123456789")
        for key in (
            "Exchange", "BroadcastHashJoin", "SortMergeJoin",
            "ShuffledHashJoin", "BroadcastNestedLoopJoin",
            "CartesianProduct", "ArrowEvalPython", "BatchEvalPython",
            "MapInPandas", "PythonMapInArrow", "HashAggregate",
            "SortAggregate", "ObjectHashAggregate", "Window",
            "Sort ", "FileScan", "InMemoryTableScan",
        ):
            if t.startswith(key.strip()):
                counts[key.strip()] += 1
    print("  final-frame plan nodes:", dict(counts))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_entry.py <entry> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    log_dir = "/tmp/spark-events-profile"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        app_name="profile-entry",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # warm exactly as bench.py does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    QUERIES["prom_parse"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    if any(n.startswith("stream") for n in names):
        warm_dir = os.path.join(
            os.path.dirname(sf_dir.rstrip("/")), "sf0.001"
        )
        if not os.path.isdir(warm_dir):
            warm_dir = sf_dir
        QUERIES["stream_rate"](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t_start_ms = time.time() * 1000
        with cached_scope():
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
        print(
            f"\n=== {name}: total {t_total:.2f}s"
            f" (build {t_build:.2f}s, write {t_total - t_build:.2f}s)"
        )
        _plan_histogram(df)
        spark.sparkContext.setJobDescription(None)
    # the event log cannot be split per entry, so the summary covers
    # the LAST entry only (t_start_ms filters to it) — pass the same
    # entry twice to profile its warm run with the lifecycle-scratch
    # build already cached
    spark.stop()
    print(f"\n--- event-log stage summary for {names[-1]} ---")
    _summarize_eventlog(log_dir, t_start_ms)


if __name__ == "__main__":
    main()
