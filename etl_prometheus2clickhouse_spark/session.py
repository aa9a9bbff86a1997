"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[32], one JVM);
the same settings are scale-appropriate on a real cluster: AQE for runtime
re-planning and skew joins, UTC session timezone (the reference converts
everything via UTC — clickhouse_client.py:96-129), Arrow for the Pandas-UDF
slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_prometheus2clickhouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the core count — at cluster scale this is
    instead sized so each shuffle partition holds ~128-256 MB.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)

    # Executor Python workers must be able to import this package (the
    # wire-parity sink uses a pandas_udf) regardless of the driver's cwd:
    # propagate the repo root via PYTHONPATH before the JVM starts.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's byte-based coalescing folds CPU-dense post-shuffle
        # stages over small byte footprints (JSON parse, tokenize,
        # sketch build, per-round graph carries) down to 1-2 tasks —
        # measured 1.3-3.1 s serial stages at bench SF with 31 cores
        # idle. Lowering the coalesce floor restores parallelism for
        # exactly those stages; at scale the target is
        # max(stage_bytes / parallelism, floor), so once a stage
        # carries real data the floor is inert and partitions size by
        # bytes as before. Parameterized for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # TIMESTAMP(NANOS) parquet (e.g. the driver's events table) reads
        # as BIGINT nanoseconds instead of erroring; set once here so
        # query builders never mutate session state (order-independence)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # task-side output commit (v2): dynamic-partition writes commit
        # each task's files directly instead of a driver-side rename
        # pass over every partition directory — measured ~25% off the
        # fixed cost of the index increments' 64-dir writes. Safe here:
        # every multi-writer surface in this engine gates visibility
        # behind its own commit point (versioned _manifest JSON, staged
        # .commit-* renames), so a crashed job's partial files are
        # never readable as live data
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
