"""Application entry point (reference main.py:41-86).

``python -m etl_prometheus2clickhouse_spark.main`` runs one windowed
batch cycle (reference parity: one process run = one window) or, with
``--mode streaming``, a continuous Structured Streaming ingestion.

Exit codes: 0 success, 1 any error (logged as ECS JSON to stderr first
— the reference's monitoring-integration contract).
"""

from __future__ import annotations

import argparse
import sys

from etl_prometheus2clickhouse_spark import __version__
from etl_prometheus2clickhouse_spark.config import Config, load_config
from etl_prometheus2clickhouse_spark.logging_config import (
    get_logger,
    set_all_loggers_level,
)

logger = get_logger(__name__)


def _build(config: Config):
    """Wire config → session, state store, sink, fetch fn."""
    from etl_prometheus2clickhouse_spark.session import get_spark
    from etl_prometheus2clickhouse_spark.sinks.clickhouse_sink import (
        ClickHouseHttpSink,
    )
    from etl_prometheus2clickhouse_spark.sources.prometheus import make_fetch_fn
    from etl_prometheus2clickhouse_spark.sources.state_store import (
        ClickHouseStateStore,
    )

    spark = get_spark(app_name="etl-prometheus2clickhouse-spark")
    state = ClickHouseStateStore(
        url=config.clickhouse.url,
        table=config.clickhouse.table_etl,
        user=config.clickhouse.user,
        password=config.clickhouse.password,
        timeout=config.clickhouse.connect_timeout,
        insecure=config.clickhouse.insecure,
    )
    sink = ClickHouseHttpSink(
        url=config.clickhouse.url,
        table=config.clickhouse.table_metrics,
        user=config.clickhouse.user,
        password=config.clickhouse.password,
        send_receive_timeout=config.clickhouse.send_receive_timeout,
        insecure=config.clickhouse.insecure,
    )
    fetch = make_fetch_fn(
        url=config.prometheus.url,
        partitions=config.prometheus.fetch_partitions,
        user=config.prometheus.user,
        password=config.prometheus.password,
        insecure=config.prometheus.insecure,
        timeout=config.prometheus.timeout,
    )
    return spark, state, sink, fetch


def _run_batch(config: Config) -> None:
    from etl_prometheus2clickhouse_spark.streaming.job import EtlBatchJob

    spark, state, sink, fetch = _build(config)
    job = EtlBatchJob(
        spark,
        state=state,
        fetch=fetch,
        sink=sink,
        window_size_seconds=config.etl.batch_window_size_seconds,
        overlap_seconds=config.etl.batch_window_overlap_seconds,
        min_window_start=config.etl.min_window_start_timestamp,
        query_step_seconds=config.prometheus.query_step_seconds,
    )
    result = job.run_once()
    logger.info(
        "ETL window complete",
        extra={
            "etl.window.start": result.window_start,
            "etl.window.end": result.window_end,
            "etl.rows": result.rows_count,
            "etl.skipped": result.skipped_count,
            "etl.series": result.series_count,
            "etl.progress": result.new_progress,
        },
    )


def _run_streaming(config: Config, checkpoint_dir: str) -> None:
    from etl_prometheus2clickhouse_spark.streaming.stream_job import (
        EtlStreamingJob,
    )

    spark, state, sink, _ = _build(config)
    st = state.get_state()
    if st is None or st.timestamp_progress is None:
        raise ValueError(
            "timestamp_progress not found in state store; bootstrap it "
            "explicitly before the first run"
        )
    job = EtlStreamingJob(
        spark,
        url=config.prometheus.url,
        sink=sink,
        state=state,
        checkpoint_dir=checkpoint_dir,
        initial_progress=st.timestamp_progress,
        window_size_seconds=config.etl.batch_window_size_seconds,
        query_step_seconds=config.prometheus.query_step_seconds,
        partitions=config.prometheus.fetch_partitions,
    )
    query = job.start()
    logger.info("Streaming ingestion started", extra={"etl.mode": "streaming"})
    query.awaitTermination()


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="etl-prometheus2clickhouse-spark")
    parser.add_argument(
        "--mode", choices=["batch", "streaming"], default="batch"
    )
    parser.add_argument(
        "--checkpoint-dir", default="/tmp/etl_p2c_spark_checkpoint"  # nosec B108
    )
    args = parser.parse_args(argv)

    try:
        logger.info(
            f"Starting etl-prometheus2clickhouse-spark {__version__}"
        )
        config = load_config()
        set_all_loggers_level(config.etl.log_level)
        if args.mode == "batch":
            _run_batch(config)
        else:
            _run_streaming(config, args.checkpoint_dir)
    except Exception as exc:  # noqa: BLE001 — reference main.py:70-82
        logger.error(
            f"Application error occurred: {type(exc).__name__}: {exc}",
            extra={
                "main.application_error.error": str(exc),
                "main.application_error.error_type": type(exc).__name__,
                # third key of the reference's monitoring contract
                # (reference main.py:73-81)
                "main.application_error.message": (
                    f"Unexpected error occurred: {exc}"
                ),
            },
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
