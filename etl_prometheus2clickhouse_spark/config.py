"""Environment-variable configuration.

Mirrors the reference's config surface (reference: config.py:19-192): same
variable names, defaults and validation bounds, implemented with stdlib
dataclasses (pydantic is not available in this runtime). Business state
(watermark timestamps) is NOT config — it lives in the state store.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_str(name: str, default: str | None = None) -> str | None:
    """Read an env var; empty string counts as unset (reference
    ``env_ignore_empty=True``, config.py:30)."""
    val = os.environ.get(name)
    if val is None or val == "":
        return default
    return val


def _env_int(name: str, default: int) -> int:
    val = _env_str(name)
    if val is None:
        return default
    try:
        return int(val)
    except ValueError as exc:
        raise ValueError(f"{name} must be an integer, got {val!r}") from exc


def _env_bool(name: str, default: bool = False) -> bool:
    val = _env_str(name)
    if val is None:
        return default
    return val.strip().lower() in {"1", "true", "yes", "on"}


@dataclass
class PrometheusConfig:
    """Prometheus/Mimir connection settings (reference config.py:19-76)."""

    url: str
    user: str | None = None
    password: str | None = None
    insecure: bool = False
    timeout: int = 10
    query_step_seconds: int = 15
    # Spark-native extension: how many sub-window partitions the custom
    # DataSource splits a batch window into (1 = reference-parity single
    # request; >1 = partitioned parallel fetch).
    fetch_partitions: int = 1

    def __post_init__(self) -> None:
        # Reference normalizes password: user set + password unset → ""
        # (HTTP basic auth needs an explicit empty password;
        # config.py:58-76).
        if self.user is not None and self.password is None:
            self.password = ""

    @classmethod
    def from_env(cls) -> PrometheusConfig:
        url = _env_str("PROMETHEUS_URL")
        if url is None:
            raise ValueError("PROMETHEUS_URL is required")
        return cls(
            url=url,
            user=_env_str("PROMETHEUS_USER"),
            password=_env_str("PROMETHEUS_PASSWORD"),
            insecure=_env_bool("PROMETHEUS_INSECURE"),
            timeout=_env_int("PROMETHEUS_TIMEOUT", 10),
            query_step_seconds=_env_int("PROMETHEUS_QUERY_STEP_SECONDS", 15),
            fetch_partitions=_env_int("PROMETHEUS_FETCH_PARTITIONS", 1),
        )


@dataclass
class ClickHouseConfig:
    """ClickHouse HTTP connection settings (reference config.py:79-141)."""

    url: str
    user: str | None = None
    password: str | None = None
    connect_timeout: int = 10
    send_receive_timeout: int = 300
    insecure: bool = False
    table_metrics: str = "default.metrics"
    table_etl: str = "default.etl"

    def __post_init__(self) -> None:
        if self.user is not None and self.password is None:
            self.password = ""

    @classmethod
    def from_env(cls) -> ClickHouseConfig:
        url = _env_str("CLICKHOUSE_URL")
        if url is None:
            raise ValueError("CLICKHOUSE_URL is required")
        return cls(
            url=url,
            user=_env_str("CLICKHOUSE_USER"),
            password=_env_str("CLICKHOUSE_PASSWORD"),
            connect_timeout=_env_int("CLICKHOUSE_CONNECT_TIMEOUT", 10),
            send_receive_timeout=_env_int("CLICKHOUSE_SEND_RECEIVE_TIMEOUT", 300),
            insecure=_env_bool("CLICKHOUSE_INSECURE"),
            table_metrics=_env_str("CLICKHOUSE_TABLE_METRICS", "default.metrics"),
            table_etl=_env_str("CLICKHOUSE_TABLE_ETL", "default.etl"),
        )


@dataclass
class EtlConfig:
    """ETL windowing behavior (reference config.py:144-192).

    Bounds enforced identically: window size > 0, overlap >= 0,
    min_window_start >= 0 (reference tests:
    tests/test_config.py:147-227).
    """

    batch_window_size_seconds: int = 300
    batch_window_overlap_seconds: int = 0
    log_level: str = "INFO"
    temp_dir: str = "/tmp"  # nosec B108 — same default as reference
    min_window_start_timestamp: int = 0

    def __post_init__(self) -> None:
        if self.batch_window_size_seconds <= 0:
            raise ValueError("BATCH_WINDOW_SIZE_SECONDS must be > 0")
        if self.batch_window_overlap_seconds < 0:
            raise ValueError("BATCH_WINDOW_OVERLAP_SECONDS must be >= 0")
        if self.min_window_start_timestamp < 0:
            raise ValueError("MIN_WINDOW_START_TIMESTAMP must be >= 0")

    @classmethod
    def from_env(cls) -> EtlConfig:
        return cls(
            batch_window_size_seconds=_env_int("BATCH_WINDOW_SIZE_SECONDS", 300),
            batch_window_overlap_seconds=_env_int("BATCH_WINDOW_OVERLAP_SECONDS", 0),
            log_level=_env_str("LOG_LEVEL", "INFO") or "INFO",
            temp_dir=_env_str("TEMP_DIR", "/tmp") or "/tmp",  # nosec B108
            min_window_start_timestamp=_env_int("MIN_WINDOW_START_TIMESTAMP", 0),
        )


@dataclass
class Config:
    """Top-level configuration (reference config.py:195-200)."""

    prometheus: PrometheusConfig
    clickhouse: ClickHouseConfig
    etl: EtlConfig = field(default_factory=EtlConfig)


def load_config() -> Config:
    """Load and validate all configuration from the environment
    (reference config.py:203-243)."""
    return Config(
        prometheus=PrometheusConfig.from_env(),
        clickhouse=ClickHouseConfig.from_env(),
        etl=EtlConfig.from_env(),
    )
