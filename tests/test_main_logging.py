"""CLI entry point exit codes and ECS-JSON logging shape
(main.py, logging_config.py; reference contracts main.py:41-86,
logging_config.py, pinned by its tests/test_main.py and
tests/test_logging_config.py)."""

from __future__ import annotations

import json
import logging

import pytest

from etl_prometheus2clickhouse_spark.logging_config import (
    EcsJsonFormatter,
    get_logger,
)
from etl_prometheus2clickhouse_spark.streaming.job import RunResult


def _ecs_line(capsys_out: str) -> dict:
    lines = [ln for ln in capsys_out.strip().splitlines() if ln]
    return json.loads(lines[-1])


def test_ecs_shape_and_stdout_stderr_split(capsys):
    logger = get_logger("ecs-split-test", "DEBUG")
    logger.info("hello", extra={"etl.rows": 5, "etl.window.start": 7})
    logger.error("boom")
    cap = capsys.readouterr()
    info = _ecs_line(cap.out)
    err = _ecs_line(cap.err)
    # info goes ONLY to stdout, error ONLY to stderr
    assert "hello" not in cap.err and "boom" not in cap.out
    assert info["message"] == "hello"
    assert info["log"]["level"] == "info"
    assert info["log"]["logger"] == "ecs-split-test"
    assert info["ecs"]["version"]
    # UTC ISO-8601 millisecond timestamp with Z suffix
    assert info["@timestamp"].endswith("Z") and "T" in info["@timestamp"]
    # dotted extras nest into ECS objects
    assert info["etl"]["rows"] == 5 and info["etl"]["window"]["start"] == 7
    assert err["log"]["level"] == "error" and err["message"] == "boom"


def test_ecs_exception_fields():
    formatter = EcsJsonFormatter()
    try:
        raise ValueError("bad input")
    except ValueError:
        import sys

        record = logging.LogRecord(
            "x", logging.ERROR, __file__, 1, "failed", (), sys.exc_info()
        )
    doc = json.loads(formatter.format(record))
    assert doc["error"]["type"] == "ValueError"
    assert doc["error"]["message"] == "bad input"
    assert "Traceback" in doc["error"]["stack_trace"]


def test_get_logger_idempotent():
    a = get_logger("idem-test")
    b = get_logger("idem-test")
    assert a is b and len(a.handlers) == 2


def test_main_exits_1_on_missing_config(monkeypatch, capsys):
    from etl_prometheus2clickhouse_spark import main as main_mod

    monkeypatch.delenv("PROMETHEUS_URL", raising=False)
    monkeypatch.delenv("CLICKHOUSE_URL", raising=False)
    with pytest.raises(SystemExit) as exc:
        main_mod.main([])
    assert exc.value.code == 1
    err = _ecs_line(capsys.readouterr().err)
    assert err["log"]["level"] == "error"
    assert "PROMETHEUS_URL" in err["main"]["application_error"]["error"]
    assert err["main"]["application_error"]["error_type"] == "ValueError"


def test_main_exit_0_on_success(monkeypatch, capsys):
    from etl_prometheus2clickhouse_spark import main as main_mod
    from etl_prometheus2clickhouse_spark.streaming import job as job_mod

    monkeypatch.setenv("PROMETHEUS_URL", "http://prom.invalid:9090")
    monkeypatch.setenv("CLICKHOUSE_URL", "http://ch.invalid:8123")

    def fake_run_once(self):
        return RunResult(
            window_start=100, window_end=400, rows_count=3, skipped_count=1,
            series_count=2, new_progress=400, timestamp_end=401,
        )

    monkeypatch.setattr(job_mod.EtlBatchJob, "run_once", fake_run_once)
    main_mod.main([])  # no SystemExit → exit code 0 path
    out_lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    done = [d for d in out_lines if d["message"] == "ETL window complete"]
    assert done and done[0]["etl"]["rows"] == 3
    assert done[0]["etl"]["progress"] == 400


def test_main_exit_1_on_job_error(monkeypatch, capsys):
    from etl_prometheus2clickhouse_spark import main as main_mod
    from etl_prometheus2clickhouse_spark.streaming import job as job_mod

    monkeypatch.setenv("PROMETHEUS_URL", "http://prom.invalid:9090")
    monkeypatch.setenv("CLICKHOUSE_URL", "http://ch.invalid:8123")

    def fake_run_once(self):
        raise RuntimeError("lease unavailable")

    monkeypatch.setattr(job_mod.EtlBatchJob, "run_once", fake_run_once)
    with pytest.raises(SystemExit) as exc:
        main_mod.main([])
    assert exc.value.code == 1
    err = _ecs_line(capsys.readouterr().err)
    assert "lease unavailable" in err["message"]
