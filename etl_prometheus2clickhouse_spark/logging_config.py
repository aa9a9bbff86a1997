"""Structured ECS-JSON logging (reference logging_config.py).

Same observable contract as the reference, with stdlib only (the
``ecs_logging`` package is not available in this runtime):

- every record is one JSON line shaped per Elastic Common Schema:
  ``@timestamp`` (UTC, ISO-8601, millisecond precision, ``Z`` suffix),
  ``log.level``, ``log.logger``, ``message``, ``ecs.version``, plus any
  ``extra`` fields dotted into nested objects;
- DEBUG/INFO/WARNING go to stdout, ERROR and above to stderr
  (reference tests/test_logging_config.py pins the split);
- idempotent configuration: repeated ``get_logger`` calls never stack
  handlers.
"""

from __future__ import annotations

import json
import logging
import sys
from datetime import datetime, timezone

ECS_VERSION = "8.11"

_STD_ATTRS = frozenset(
    logging.LogRecord("", 0, "", 0, "", (), None).__dict__
) | {"message", "asctime", "taskName"}


def _nest(flat: dict) -> dict:
    """``{"a.b": 1}`` → ``{"a": {"b": 1}}`` (ECS dotted-field shape)."""
    out: dict = {}
    for key, value in flat.items():
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):  # scalar/dict conflict: flatten
                node = out
                parts = [key]
                break
        node[parts[-1]] = value
    return out


class EcsJsonFormatter(logging.Formatter):
    """One ECS-JSON object per line, UTC timestamps."""

    def format(self, record: logging.LogRecord) -> str:
        ts = datetime.fromtimestamp(record.created, tz=timezone.utc)
        doc = {
            "@timestamp": ts.isoformat(timespec="milliseconds").replace(
                "+00:00", "Z"
            ),
            "log": {"level": record.levelname.lower(), "logger": record.name},
            "message": record.getMessage(),
            "ecs": {"version": ECS_VERSION},
        }
        extras = {
            k: v for k, v in record.__dict__.items() if k not in _STD_ATTRS
        }
        if extras:
            for key, sub in _nest(extras).items():
                if key in doc and isinstance(doc[key], dict) and isinstance(sub, dict):
                    doc[key].update(sub)
                else:
                    doc[key] = sub
        if record.exc_info and record.exc_info[1] is not None:
            exc = record.exc_info[1]
            doc["error"] = {
                "type": type(exc).__name__,
                "message": str(exc),
                "stack_trace": self.formatException(record.exc_info),
            }
        return json.dumps(doc, default=str)


def _below_error(record: logging.LogRecord) -> bool:
    return record.levelno < logging.ERROR


class _DynamicStreamHandler(logging.StreamHandler):
    """StreamHandler that resolves ``sys.stdout``/``sys.stderr`` at emit
    time, so stream redirection (pytest capture, supervisors swapping
    fds) is always honored."""

    def __init__(self, stream_name: str) -> None:
        super().__init__()
        self._stream_name = stream_name

    @property
    def stream(self):  # noqa: D102
        return getattr(sys, self._stream_name)

    @stream.setter
    def stream(self, value):  # base __init__/setStream assign; ignore
        pass


def get_logger(name: str, level: str | int = "INFO") -> logging.Logger:
    """Configured ECS logger: non-errors → stdout, errors → stderr."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        formatter = EcsJsonFormatter()
        out = _DynamicStreamHandler("stdout")
        out.setLevel(logging.DEBUG)
        out.addFilter(_below_error)
        out.setFormatter(formatter)
        err = _DynamicStreamHandler("stderr")
        err.setLevel(logging.ERROR)
        err.setFormatter(formatter)
        logger.addHandler(out)
        logger.addHandler(err)
        logger.propagate = False
    logger.setLevel(
        getattr(logging, level.upper(), logging.INFO)
        if isinstance(level, str)
        else int(level)
    )
    return logger


def set_all_loggers_level(level: str | int) -> None:
    """Re-level every logger this module configured (reference
    set_all_loggers_level)."""
    resolved = (
        getattr(logging, level.upper(), logging.INFO)
        if isinstance(level, str)
        else int(level)
    )
    for logger in logging.Logger.manager.loggerDict.values():
        if isinstance(logger, logging.Logger) and any(
            isinstance(h.formatter, EcsJsonFormatter) for h in logger.handlers
        ):
            logger.setLevel(resolved)
