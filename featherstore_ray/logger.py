"""Structured logging — parity for the reference's zap wrapper
(pkg/logger/logger.go:1-111: level + json/console format + stdout/stderr/
file output, one lazily-initialised global instance).

Built on stdlib ``logging`` with a JSON or console formatter; operational
counters stay in :mod:`featherstore_ray.metrics` (this module is the
human/debug channel, never a transform-path dependency). Configuration
mirrors the reference's LoggingConfig fields and reads the same
environment-override convention as :class:`EngineConfig`:
``FSR_LOG_LEVEL`` / ``FSR_LOG_FORMAT`` (json|console) /
``FSR_LOG_OUTPUT`` (stdout|stderr|path).
"""

from __future__ import annotations

import json
import logging
import os
import sys
from datetime import datetime, timezone
from typing import Any

_LOGGER_NAME = "featherstore_ray"
_global: logging.Logger | None = None


class JSONFormatter(logging.Formatter):
    """One JSON object per line: timestamp (ISO-8601), level, logger, msg,
    caller, plus any ``extra={"fields": {...}}`` structured fields."""

    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "timestamp": datetime.fromtimestamp(
                record.created, timezone.utc).isoformat(),
            "level": record.levelname.lower(),
            "logger": record.name,
            "msg": record.getMessage(),
            "caller": f"{record.module}:{record.lineno}",
        }
        fields = getattr(record, "fields", None)
        if fields:
            out.update(fields)
        if record.exc_info:
            out["exc_info"] = self.formatException(record.exc_info)
        return json.dumps(out, default=str)


def initialize(
    level: str = "info",
    format: str = "json",
    output: str = "stderr",
) -> logging.Logger:
    """(Re)configure and return the global engine logger.

    ``level``: debug|info|warning|error; ``format``: json|console;
    ``output``: stdout|stderr|<file path> (append). Reference precedence:
    explicit args already include any ``FSR_LOG_*`` env overrides when
    called through :func:`get_logger`.
    """
    global _global
    lvl = getattr(logging, level.upper(), None)
    if not isinstance(lvl, int):
        raise ValueError(f"invalid logging level {level!r}")
    if output == "stdout":
        handler: logging.Handler = logging.StreamHandler(sys.stdout)
    elif output == "stderr":
        handler = logging.StreamHandler(sys.stderr)
    else:
        handler = logging.FileHandler(output, mode="a")
    if format == "json":
        handler.setFormatter(JSONFormatter())
    elif format == "console":
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)-7s %(name)s %(message)s"))
    else:
        raise ValueError(f"invalid logging format {format!r}")
    lg = logging.getLogger(_LOGGER_NAME)
    lg.handlers.clear()
    lg.addHandler(handler)
    lg.setLevel(lvl)
    lg.propagate = False
    _global = lg
    return lg


def get_logger() -> logging.Logger:
    """The lazily-initialised global logger (reference GetLogger,
    logger.go:74-84): first call configures from ``FSR_LOG_*`` env (or
    defaults info/json/stderr)."""
    global _global
    if _global is None:
        initialize(
            level=os.environ.get("FSR_LOG_LEVEL", "info"),
            format=os.environ.get("FSR_LOG_FORMAT", "json"),
            output=os.environ.get("FSR_LOG_OUTPUT", "stderr"),
        )
    return _global


def log(level: str, msg: str, **fields: Any) -> None:
    """Structured convenience: ``log("info", "ingested", rows=5)``."""
    get_logger().log(
        getattr(logging, level.upper()), msg, extra={"fields": fields})
