"""Structured logging factory — R-parity with the reference's logger.

The reference builds a zap logger (internal/logging/logger.go:8-16):
``debug=true`` → development config (human-readable, debug level),
otherwise production config with JSON encoding. This is the stdlib
mirror: one factory, two configs, JSON lines in production so log
shippers parse without regexes.

Driver-side only, like every operational surface here — executor logs
belong to Spark's log4j config; this logger narrates the pipeline's
driver decisions (stream starts, checkpoint commits, publish retries)
in the same shape the reference process logs its own.
"""

from __future__ import annotations

import json
import logging
import sys
import time


class JsonFormatter(logging.Formatter):
    """zap-production-style JSON lines: ts (epoch seconds), level,
    logger, msg, caller, plus any structured extras passed via the
    ``extra={...}`` kwarg."""

    _STD = frozenset(
        logging.LogRecord(
            "", 0, "", 0, "", (), None
        ).__dict__
    ) | {"message", "asctime"}

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "ts": round(record.created, 6),
            "level": record.levelname.lower(),
            "logger": record.name,
            "msg": record.getMessage(),
            "caller": f"{record.module}.py:{record.lineno}",
        }
        if record.exc_info:
            out["stacktrace"] = self.formatException(record.exc_info)
        for k, v in record.__dict__.items():
            if k not in self._STD and not k.startswith("_"):
                out[k] = v
        return json.dumps(out, separators=(",", ":"), default=str)


def new_logger(name: str = "better_cdc_spark", debug: bool = False) -> logging.Logger:
    """Build the engine logger (logger.go New() parity): debug=True →
    development config (human-readable, DEBUG level); otherwise
    production config (JSON encoding, INFO level). Idempotent: calling
    again reconfigures the same named logger rather than stacking
    handlers."""
    logger = logging.getLogger(name)
    for h in list(logger.handlers):
        logger.removeHandler(h)
    handler = logging.StreamHandler(sys.stderr)
    if debug:
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s\t%(levelname)s\t%(name)s\t%(message)s"
            )
        )
        logger.setLevel(logging.DEBUG)
    else:
        handler.setFormatter(JsonFormatter())
        logger.setLevel(logging.INFO)
    logger.addHandler(handler)
    logger.propagate = False
    return logger
