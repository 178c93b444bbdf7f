"""Structured logging factory (logger.go:8-16 parity): production JSON
lines vs development human-readable, idempotent reconfiguration."""

from __future__ import annotations

import json
import logging

from better_cdc_spark.logging_setup import new_logger


def _capture(logger: logging.Logger):
    import io

    buf = io.StringIO()
    logger.handlers[0].stream = buf
    return buf


def test_production_logger_emits_parseable_json_lines():
    log = new_logger("bcs-test-prod", debug=False)
    buf = _capture(log)
    log.info("stream started", extra={"table": "public.orders", "epoch": 3})
    log.debug("suppressed at production level")
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert len(lines) == 1  # debug suppressed, INFO level
    row = json.loads(lines[0])
    assert row["msg"] == "stream started"
    assert row["level"] == "info"
    assert row["table"] == "public.orders" and row["epoch"] == 3
    assert row["caller"].endswith(".py:" + row["caller"].rsplit(":", 1)[1])
    assert isinstance(row["ts"], float)


def test_debug_logger_is_development_config():
    log = new_logger("bcs-test-dev", debug=True)
    buf = _capture(log)
    log.debug("verbose detail")
    out = buf.getvalue()
    assert "verbose detail" in out
    assert not out.lstrip().startswith("{")  # human-readable, not JSON


def test_exception_logging_carries_stacktrace():
    log = new_logger("bcs-test-exc", debug=False)
    buf = _capture(log)
    try:
        raise ValueError("boom")
    except ValueError:
        log.exception("publish failed")
    row = json.loads(buf.getvalue().splitlines()[0])
    assert row["level"] == "error"
    assert "ValueError: boom" in row["stacktrace"]


def test_reconfiguration_is_idempotent():
    log1 = new_logger("bcs-test-idem")
    log2 = new_logger("bcs-test-idem")
    assert log1 is log2 and len(log2.handlers) == 1  # no handler stacking
