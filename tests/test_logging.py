"""Structured logging (SURVEY.md §5 metrics/logging — absent from the
reference beyond a compile-time PRINT define)."""

import json
import logging

from simplex_tpu.logging import (
    _JsonFormatter,
    _TextFormatter,
    fields,
    get_logger,
    set_level,
)


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        self.records.append(record)


def _capture_on(name="simplex_tpu"):
    h = _Capture()
    logging.getLogger(name).addHandler(h)
    return h


def test_logger_levels():
    log = get_logger("test")
    h = _capture_on()
    try:
        set_level("warning")
        log.info("hidden")
        log.warning("shown", extra=fields(k=1))
        msgs = [r.getMessage() for r in h.records]
        assert "hidden" not in msgs and "shown" in msgs
        set_level("info")
        log.info("now visible")
        assert "now visible" in [r.getMessage() for r in h.records]
    finally:
        logging.getLogger("simplex_tpu").removeHandler(h)
        set_level("warning")


def test_formatters_carry_fields():
    rec = logging.LogRecord(
        "simplex_tpu.x", logging.INFO, __file__, 1, "chunk done", None, None
    )
    rec.simplex_fields = {"iters": 42, "status": "OPTIMAL"}
    obj = json.loads(_JsonFormatter().format(rec))
    assert obj["msg"] == "chunk done"
    assert obj["iters"] == 42 and obj["status"] == "OPTIMAL"
    assert obj["level"] == "INFO"
    txt = _TextFormatter("%(message)s").format(rec)
    assert "iters=42" in txt and "status=OPTIMAL" in txt


def test_two_phase_logs_phase1():
    import numpy as np

    from simplex_tpu.core.twophase import GeneralLP, solve_general

    h = _capture_on()
    try:
        set_level("info")
        lp = GeneralLP(
            A=np.array([[1.0, 1.0]]), b=np.array([2.0]),
            c=np.array([1.0, 0.0]), row_types=["E"],
        )
        solve_general(lp)
        assert any("phase 1 complete" in r.getMessage() for r in h.records)
    finally:
        logging.getLogger("simplex_tpu").removeHandler(h)
        set_level("warning")
