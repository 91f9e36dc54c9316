"""Structured logging with levels (closes SURVEY.md §5 'metrics/logging').

The reference's only observability is a compile-time ``#define PRINT`` dump
(``src/v1_baseline.cu:20,105-148``) with no levels, destinations, or
structure. Here: stdlib logging, configured once from the environment —

  SIMPLEX_TPU_LOG       level name (DEBUG/INFO/WARNING/ERROR; default WARNING)
  SIMPLEX_TPU_LOG_JSON  "1" -> one JSON object per line (machine-parseable)

Usage: ``log = get_logger(__name__); log.info("chunk done", extra=fields(iters=i))``.
Structured fields ride the ``extra`` dict and appear as JSON keys (or a
``key=value`` suffix in text mode).
"""

from __future__ import annotations

import json
import logging
import os
import time

_CONFIGURED = False
_FIELDS_KEY = "simplex_fields"


def fields(**kw):
    """Structured fields for a log call: ``log.info("msg", extra=fields(x=1))``."""
    return {_FIELDS_KEY: kw}


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        obj = {
            "ts": round(time.time(), 3),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        obj.update(getattr(record, _FIELDS_KEY, None) or {})
        return json.dumps(obj)


class _TextFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        base = super().format(record)
        extra = getattr(record, _FIELDS_KEY, None)
        if extra:
            base += " " + " ".join(f"{k}={v}" for k, v in extra.items())
        return base


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    root = logging.getLogger("simplex_tpu")
    level = os.environ.get("SIMPLEX_TPU_LOG", "WARNING").upper()
    root.setLevel(getattr(logging, level, logging.WARNING))
    handler = logging.StreamHandler()
    if os.environ.get("SIMPLEX_TPU_LOG_JSON"):
        handler.setFormatter(_JsonFormatter())
    else:
        handler.setFormatter(
            _TextFormatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
    root.addHandler(handler)
    root.propagate = False


def get_logger(name: str = "simplex_tpu") -> logging.Logger:
    _configure()
    if not name.startswith("simplex_tpu"):
        name = f"simplex_tpu.{name}"
    return logging.getLogger(name)


def set_level(level: str) -> None:
    """Programmatic override (the CLI's --log-level flag)."""
    _configure()
    logging.getLogger("simplex_tpu").setLevel(
        getattr(logging, level.upper(), logging.WARNING)
    )
