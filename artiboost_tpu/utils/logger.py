"""Colored singleton logger (parity: ``anakin/utils/logger.py:63``)."""
from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_COLORS = {
    logging.DEBUG: "\033[36m",
    logging.INFO: "\033[32m",
    logging.WARNING: "\033[33m",
    logging.ERROR: "\033[31m",
    logging.CRITICAL: "\033[35m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        if sys.stderr.isatty():
            color = _COLORS.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


def _make_logger() -> logging.Logger:
    lg = logging.getLogger("artiboost_tpu")
    if lg.handlers:
        return lg
    lg.setLevel(os.environ.get("ARTIBOOST_LOGLEVEL", "INFO"))
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(_ColorFormatter("%(asctime)s | %(levelname)s | %(message)s", "%H:%M:%S"))
    lg.addHandler(handler)
    lg.propagate = False
    return lg


logger = _make_logger()


def add_file_handler(path: str, level: Optional[str] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fh = logging.FileHandler(path)
    fh.setFormatter(logging.Formatter("%(asctime)s | %(levelname)s | %(message)s"))
    if level:
        fh.setLevel(level)
    logger.addHandler(fh)
