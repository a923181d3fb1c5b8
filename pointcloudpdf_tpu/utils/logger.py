"""Colored stream + file logger (reference contract: pointcept/utils/logger.py)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGERS = {}


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.DEBUG: "\x1b[36m",
        logging.INFO: "\x1b[32m",
        logging.WARNING: "\x1b[33m",
        logging.ERROR: "\x1b[31m",
        logging.CRITICAL: "\x1b[41m",
    }
    RESET = "\x1b[0m"

    def __init__(self, use_color: bool = True):
        super().__init__("[%(asctime)s %(levelname)s %(name)s] %(message)s",
                         datefmt="%Y-%m-%d %H:%M:%S")
        self.use_color = use_color

    def format(self, record):
        msg = super().format(record)
        if self.use_color:
            color = self.COLORS.get(record.levelno, "")
            if color:
                msg = f"{color}{msg}{self.RESET}"
        return msg


def get_logger(
    name: str = "pointcloudpdf_tpu",
    log_file: Optional[str] = None,
    log_level: int = logging.INFO,
    file_mode: str = "a",
) -> logging.Logger:
    """Create (or fetch) a logger; only process rank 0 should pass log_file."""
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    logger.propagate = False
    stream = logging.StreamHandler(stream=sys.stdout)
    stream.setFormatter(_ColorFormatter(use_color=sys.stdout.isatty()))
    stream.setLevel(log_level)
    logger.addHandler(stream)
    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, file_mode)
        fh.setFormatter(_ColorFormatter(use_color=False))
        fh.setLevel(log_level)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


def get_root_logger(log_file: Optional[str] = None, log_level: int = logging.INFO):
    return get_logger("pointcloudpdf_tpu", log_file=log_file, log_level=log_level)
