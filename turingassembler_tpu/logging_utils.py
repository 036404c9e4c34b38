"""Staged logger — rebuild of src/log.c (SURVEY.md LX).

Reference behaviors kept: every line carries source location, the
current pipeline stage label (set_log_stage, log.c:108-121), and peak
RSS; full detail always goes to `assembly.log` while the console shows
>= the chosen level.
"""

from __future__ import annotations

import logging
import os
import resource
import sys
from typing import Optional

_STAGE = {"name": "init"}
_LOGGER: Optional[logging.Logger] = None


def set_log_stage(name: str) -> None:
    _STAGE["name"] = name


class _StageFormatter(logging.Formatter):
    def format(self, record):
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        record.stage = _STAGE["name"]
        record.rss = f"{rss_mb:.0f}MB"
        return super().format(record)


def init_logger(out_dir: str = ".", level: int = logging.INFO) -> logging.Logger:
    global _LOGGER
    logger = logging.getLogger("turingassembler")
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    fmt = _StageFormatter(
        "%(asctime)s [%(levelname)s] [%(stage)s] [%(rss)s] "
        "%(filename)s:%(lineno)d %(message)s")
    sh = logging.StreamHandler(sys.stderr)
    sh.setLevel(level)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    try:
        os.makedirs(out_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(out_dir, "assembly.log"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    except OSError:
        pass
    _LOGGER = logger
    return logger


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        _LOGGER = init_logger()
    return _LOGGER
