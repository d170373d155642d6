"""Logging setup shared by all stages.

The reference mixes one ``logging`` setup (``3d_reconstruction.py:38-46``)
with ad-hoc ``[INFO]``-prefixed prints everywhere else (SURVEY.md §5.5); here
every module gets a namespaced logger with one consistent format, and file
logging is opt-in (the reference crashed creating its log file before the
directory existed — quirk 4).
"""
from __future__ import annotations

import logging
import os

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_logger(name: str, logfile: str | None = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(f"vbs.{name}")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(h)
        logger.setLevel(level)
        logger.propagate = False
    if logfile:
        os.makedirs(os.path.dirname(os.path.abspath(logfile)), exist_ok=True)
        fh = logging.FileHandler(logfile)
        fh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(fh)
    return logger
