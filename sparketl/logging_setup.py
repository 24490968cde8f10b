"""Error/event log sink (SNK-06 — tool:21-27).

Same contract as the reference: append-mode file log with
timestamp - level - message records, default ERROR level.
"""

from __future__ import annotations

import logging

LOG_FORMAT = "%(asctime)s - %(levelname)s - %(message)s"
DEFAULT_LOG_FILE = "sparketl_errors.log"


def configure_logging(
    filename: str = DEFAULT_LOG_FILE, level: int = logging.ERROR
) -> logging.Logger:
    handler = logging.FileHandler(filename, mode="a")
    handler.setFormatter(logging.Formatter(LOG_FORMAT))
    logger = logging.getLogger("sparketl")
    logger.setLevel(level)
    if not any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == handler.baseFilename
        for h in logger.handlers
    ):
        logger.addHandler(handler)
    return logger
