"""Logging configuration (parity with reference ``utils/logging.py:8-43``).

The engine logs under the ``mallarddv_spark`` logger namespace; flows and
loaders emit DEBUG/INFO events there (the ``verbose`` flags additionally
print, matching the reference's console behavior). Call
:func:`configure_logging` once per process — idempotent, replaces prior
handlers.
"""

from __future__ import annotations

import logging

LOGGER_NAME = "mallarddv_spark"


def get_logger(child: str | None = None) -> logging.Logger:
    """The engine's logger (optionally a child, e.g. ``get_logger('flow')``)."""
    name = f"{LOGGER_NAME}.{child}" if child else LOGGER_NAME
    return logging.getLogger(name)


def configure_logging(
    level: int = logging.INFO, log_file: str | None = None
) -> logging.Logger:
    """Configure console (and optional file) logging for the engine.

    Mirrors the reference's ``configure_logging`` contract: sets the level,
    replaces existing handlers, installs a timestamped formatter, and
    returns the logger.
    """
    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(level)
    for handler in logger.handlers[:]:
        logger.removeHandler(handler)
    formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    console = logging.StreamHandler()
    console.setLevel(level)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setLevel(level)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger
