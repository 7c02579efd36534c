"""Logging / progress utilities.

The reference library uses a bare timestamped ``print`` helper
(``display`` at reference decomposition.py:28 and pmd_loader.py:24, duplicated).
We provide a single canonical implementation built on :mod:`logging` so that
library users can silence or redirect output, while keeping the
``display(msg)`` convenience wrapper for pipeline stage banners.
"""

from __future__ import annotations

import logging
import sys
import time

_LOGGER_NAME = "localmd_tpu"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s localmd_tpu]: %(message)s", "%y-%m-%d %H:%M:%S")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def display(msg: str) -> None:
    """Timestamped stage banner (parity with reference ``display``)."""
    get_logger().info(msg)


class StageTimer:
    """Context manager that logs wall-clock duration of a pipeline stage."""

    def __init__(self, name: str, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        if self.verbose:
            display(f"{self.name}...")
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            display(f"{self.name} done in {self.elapsed:.3f}s")
        return False
