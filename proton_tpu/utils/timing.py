"""Timing + phase reporting (replaces timecounter, utils.hpp:241-287, and
the per-phase colored stdout lines of the apps).

On an async backend like TPU, wall-clock timing must synchronize:
``tic``/``toc`` wrap ``jax.block_until_ready`` when given a value.
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager

import jax


class TimeCounter:
    """tic()/toc() stopwatch; prints seconds like the reference's
    operator<< (utils.hpp:281-287)."""

    def __init__(self):
        self._start = None
        self._elapsed = 0.0

    def tic(self):
        self._start = time.perf_counter()
        return self

    def toc(self, sync_value=None):
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self._elapsed = time.perf_counter() - self._start
        return self._elapsed

    def to_double(self):
        return self._elapsed

    def __str__(self):
        return f"{self._elapsed:.6g}"


# ANSI manipulators (utils.hpp:295-374) as simple wrappers
def _wrap(code):
    def f(s):
        return f"\x1b[{code}m{s}\x1b[0m" if sys.stdout.isatty() else str(s)
    return f


red = _wrap(31)
green = _wrap(32)
yellow = _wrap(33)
blue = _wrap(34)
magenta = _wrap(35)
cyan = _wrap(36)
bold = _wrap(1)


@contextmanager
def phase(name: str, color=yellow):
    """Context manager printing '<name>: <seconds> seconds' like the app
    phase reports (e.g. cuthho_square.cpp:905)."""
    tc = TimeCounter().tic()
    result = {}
    try:
        yield result
    finally:
        tc.toc(result.get("sync"))
        print(bold(color(f"{name}: {tc} seconds")))
