"""Gnuplot point-cloud outputs (replaces postprocess_output /
gnuplot_output_object, apps/cuthho/cuthho_square.cpp:737-804): rows of
"x y value" written from host NumPy, batched instead of per-point."""

from __future__ import annotations

import numpy as np


class GnuplotOutput:
    """Buffers (point, value) rows and writes them to a .dat file."""

    def __init__(self, filename: str):
        self.filename = filename
        self._pts = []
        self._vals = []

    def add_data(self, pts, vals):
        """pts [..., 2], vals [...] — accepts whole batches."""
        pts = np.asarray(pts).reshape(-1, 2)
        vals = np.asarray(vals).reshape(-1)
        self._pts.append(pts)
        self._vals.append(vals)

    def write(self) -> bool:
        pts = np.concatenate(self._pts) if self._pts else np.zeros((0, 2))
        vals = np.concatenate(self._vals) if self._vals else np.zeros((0,))
        with open(self.filename, "w") as fh:
            for (x, y), v in zip(pts, vals):
                fh.write(f"{x} {y} {v}\n")
        return True


class PostprocessOutput:
    """Container writing all registered outputs
    (postprocess_output, cuthho_square.cpp:783-804)."""

    def __init__(self):
        self._objects = []

    def add_object(self, obj):
        self._objects.append(obj)

    def write(self) -> bool:
        for obj in self._objects:
            obj.write()
        return True
