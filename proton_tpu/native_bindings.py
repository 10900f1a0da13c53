"""ctypes bindings to the native host runtime (native/topology.cpp).

The native library accelerates the host-side mesh topology pipeline (edge
extraction, face dedup, cell->face maps, face->cell incidence) — the
"graph builder / data loader" role that the reference implements in C++
(basic_mesh.hpp:230-475). The NumPy implementations in core/mesh.py remain
as the reference fallback; tests cross-check both.

The library is searched next to the repo's native/ directory and can be
(re)built with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, "..", "native", "libproton_native.so"),
        os.path.join(here, "libproton_native.so"),
        os.environ.get("PROTON_NATIVE_LIB", ""),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (once) and return the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PROTON_TPU_NO_NATIVE"):
        return None
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    i64 = ctypes.c_int64
    lib.proton_build_topology.restype = ctypes.c_int64
    lib.proton_build_topology.argtypes = [
        i64, i64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
        i64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.proton_structured_grid.restype = None
    lib.proton_structured_grid.argtypes = [
        i64, i64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def build_topology(cell_ptids: np.ndarray, cell_npts: np.ndarray,
                   edge_bnd: np.ndarray):
    """Returns (face_ptids [F,2] i32, face_bnd [F] i8,
    cell_faces [C,Pmax] i32, face_cells [F,2] i32, face_slot [F,2] i32)."""
    lib = get_lib()
    assert lib is not None
    C, Pmax = cell_ptids.shape
    cap = int(cell_npts.sum())
    face_ptids = np.empty((cap, 2), dtype=np.int32)
    face_bnd = np.empty((cap,), dtype=np.int8)
    cell_faces = np.empty((C, Pmax), dtype=np.int32)
    face_cells = np.empty((cap, 2), dtype=np.int32)
    face_slot = np.empty((cap, 2), dtype=np.int32)
    nf = lib.proton_build_topology(
        C, Pmax,
        np.ascontiguousarray(cell_ptids, dtype=np.int64),
        np.ascontiguousarray(cell_npts, dtype=np.int64),
        np.ascontiguousarray(edge_bnd, dtype=np.int8),
        cap, face_ptids.reshape(-1), face_bnd, cell_faces.reshape(-1),
        face_cells.reshape(-1), face_slot.reshape(-1))
    if nf < 0:
        raise RuntimeError("native topology build overflowed capacity")
    nf = int(nf)
    return (face_ptids[:nf], face_bnd[:nf], cell_faces,
            face_cells[:nf], face_slot[:nf])


def structured_grid(Nx: int, Ny: int, min_x: float, max_x: float,
                    min_y: float, max_y: float):
    """Returns (points [P,2] f64, cell_ptids [C,4] i64, edge_bnd [C,4] i8)."""
    lib = get_lib()
    assert lib is not None
    P = (Nx + 1) * (Ny + 1)
    C = Nx * Ny
    points = np.empty((P, 2), dtype=np.float64)
    cell_ptids = np.empty((C, 4), dtype=np.int64)
    edge_bnd = np.empty((C, 4), dtype=np.int8)
    lib.proton_structured_grid(Nx, Ny, min_x, max_x, min_y, max_y,
                               points.reshape(-1), cell_ptids.reshape(-1),
                               edge_bnd.reshape(-1))
    return points, cell_ptids, edge_bnd
