"""VTK / NumPy field export (replaces the SILO writer,
src/dataio/silo_io.hpp, per the BASELINE.json north star: "SILO/Lua I/O is
swapped for lightweight NumPy/VTK export").

Self-contained legacy-VTK (ASCII unstructured grid) writer — no external
dependency — plus an .npz dump of the same data. Zonal (per-cell) and
nodal (per-point) variables mirror silo_io.hpp's zonal/nodal centering
(:141-171).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

VTK_QUAD = 9
VTK_POLYGON = 7


class VtkWriter:
    """Collects a mesh + variables, then writes .vtk and/or .npz
    (silo_database equivalent, silo_io.hpp:56-171)."""

    def __init__(self, mesh):
        self.points = np.asarray(mesh.points)
        self.cell_ptids = np.asarray(mesh.cell_ptids)
        self.cell_npts = np.asarray(mesh.cell_npts)
        self.zonal: Dict[str, np.ndarray] = {}
        self.nodal: Dict[str, np.ndarray] = {}

    def add_variable(self, name: str, data, centering: str = "zonal"):
        data = np.asarray(data).reshape(-1)
        if centering == "zonal":
            if len(data) != len(self.cell_ptids):
                raise ValueError(f"zonal variable '{name}' has wrong size")
            self.zonal[name] = data
        elif centering == "nodal":
            if len(data) != len(self.points):
                raise ValueError(f"nodal variable '{name}' has wrong size")
            self.nodal[name] = data
        else:
            raise ValueError(f"unknown centering '{centering}'")

    def write_vtk(self, filename: str):
        P = len(self.points)
        C = len(self.cell_ptids)
        with open(filename, "w") as fh:
            fh.write("# vtk DataFile Version 3.0\n")
            fh.write("proton_tpu export\nASCII\n")
            fh.write("DATASET UNSTRUCTURED_GRID\n")
            fh.write(f"POINTS {P} double\n")
            for x, y in self.points:
                fh.write(f"{x} {y} 0.0\n")
            total = int(self.cell_npts.sum()) + C
            fh.write(f"CELLS {C} {total}\n")
            for ids, n in zip(self.cell_ptids, self.cell_npts):
                fh.write(str(n) + " " + " ".join(map(str, ids[:n])) + "\n")
            fh.write(f"CELL_TYPES {C}\n")
            for n in self.cell_npts:
                fh.write(f"{VTK_QUAD if n == 4 else VTK_POLYGON}\n")
            if self.zonal:
                fh.write(f"CELL_DATA {C}\n")
                for name, data in self.zonal.items():
                    fh.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    fh.write("\n".join(map(str, data)) + "\n")
            if self.nodal:
                fh.write(f"POINT_DATA {P}\n")
                for name, data in self.nodal.items():
                    fh.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    fh.write("\n".join(map(str, data)) + "\n")

    def write_npz(self, filename: str):
        np.savez(filename,
                 points=self.points,
                 cell_ptids=self.cell_ptids,
                 cell_npts=self.cell_npts,
                 **{f"zonal_{k}": v for k, v in self.zonal.items()},
                 **{f"nodal_{k}": v for k, v in self.nodal.items()})


def output_mesh_info(mesh, cutdata, ls, basename: str = "cuthho_meshinfo"):
    """Cut-mesh diagnostic export (output_mesh_info,
    cuthho_square.cpp:1451-1519): cut-cell markers, level-set nodal values,
    node side, agglo-set class."""
    from ..cut.classify import LOC_CUT, LOC_NEG, LOC_POS

    w = VtkWriter(mesh)
    loc = np.asarray(cutdata.cell_loc)
    markers = np.where(loc == LOC_POS, 1.0,
                       np.where(loc == LOC_NEG, -1.0, 0.0))
    w.add_variable("cut_cells", markers, "zonal")
    w.add_variable("level_set", np.asarray(ls(mesh.points)), "nodal")
    node_pos = np.where(np.asarray(cutdata.node_loc) == LOC_POS, 1.0, -1.0)
    w.add_variable("node_pos", node_pos, "nodal")
    w.add_variable("agglo_set", np.asarray(cutdata.agglo_set, dtype=float),
                   "zonal")
    w.write_vtk(basename + ".vtk")
    w.write_npz(basename + ".npz")
    return w


def dump_sparse_matrix(bcoo, filename: str):
    """Triplet dump (dump_sparse_matrix, utils.hpp:376-386)."""
    import numpy as np
    data = np.asarray(bcoo.data)
    idx = np.asarray(bcoo.indices)
    with open(filename, "w") as fh:
        for (r, c), v in zip(idx, data):
            fh.write(f"{r} {c} {v}\n")
