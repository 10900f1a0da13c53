"""Matplotlib debug renderers (replace the MATLAB .m dumps: dump_mesh at
cuthho_geom.hpp:937-997, test_triangulation at cuthho_square.cpp:275-291,
and the quiver/normals dumps of test_integration :670-732).

matplotlib is optional: importing this module without it raises only when
a plot function is called.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def dump_mesh(mesh, cutdata=None, filename: str = "mesh_dump.png"):
    """Faces colored by kind (boundary red / cut green / interior black),
    interface polylines and side barycenters on cut cells."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 8))
    fp = np.asarray(mesh.points)[np.asarray(mesh.face_ptids)]
    bnd = np.asarray(mesh.face_bnd) != 0
    if cutdata is not None:
        from ..cut.classify import LOC_CUT
        cut = np.asarray(cutdata.face_loc) == LOC_CUT
    else:
        cut = np.zeros(len(fp), dtype=bool)
    for sel, color in ((bnd, "r"), (cut & ~bnd, "g"), (~bnd & ~cut, "k")):
        for (p0, p1) in fp[sel]:
            ax.plot([p0[0], p1[0]], [p0[1], p1[1]], color=color,
                    linewidth=0.6)
    if cutdata is not None:
        from ..cut.classify import LOC_CUT
        cloc = np.asarray(cutdata.cell_loc)
        iface = np.asarray(cutdata.interface)
        for c in np.nonzero(cloc == LOC_CUT)[0]:
            ax.plot(iface[c, :, 0], iface[c, :, 1], "b.-", markersize=2,
                    linewidth=0.8)
    ax.set_aspect("equal")
    fig.savefig(filename, dpi=150)
    plt.close(fig)
    return filename


def plot_triangulation(mesh, cutdata, side, filename="triangulation.png"):
    """Fan triangulation of the cut cells (test_triangulation)."""
    from ..core.geometry import cell_geometry, cell_points
    from ..cut.classify import LOC_CUT
    from ..cut import quadrature as cq

    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 8))
    ids = np.nonzero(np.asarray(cutdata.cell_loc) == LOC_CUT)[0]
    cp = cell_points(mesh)[ids]
    nl = cutdata.node_loc[mesh.cell_ptids[ids]]
    poly = cq.triangulation_points(cp, mesh.cell_npts[ids],
                                   nl, cutdata.interface[ids], side)
    tp = np.asarray(poly.tp)
    count = np.asarray(poly.count)
    bar = np.asarray(poly.bar)
    for c in range(len(ids)):
        n = count[c]
        for i in range(n):
            a, b = tp[c, i], tp[c, (i + 1) % n]
            ax.plot([a[0], b[0]], [a[1], b[1]], "k-", linewidth=0.5)
            ax.plot([bar[c, 0], a[0]], [bar[c, 1], a[1]], "b-",
                    linewidth=0.3)
    ax.set_aspect("equal")
    fig.savefig(filename, dpi=150)
    plt.close(fig)
    return filename


def plot_field(pts, vals, filename="field.png", title=""):
    """Scatter plot of a point-cloud field (gnuplot .dat equivalent)."""
    plt = _plt()
    pts = np.asarray(pts).reshape(-1, 2)
    vals = np.asarray(vals).reshape(-1)
    fig, ax = plt.subplots(figsize=(8, 7))
    sc = ax.scatter(pts[:, 0], pts[:, 1], c=vals, s=3, cmap="viridis")
    fig.colorbar(sc, ax=ax)
    ax.set_aspect("equal")
    ax.set_title(title)
    fig.savefig(filename, dpi=150)
    plt.close(fig)
    return filename
