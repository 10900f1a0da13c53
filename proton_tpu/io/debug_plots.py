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


def make_test_points_cells(mesh, n: int = 10):
    """(n+1)^2 reference-grid points per cell through the bilinear map
    (make_test_points cell overload, basic_geom.hpp:406-431).
    Returns [C, (n+1)^2, 2]."""
    from ..core.geometry import cell_points
    from ..core.quadrature import bilinear_ref_to_phys

    t = np.linspace(-1.0, 1.0, n + 1)
    xi, eta = np.meshgrid(t, t)                       # i fast, j slow
    ref = np.stack([xi.ravel(), eta.ravel()], axis=1)
    cp = np.asarray(cell_points(mesh))[:, :4, :]
    return np.asarray(bilinear_ref_to_phys(cp, ref))


def make_test_points_faces(mesh, n: int = 10):
    """n+1 equispaced points per face (make_test_points face overload,
    basic_geom.hpp:435-454). Returns [F, n+1, 2]."""
    fp = np.asarray(mesh.points)[np.asarray(mesh.face_ptids)]  # [F, 2, 2]
    t = np.linspace(0.0, 1.0, n + 1)[None, :, None]
    return fp[:, :1, :] + t * (fp[:, 1:2, :] - fp[:, :1, :])


def _write_dat(filename, pts, vals):
    """Rows 'x y v0 v1 ...' flattened over (entity, point)."""
    pts2 = np.asarray(pts).reshape(-1, 2)
    vals2 = np.asarray(vals).reshape(len(pts2), -1)
    with open(filename, "w") as fh:
        for p, v in zip(pts2, vals2):
            fh.write(" ".join(f"{x:.17g}" for x in (*p, *v)) + "\n")
    return filename


def plot_basis_functions(mesh, cell_file="cell_basis_check.dat",
                         face_file="face_basis_check.dat"):
    """Basis values at the test-point grids — cell basis at degree 3,
    face basis at degree 2, as the reference hard-codes
    (plot_basis_functions, cuthho_square.cpp:130-177)."""
    import jax.numpy as jnp
    from ..core import bases
    from ..core.geometry import cell_geometry

    geom = cell_geometry(mesh)
    tps = jnp.asarray(make_test_points_cells(mesh))
    cphi = bases.eval_cell_basis(tps, geom.bar[:, None, :],
                                 geom.diam[:, None], 3)
    _write_dat(cell_file, tps, cphi)

    fp = np.asarray(mesh.points)[np.asarray(mesh.face_ptids)]
    ftps = jnp.asarray(make_test_points_faces(mesh))
    fbar = jnp.asarray(0.5 * (fp[:, 0] + fp[:, 1]))
    fh = jnp.asarray(np.linalg.norm(fp[:, 1] - fp[:, 0], axis=-1))
    fphi = bases.eval_face_basis(ftps, fbar[:, None, :],
                                 (fbar - fp[:, 0])[:, None, :],
                                 fh[:, None], 2)
    _write_dat(face_file, ftps, fphi)
    return cell_file, face_file


def plot_quadrature_points(mesh, degree: int,
                           cell_file="cell_quadrature_check.dat",
                           face_file="face_quadrature_check.dat"):
    """Quadrature nodes + weights of every cell and face
    (plot_quadrature_points, cuthho_square.cpp:179-212)."""
    from ..core import quadrature
    from ..core.geometry import cell_geometry

    geom = cell_geometry(mesh)
    crule = quadrature.cell_rule(mesh, geom, degree)
    _write_dat(cell_file, crule.pts, np.asarray(crule.w)[..., None])
    fp = np.asarray(mesh.points)[np.asarray(mesh.face_ptids)]
    frule = quadrature.face_rule(fp[:, 0], fp[:, 1], degree)
    _write_dat(face_file, frule.pts, np.asarray(frule.w)[..., None])
    return cell_file, face_file


def test_mass_matrices(mesh, degree: int,
                       cell_file="cell_mass_check.dat",
                       face_file="face_mass_check.dat"):
    """L2-project sin(pi x) sin(pi y) on every cell/face basis and dump
    the projection values at the test points (test_mass_matrices,
    cuthho_square.cpp:215-273)."""
    import jax.numpy as jnp
    from ..core import bases, ops
    from ..core.geometry import cell_geometry

    rhs_fun = lambda p: jnp.sin(np.pi * p[..., 0]) * \
        jnp.sin(np.pi * p[..., 1])

    geom = cell_geometry(mesh)
    mass = ops.cell_mass_matrices(mesh, geom, degree)
    rhs = ops.cell_rhs(mesh, geom, degree, rhs_fun)
    sol = ops.cho_solve_batched(mass, rhs[..., None])[..., 0]
    tps = jnp.asarray(make_test_points_cells(mesh))
    cphi = bases.eval_cell_basis(tps, geom.bar[:, None, :],
                                 geom.diam[:, None], degree)
    vals = jnp.einsum("cqi,ci->cq", cphi, sol)
    _write_dat(cell_file, tps, np.asarray(vals)[..., None])

    fp = jnp.asarray(np.asarray(mesh.points)[np.asarray(mesh.face_ptids)])
    fmass = ops.face_mass_matrices(fp, degree)
    frhs = ops.face_rhs(fp, degree, rhs_fun)
    fsol = ops.cho_solve_batched(fmass, frhs[..., None])[..., 0]
    ftps = jnp.asarray(make_test_points_faces(mesh))
    fbar = 0.5 * (fp[:, 0] + fp[:, 1])
    fh = jnp.linalg.norm(fp[:, 1] - fp[:, 0], axis=-1)
    fphi = bases.eval_face_basis(ftps, fbar[:, None, :],
                                 (fbar - fp[:, 0])[:, None, :],
                                 fh[:, None], degree)
    fvals = jnp.einsum("fqi,fi->fq", fphi, fsol)
    _write_dat(face_file, ftps, np.asarray(fvals)[..., None])
    return cell_file, face_file


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
