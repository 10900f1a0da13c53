"""k=0 HHO Poisson on a polygonal mesh loaded from the reference text
format (replaces apps/polymesh/polymesh.cpp): load, assemble, solve,
projection-based L2 error, VTK export + quadrature-point dump.

Usage: python -m proton_tpu.apps.polymesh <meshfile> [-k K]
The reference data files live at /root/reference/apps/polymesh/mesh*.txt.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("meshfile")
    ap.add_argument("-k", type=int, default=0, help="degree (ref uses 0)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import proton_tpu as pt
    from proton_tpu.core import bases, ops, quadrature
    from proton_tpu.methods import assembly, poisson
    from proton_tpu.solvers import cg
    from proton_tpu.io.vtk import VtkWriter
    from proton_tpu.io.gnuplot import GnuplotOutput
    from proton_tpu.utils.timing import TimeCounter, bold, green, yellow

    tc = TimeCounter().tic()
    mesh = pt.load_poly_mesh(args.meshfile)
    tc.toc(mesh.points)
    print(bold(yellow(f"Mesh load: {tc} seconds — "
                      f"{mesh.num_cells} cells, {mesh.num_faces} faces")))

    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])

    hdi = pt.HHODegreeInfo(args.k, args.k)
    geom = pt.cell_geometry(mesh)
    dofmap = assembly.build_dofmap(mesh, hdi)

    tc.tic()
    sol = poisson.solve_poisson(
        mesh, dofmap, hdi, rhs_fun, sol_fun, "hho",
        cg.CGParams(convergence_threshold=1e-12, divergence_threshold=1e8,
                    max_iter=3 * dofmap.n_dofs,
                    apply_preconditioner=True))
    tc.toc(sol.x)
    print(bold(yellow(f"Assembly+solve: {tc} seconds "
                      f"({int(sol.iterations)} CG iterations)")))

    # projection-based L2 error (polymesh.cpp:107-121)
    cbs = bases.cell_basis_size(hdi.cell_degree)
    mass = ops.cell_mass_matrices(mesh, geom, hdi.cell_degree)
    rhs = ops.cell_rhs(mesh, geom, hdi.cell_degree, sol_fun)
    pdofs = ops.cho_solve_batched(mass, rhs[..., None])[..., 0]
    diff = pdofs - sol.local[:, :cbs]
    err = float(jnp.sqrt(jnp.sum(
        diff * jnp.einsum("cij,cj->ci", mass, diff))))
    print(bold(green(f"L2-norm error (vs projection): {err}")))

    w = VtkWriter(mesh)
    bar_phi = bases.eval_cell_basis(geom.bar, geom.bar, geom.diam,
                                    hdi.cell_degree)
    u_bar = jnp.einsum("ci,ci->c", bar_phi, sol.local[:, :cbs])
    w.add_variable("u", np.asarray(u_bar), "zonal")
    w.write_vtk("polymesh_solution.vtk")

    rule = quadrature.cell_rule(mesh, geom, 2 * hdi.cell_degree + 2)
    phi = bases.eval_cell_basis(rule.pts, geom.bar[:, None, :],
                                geom.diam[:, None], hdi.cell_degree)
    uq = jnp.einsum("cqi,ci->cq", phi, sol.local[:, :cbs])
    gp = GnuplotOutput("polymesh_solution.dat")
    gp.add_data(rule.pts, uq)
    gp.write()
    print("wrote polymesh_solution.{vtk,dat}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
