"""Static condensation: exactness vs the full solve, on fitted and cut
problems."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs
from proton_tpu.methods import assembly, condensation, poisson
from proton_tpu.solvers import cg

CGP = cg.CGParams(convergence_threshold=1e-13, max_iter=100000,
                  apply_preconditioner=True)


@pytest.mark.parametrize("k", [0, 1, 2])
def test_condensed_equals_full(k):
    mesh = pt.make_quad_mesh(Nx=8, Ny=8)
    hdi = HHODegreeInfo(k + 1, k)
    geom = cell_geometry(mesh)
    _, lc = poisson.assemble_local(mesh, geom, hdi)
    pi = np.pi
    f = cell_rhs(mesh, geom, hdi.cell_degree,
                 lambda p: 2 * pi ** 2 * jnp.sin(pi * p[..., 0]) *
                 jnp.sin(pi * p[..., 1]))
    dm = assembly.build_dofmap(mesh, hdi)
    fd = assembly.dirichlet_face_data(
        mesh, hdi, lambda p: jnp.sin(pi * p[..., 0]) *
        jnp.sin(pi * p[..., 1]))
    g_loc = assembly.local_dirichlet_data(dm, mesh, fd)

    rhs = assembly.assemble_rhs(dm, f, lc, g_loc)
    res_full = cg.conjugated_gradient(
        assembly.make_operator(dm, lc), rhs,
        assembly.operator_diagonal(dm, lc), CGP)
    local_full = assembly.take_local_data(dm, res_full.x, g_loc)

    inc = assembly.build_face_incidence(mesh, dm)
    local_cond, res_cond = condensation.solve_condensed(
        dm, lc, f, g_loc, inc, CGP)
    assert int(res_cond.exit_reason) == cg.CONVERGED
    assert np.allclose(np.asarray(local_cond), np.asarray(local_full),
                       atol=1e-10)
    # condensation reduces the Krylov iteration count
    assert int(res_cond.iterations) <= int(res_full.iterations)


def test_condensed_fictdom():
    """Condensed solve of the cutHHO fictdom system matches the full
    solve (SPD structure survives elimination)."""
    from proton_tpu.cut import classify, fictdom, levelset
    from proton_tpu.cut import methods as cut_methods

    N, k = 8, 1
    mesh = pt.make_poly_mesh(Nx=N, Ny=N)
    ls = levelset.circle_level_set(0.35, 0.5, 0.5)
    mesh, cutdata = classify.cut_preprocess(mesh, ls, levels=2)
    hdi = HHODegreeInfo(k + 1, k)
    geom = cell_geometry(mesh)
    cut_ids = np.nonzero(np.asarray(cutdata.cell_loc) ==
                         classify.LOC_CUT)[0]
    batch = cut_methods.make_cut_batch(mesh, geom, cutdata, cut_ids)
    pi = np.pi
    rhs_fun = lambda p: 2 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])

    lc, _ = fictdom.assemble_fictdom_local(mesh, geom, batch, ls, hdi,
                                           rhs_fun, sol_fun)
    f = fictdom.assemble_fictdom_rhs(mesh, geom, batch, ls, hdi, rhs_fun,
                                     sol_fun, cutdata.cell_loc)
    dm = assembly.build_dofmap(mesh, hdi)
    fd = assembly.dirichlet_face_data(mesh, hdi, sol_fun)
    g_loc = assembly.local_dirichlet_data(dm, mesh, fd)

    rhs = assembly.assemble_rhs(dm, f, lc, g_loc)
    res_full = cg.conjugated_gradient(
        assembly.make_operator(dm, lc), rhs,
        assembly.operator_diagonal(dm, lc), CGP)
    local_full = assembly.take_local_data(dm, res_full.x, g_loc)

    inc = assembly.build_face_incidence(mesh, dm)
    local_cond, res_cond = condensation.solve_condensed(
        dm, lc, f, g_loc, inc, CGP)
    assert int(res_cond.exit_reason) == cg.CONVERGED
    assert np.allclose(np.asarray(local_cond), np.asarray(local_full),
                       atol=1e-8)
