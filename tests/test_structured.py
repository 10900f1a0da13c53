"""Structured (gather-free) condensed solver: identical solution to the
generic path on generated grid meshes."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs
from proton_tpu.methods import assembly, condensation, poisson, structured
from proton_tpu.solvers import cg

CGP = cg.CGParams(convergence_threshold=1e-13, max_iter=100000,
                  apply_preconditioner=True)


@pytest.mark.parametrize("k", [0, 1])
@pytest.mark.parametrize("dims", [(6, 6), (9, 7)])
def test_structured_matches_generic(k, dims):
    Nx, Ny = dims
    mesh = pt.make_quad_mesh(Nx=Nx, Ny=Ny)
    hdi = HHODegreeInfo(k + 1, k)
    geom = cell_geometry(mesh)
    _, lc = poisson.assemble_local(mesh, geom, hdi)
    pi = np.pi
    f = cell_rhs(mesh, geom, hdi.cell_degree,
                 lambda p: 2 * pi ** 2 * jnp.sin(pi * p[..., 0]) *
                 jnp.sin(pi * p[..., 1]))
    dm = assembly.build_dofmap(mesh, hdi)
    fd = assembly.dirichlet_face_data(
        mesh, hdi,
        lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1]))
    g_loc = assembly.local_dirichlet_data(dm, mesh, fd)

    inc = assembly.build_face_incidence(mesh, dm)
    local_gen, res_gen = condensation.solve_condensed(dm, lc, f, g_loc,
                                                      inc, CGP)
    sys = structured.make_structured_system(Nx, Ny, dm.fbs)
    local_str, res_str = structured.solve_condensed_structured(
        sys, lc, f, dm.cbs, g_loc, CGP)
    assert int(res_str.exit_reason) == cg.CONVERGED
    assert np.allclose(np.asarray(local_str), np.asarray(local_gen),
                       atol=1e-10)


def test_grid_gather_scatter_adjoint():
    """grid_scatter is the exact transpose of grid_gather."""
    import jax
    Nx, Ny, fbs = 5, 4, 2
    sys = structured.make_structured_system(Nx, Ny, fbs)
    key = jax.random.PRNGKey(0)
    x = structured.GridVec(
        jax.random.normal(key, (Ny + 1, Nx, fbs)),
        jax.random.normal(jax.random.PRNGKey(1), (Ny, Nx + 1, fbs)))
    c = jax.random.normal(jax.random.PRNGKey(2), (Ny * Nx, 4 * fbs))
    lhs = float(jnp.sum(structured.grid_gather(sys, x) * c))
    y = structured.grid_scatter(sys, c)
    rhs = float(jnp.sum(x.H * y.H) + jnp.sum(x.V * y.V))
    assert np.isclose(lhs, rhs, rtol=1e-12)
