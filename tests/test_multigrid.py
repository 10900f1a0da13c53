"""Multigrid V-cycle preconditioner: symmetry/correctness gates (its
efficiency on cut systems is a known limitation — see CLAUDE.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs
from proton_tpu.methods import assembly, condensation, poisson, structured
from proton_tpu.solvers import cg, multigrid


def _condensed(N, k=1):
    mesh = pt.make_quad_mesh(Nx=N, Ny=N)
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
    return mesh, dm, condensation.condense(lc, f, dm.cbs), g_loc


def test_prolongation_restriction_adjoint():
    fbs = 2
    sys_f = structured.make_structured_system(16, 16, fbs)
    sys_c = structured.make_structured_system(8, 8, fbs)
    prol = multigrid.make_prolongation(sys_f, sys_c, jnp.float64)
    key = jax.random.PRNGKey(0)
    xc = structured.GridVec(jax.random.normal(key, (9, 8, fbs)),
                            jax.random.normal(jax.random.PRNGKey(1),
                                              (8, 9, fbs)))
    rf = structured.GridVec(jax.random.normal(jax.random.PRNGKey(2),
                                              (17, 16, fbs)),
                            jax.random.normal(jax.random.PRNGKey(3),
                                              (16, 17, fbs)))
    zc = jax.tree.map(jnp.zeros_like, xc)
    restrict = jax.linear_transpose(prol, zc)
    Pxc = prol(xc)
    Rrf = restrict(rf)[0]
    lhs = float(jnp.sum(Pxc.H * rf.H) + jnp.sum(Pxc.V * rf.V))
    rhs = float(jnp.sum(xc.H * Rrf.H) + jnp.sum(xc.V * Rrf.V))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_mg_preconditioned_cg_matches_jacobi():
    N, k = 32, 1
    S_per = {}
    data = {}
    n = N
    while n >= 8:
        data[n] = _condensed(n, k)
        S_per[n] = data[n][2].S
        n //= 2
    mesh, dm, cond, g_loc = data[N]
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    rhs = structured.structured_rhs(sys_f, cond, g_loc, dm.cbs)
    apply_S = structured.make_structured_operator(sys_f, cond.S)
    diag = structured.structured_diagonal(sys_f, cond.S)
    cgp = cg.CGParams(convergence_threshold=1e-10, max_iter=10000,
                      apply_preconditioner=True)
    r_j = cg.conjugated_gradient(apply_S, rhs, diag, cgp)
    mg = multigrid.build_multigrid(N, dm.fbs, S_per)
    r_m = cg.conjugated_gradient(apply_S, rhs, None, cgp,
                                 precond=mg.precondition)
    assert int(r_m.exit_reason) == cg.CONVERGED
    assert np.allclose(np.asarray(r_m.x.H), np.asarray(r_j.x.H),
                       atol=1e-7)
    assert np.allclose(np.asarray(r_m.x.V), np.asarray(r_j.x.V),
                       atol=1e-7)


def test_explicit_restriction_matches_linear_transpose():
    """The hand-written stencil restriction (cells-last) equals
    jax.linear_transpose of the reconstruction prolongation exactly."""
    from proton_tpu.methods import cells_last as cl

    fbs, Nc = 2, 8
    hdi = HHODegreeInfo(2, 1)
    sys_f = structured.make_structured_system(2 * Nc, 2 * Nc, fbs)
    sys_c = structured.make_structured_system(Nc, Nc, fbs)
    prol = multigrid.make_reconstruction_prolongation_cl(
        sys_f, sys_c, hdi, 1.0 / Nc, jnp.float64)
    rest = multigrid.make_reconstruction_restriction_cl(
        sys_f, sys_c, hdi, 1.0 / Nc, jnp.float64)

    zc = cl.GridVecCL(jnp.zeros((fbs, Nc + 1, Nc)),
                      jnp.zeros((fbs, Nc, Nc + 1)))
    t = jax.linear_transpose(prol, zc)
    rf = cl.GridVecCL(
        jax.random.normal(jax.random.PRNGKey(0), (fbs, 2 * Nc + 1, 2 * Nc)),
        jax.random.normal(jax.random.PRNGKey(1), (fbs, 2 * Nc, 2 * Nc + 1)))
    ref = t(rf)[0]
    got = rest(rf)
    assert np.allclose(np.asarray(got.H), np.asarray(ref.H), atol=1e-13)
    assert np.allclose(np.asarray(got.V), np.asarray(ref.V), atol=1e-13)
