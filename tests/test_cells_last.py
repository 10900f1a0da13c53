"""Cells-last ([entries, C]) layout equivalence vs the row-major
reference path (methods/condensation.py, methods/structured.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs
from proton_tpu.methods import (assembly, cells_last, condensation,
                                poisson, structured)
from proton_tpu.solvers import cg, multigrid


def _setup(N=8, k=1):
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
    return mesh, hdi, dm, lc, f, g_loc


def _to_cl(lc):
    C, d, _ = lc.shape
    return jnp.transpose(lc, (1, 2, 0)).reshape(d * d, C)


@pytest.mark.parametrize("k", [1, 2])
def test_condense_cl_matches_row_major(k):
    mesh, hdi, dm, lc, f, _ = _setup(8, k)
    rm = condensation.condense(lc, f, dm.cbs)
    clsys = cells_last.condense_cl(_to_cl(lc), f.T, dm.cbs)
    ref = cells_last.from_row_major(rm)
    for a, b, name in zip(clsys, ref, CondFields := clsys._fields):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10), name


def test_structured_solve_cl_matches_row_major():
    N, k = 16, 1
    mesh, hdi, dm, lc, f, g_loc = _setup(N, k)
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    cgp = cg.CGParams(convergence_threshold=1e-12, max_iter=20000,
                      apply_preconditioner=True)
    local_rm, res_rm = structured.solve_condensed_structured(
        sys_f, lc, f, dm.cbs, g_loc, cgp)

    cond = cells_last.condense_cl(_to_cl(lc), f.T, dm.cbs)
    gF_cl = g_loc[:, dm.cbs:].T
    rhs = cells_last.structured_rhs_cl(sys_f, cond, gF_cl)
    apply_S = cells_last.make_structured_operator_cl(sys_f, cond.S)
    diag = cells_last.structured_diagonal_cl(sys_f, cond.S)
    res = cg.conjugated_gradient(apply_S, rhs, diag, cgp)
    local_cl = cells_last.solve_recover_cl(sys_f, cond, res.x, gF_cl)
    assert int(res.exit_reason) == cg.CONVERGED
    assert np.allclose(np.asarray(local_cl), np.asarray(local_rm),
                       atol=1e-8)


def test_operator_and_blocks_cl_match():
    N, k = 8, 1
    mesh, hdi, dm, lc, f, _ = _setup(N, k)
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    rm = condensation.condense(lc, f, dm.cbs)
    cond = cells_last.from_row_major(rm)

    rng = np.random.default_rng(0)
    x = structured.GridVec(
        jnp.asarray(rng.standard_normal((N + 1, N, dm.fbs))),
        jnp.asarray(rng.standard_normal((N, N + 1, dm.fbs))))
    y_rm = structured.make_structured_operator(sys_f, rm.S)(x)
    x_cl = cells_last.to_cells_last(x)
    y_cl = cells_last.make_structured_operator_cl(sys_f, cond.S)(x_cl)
    back = cells_last.from_cells_last(y_cl)
    assert np.allclose(np.asarray(back.H), np.asarray(y_rm.H), atol=1e-11)
    assert np.allclose(np.asarray(back.V), np.asarray(y_rm.V), atol=1e-11)

    bj_rm = structured.block_jacobi_preconditioner(sys_f, rm.S)(x)
    bj_cl = cells_last.from_cells_last(
        cells_last.block_jacobi_preconditioner_cl(sys_f, cond.S)(x_cl))
    assert np.allclose(np.asarray(bj_cl.H), np.asarray(bj_rm.H),
                       atol=1e-11)

    d_rm = structured.structured_diagonal(sys_f, rm.S)
    d_cl = cells_last.from_cells_last(
        cells_last.structured_diagonal_cl(sys_f, cond.S))
    assert np.allclose(np.asarray(d_cl.H), np.asarray(d_rm.H), atol=1e-12)
    assert np.allclose(np.asarray(d_cl.V), np.asarray(d_rm.V), atol=1e-12)


def test_cut_patch_smoother_cl_matches():
    N, k = 16, 1
    mesh, hdi, dm, lc, f, _ = _setup(N, k)
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    rm = condensation.condense(lc, f, dm.cbs)
    cond = cells_last.from_row_major(rm)
    # any interior cell subset works for the equivalence check
    cut_ids = np.array([17, 18, 33, 100, 101])
    rng = np.random.default_rng(1)
    r = structured.GridVec(
        jnp.asarray(rng.standard_normal((N + 1, N, dm.fbs))),
        jnp.asarray(rng.standard_normal((N, N + 1, dm.fbs))))
    y_rm = structured.make_cut_patch_smoother(sys_f, rm.S, cut_ids)(r)
    y_cl = cells_last.from_cells_last(
        cells_last.make_cut_patch_smoother_cl(sys_f, cond.S, cut_ids)(
            cells_last.to_cells_last(r)))
    assert np.allclose(np.asarray(y_cl.H), np.asarray(y_rm.H), atol=1e-11)
    assert np.allclose(np.asarray(y_cl.V), np.asarray(y_rm.V), atol=1e-11)


@pytest.mark.slow
def test_multigrid_cl_matches_row_major():
    N, k = 32, 1
    S_rm, S_cl = {}, {}
    n = N
    hdi = None
    while n >= 8:
        mesh, hdi, dm, lc, f, _ = _setup(n, k)
        rm = condensation.condense(lc, f, dm.cbs)
        S_rm[n] = rm.S
        S_cl[n] = cells_last.from_row_major(rm).S
        n //= 2
    mesh, hdi, dm, lc, f, g_loc = _setup(N, k)
    mg_rm = multigrid.build_multigrid(N, dm.fbs, S_rm, hdi=hdi)
    mg_cl = multigrid.build_multigrid(N, dm.fbs, S_cl, hdi=hdi,
                                      layout="cl")
    rng = np.random.default_rng(2)
    r = structured.GridVec(
        jnp.asarray(rng.standard_normal((N + 1, N, dm.fbs))),
        jnp.asarray(rng.standard_normal((N, N + 1, dm.fbs))))
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    r = structured._mask(sys_f, r)
    y_rm = mg_rm.precondition(r)
    y_cl = cells_last.from_cells_last(
        mg_cl.precondition(cells_last.to_cells_last(r)))
    assert np.allclose(np.asarray(y_cl.H), np.asarray(y_rm.H), atol=1e-9)
    assert np.allclose(np.asarray(y_cl.V), np.asarray(y_rm.V), atol=1e-9)
