"""Halo-exchange shard_map structured solve (parallel/halo.py): the
row-sharded stencil CG on 8 virtual devices matches the single-device
structured path exactly (VERDICT round-1 item 10)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs
from proton_tpu.methods import assembly, condensation, poisson, structured
from proton_tpu.parallel import halo
from proton_tpu.solvers import cg


def _system(N, k=1):
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
    return mesh, dm, lc, f, g_loc


def test_halo_operator_matches_structured():
    """A @ x of the halo shard_map operator == the single-device slice
    operator, on random input, 8 shards."""
    N = 16
    mesh, dm, lc, f, g_loc = _system(N)
    cond = condensation.condense(lc, f, dm.cbs)
    sys_f = structured.make_structured_system(N, N, dm.fbs)

    key = jax.random.PRNGKey(0)
    x_full = structured.GridVec(
        jax.random.normal(key, (N + 1, N, dm.fbs)),
        jax.random.normal(jax.random.PRNGKey(1), (N, N + 1, dm.fbs)))
    # the halo layout drops the frozen top row; zero it for comparison
    x_full = structured.GridVec(x_full.H.at[-1].set(0.0), x_full.V)

    y_ref = structured.make_structured_operator(sys_f, cond.S)(x_full)

    dmesh = halo.make_row_mesh()
    assert dmesh.devices.size == 8
    S, x = halo.shard_system(dmesh, sys_f, cond.S, halo.to_halo(x_full))
    y = halo.from_halo(halo.make_halo_operator(dmesh, sys_f, S)(x))
    assert np.allclose(np.asarray(y.H), np.asarray(y_ref.H), atol=1e-12)
    assert np.allclose(np.asarray(y.V), np.asarray(y_ref.V), atol=1e-12)


def test_halo_solve_matches_single_device():
    """Full condensed Jacobi-PCG through the halo path == the structured
    single-device solve (same iterate sequence: identical operator,
    preconditioner and rhs)."""
    N = 16
    mesh, dm, lc, f, g_loc = _system(N)
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    cgp = cg.CGParams(convergence_threshold=1e-10, divergence_threshold=1e8,
                      max_iter=10000, apply_preconditioner=True)
    local_ref, res_ref = structured.solve_condensed_structured(
        sys_f, lc, f, dm.cbs, g_loc, cgp)

    dmesh = halo.make_row_mesh()
    cond = condensation.condense(lc, f, dm.cbs)
    local, res = halo.solve_condensed_halo(dmesh, sys_f, cond, g_loc,
                                           dm.cbs, cgp)
    assert int(res.exit_reason) == cg.CONVERGED
    assert int(res.iterations) == int(res_ref.iterations)
    assert float(jnp.max(jnp.abs(local - local_ref))) < 1e-9


def test_halo_diagonal_matches():
    N = 8
    mesh, dm, lc, f, _ = _system(N)
    cond = condensation.condense(lc, f, dm.cbs)
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    d_ref = structured.structured_diagonal(sys_f, cond.S)
    dmesh = halo.make_row_mesh()
    S = jax.device_put(cond.S)
    d = halo.from_halo(halo.halo_diagonal(dmesh, sys_f, cond.S))
    # frozen top row: reference holds 1.0 there, halo layout re-appends 0
    assert np.allclose(np.asarray(d.H[:-1]), np.asarray(d_ref.H[:-1]))
    assert np.allclose(np.asarray(d.V), np.asarray(d_ref.V))
