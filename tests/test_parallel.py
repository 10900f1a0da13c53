"""Multi-chip sharding: the sharded solve must agree with single-device
(conftest forces 8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.methods import assembly, poisson
from proton_tpu.parallel import sharding
from proton_tpu.solvers import cg


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8


def test_sharded_cg_matches_single_device():
    mesh = pt.make_quad_mesh(Nx=6, Ny=6)   # 36 cells, not divisible by 8
    hdi = HHODegreeInfo(2, 1)
    geom = cell_geometry(mesh)
    _, lc = poisson.assemble_local(mesh, geom, hdi)
    f = cell_rhs(mesh, geom, hdi.cell_degree,
                 lambda p: jnp.sin(p[..., 0]))

    dm = assembly.build_dofmap(mesh, hdi)
    fd = assembly.dirichlet_face_data(mesh, hdi,
                                      lambda p: jnp.zeros_like(p[..., 0]))
    g_loc = assembly.local_dirichlet_data(dm, mesh, fd)
    rhs = assembly.assemble_rhs(dm, f, lc, g_loc)
    cgp = cg.CGParams(convergence_threshold=1e-12, max_iter=10000,
                      apply_preconditioner=True)
    res1 = cg.conjugated_gradient(assembly.make_operator(dm, lc), rhs,
                                  assembly.operator_diagonal(dm, lc), cgp)

    n_dev = 8
    dmesh = sharding.make_device_mesh(jax.devices()[:n_dev])
    dm_pad, C = sharding.build_dofmap_padded(mesh, hdi, n_dev)
    pad = dm_pad.n_cells - C
    lc_pad = jnp.concatenate(
        [lc, jnp.zeros((pad,) + lc.shape[1:], lc.dtype)], axis=0)
    res8 = sharding.sharded_solve(dmesh, dm_pad, lc_pad, rhs, cgp)
    assert int(res8.exit_reason) == cg.CONVERGED
    assert np.allclose(np.asarray(res8.x), np.asarray(res1.x), atol=1e-9)


def test_graft_entry_dryrun():
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).resolve().parent.parent / \
        "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    mod.dryrun_multichip(8)
