"""Assembly: matrix-free operator == explicit sparse matrix; Dirichlet
condensation correctness (reference assembler, hho.hpp:252-463)."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core import ops
from proton_tpu.methods import assembly, hho, poisson
from proton_tpu.solvers import cg


def _setup(N=4, k=1, kind="quad"):
    mk = pt.make_quad_mesh if kind == "quad" else pt.make_poly_mesh
    m = mk(Nx=N, Ny=N)
    g = pt.cell_geometry(m)
    hdi = pt.HHODegreeInfo(k + 1, k)
    oper, lc = poisson.assemble_local(m, g, hdi, "hho")
    dm = assembly.build_dofmap(m, hdi)
    return m, g, hdi, oper, lc, dm


def test_dofmap_layout():
    m, g, hdi, oper, lc, dm = _setup(N=3, k=0)
    # layout: C*cbs cell dofs then fbs per non-Dirichlet face
    n_dir = int(np.asarray(dm.is_dirichlet_face).sum())
    assert dm.n_dofs == m.num_cells * dm.cbs + (m.num_faces - n_dir) * dm.fbs
    ai = np.asarray(dm.asm_idx)
    assert (ai[:, :dm.cbs] == (np.arange(m.num_cells)[:, None] * dm.cbs
                               + np.arange(dm.cbs))).all()
    # every free dof is hit at least once, all within range
    free = ai[ai < dm.n_dofs]
    assert set(free.tolist()) == set(range(dm.n_dofs))


def test_operator_matches_bcoo():
    m, g, hdi, oper, lc, dm = _setup()
    A = assembly.make_operator(dm, lc)
    Ad = np.asarray(assembly.assemble_bcoo(dm, lc).todense())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dm.n_dofs))
    assert np.allclose(np.asarray(A(x)), Ad @ np.asarray(x), atol=1e-12)
    assert np.allclose(Ad, Ad.T, atol=1e-12)
    d = np.asarray(assembly.operator_diagonal(dm, lc))
    assert np.allclose(d, np.diag(Ad), atol=1e-12)


def test_dirichlet_exactness():
    """With exact polynomial data (in the HHO space), the discrete solution
    reproduces it exactly: u = x + y solves Laplace with g = x + y."""
    m, g, hdi, oper, lc, dm = _setup(N=3, k=1)

    def u(p):
        return p[..., 0] + 2 * p[..., 1]

    def f(p):
        return jnp.zeros_like(p[..., 0])

    sol = poisson.solve_poisson(
        m, dm, hdi, f, u, "hho",
        cg.CGParams(convergence_threshold=1e-14, max_iter=10000,
                    apply_preconditioner=True))
    proj = ops.project_function(m, g, hdi, u)
    assert np.allclose(np.asarray(sol.local), np.asarray(proj), atol=1e-9)


def test_take_local_data_roundtrip():
    m, g, hdi, oper, lc, dm = _setup(N=3, k=0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(dm.n_dofs))
    xl = assembly.take_local_data(dm, x)
    # cell dofs come back verbatim
    assert np.allclose(np.asarray(xl[:, :dm.cbs]),
                       np.asarray(x[:m.num_cells * dm.cbs]).reshape(
                           m.num_cells, dm.cbs))
