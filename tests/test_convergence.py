"""Golden convergence-rate integration tests — the de-facto test suite of
the reference (convergence_test.cpp prints observed orders, SURVEY.md
section 4). Expected orders on sin(pi x) sin(pi y): L2 = celdeg+1 = k+2
(mixed-order hdi(k+1, k)), energy = k+1."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.methods import assembly, poisson
from proton_tpu.solvers import cg


def _exact(p):
    return jnp.sin(np.pi * p[..., 0]) * jnp.sin(np.pi * p[..., 1])


def _rhs(p):
    return 2.0 * np.pi ** 2 * _exact(p)


def _grad(p):
    return jnp.stack([
        np.pi * jnp.cos(np.pi * p[..., 0]) * jnp.sin(np.pi * p[..., 1]),
        np.pi * jnp.sin(np.pi * p[..., 0]) * jnp.cos(np.pi * p[..., 1])],
        axis=-1)


def _orders(k, Ns, stab):
    hdi = pt.HHODegreeInfo(k + 1, k)
    cgp = cg.CGParams(convergence_threshold=1e-12, max_iter=100000,
                      apply_preconditioner=True)
    errs = []
    for N in Ns:
        m = pt.make_quad_mesh(Nx=N, Ny=N)
        dm = assembly.build_dofmap(m, hdi)
        sol = poisson.solve_poisson(m, dm, hdi, _rhs, _exact, stab, cgp)
        assert int(sol.exit_reason) == cg.CONVERGED
        e = poisson.compute_errors(m, hdi, sol, _exact, _grad)
        errs.append((float(e.l2), float(e.l2_proj), float(e.energy)))
    es = np.array(errs)
    return np.log2(es[:-1] / es[1:])  # [steps-1, 3]


@pytest.mark.parametrize("k", [0, 1, 2])
def test_convergence_orders_hho_stab(k):
    orders = _orders(k, [4, 8, 16], "hho")
    last = orders[-1]
    assert last[0] > k + 2 - 0.25, f"L2 order {last[0]}"
    assert last[1] > k + 2 - 0.25, f"proj-L2 order {last[1]}"
    assert last[2] > k + 1 - 0.25, f"energy order {last[2]}"


@pytest.mark.parametrize("k", [0, 1])
def test_convergence_orders_naive_stab(k):
    orders = _orders(k, [4, 8, 16], "naive")
    last = orders[-1]
    # naive stabilization loses one order in L2 vs the HHO one but keeps
    # energy order k+1
    assert last[2] > k + 1 - 0.3, f"energy order {last[2]}"


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_stabilization_order(k):
    """stabilization_test.cpp:38-95: sqrt(proj . S proj) on the first cell
    for N doubling converges at order ~k+1 (equal-order hdi)."""
    from proton_tpu.core import ops
    from proton_tpu.methods import hho as hho_m
    hdi = pt.HHODegreeInfo(k, k)

    def f(p):
        return 2.0 * np.pi ** 2 * jnp.sin(2 * np.pi * p[..., 0]) * \
            jnp.sin(2 * np.pi * p[..., 1])

    errs = []
    for N in [2, 4, 8, 16]:
        m = pt.make_quad_mesh(Nx=N, Ny=N)
        g = pt.cell_geometry(m)
        oper, _ = hho_m.hho_laplacian(m, g, hdi)
        S = hho_m.fancy_stabilization(m, g, hdi, oper)
        proj = ops.project_function(m, g, hdi, f)
        val = float(jnp.einsum("d,de,e->", proj[0], S[0], proj[0]))
        errs.append(np.sqrt(val))
    orders = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert orders[-1] > k + 1 - 0.35, f"k={k} orders={orders}"
