"""Convergence order of the HHO stabilization bilinear form alone
(replaces apps/stabilization_test/stabilization_test.cpp): for each k,
sqrt(proj . S proj) on the first cell for N = 2, 4, ..., printing observed
orders log2(e_prev/e_cur) (:80-94).

Usage: python -m proton_tpu.apps.stabilization_test
"""

from __future__ import annotations

import sys

import numpy as np


def test_stabilization(N: int, k: int) -> float:
    """stabilization_test.cpp:38-75 (first cell only, equal-order hdi)."""
    import jax.numpy as jnp
    import proton_tpu as pt
    from proton_tpu.core import ops
    from proton_tpu.methods import hho

    hdi = pt.HHODegreeInfo(k, k)
    mesh = pt.make_quad_mesh(Nx=N, Ny=N)
    geom = pt.cell_geometry(mesh)

    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(2 * pi * p[..., 0]) * \
        jnp.sin(2 * pi * p[..., 1])

    oper, _ = hho.hho_laplacian(mesh, geom, hdi)
    S = hho.fancy_stabilization(mesh, geom, hdi, oper)
    proj = ops.project_function(mesh, geom, hdi, rhs_fun)
    val = float(jnp.einsum("d,de,e->", proj[0], S[0], proj[0]))
    return float(np.sqrt(val))


def main(argv=None):
    for k in range(0, 6):
        errors = []
        N = 2
        while N < 64:
            errors.append(test_stabilization(N, k))
            N *= 2
        orders = [np.log(errors[i - 1] / errors[i]) / np.log(2.0)
                  for i in range(1, len(errors))]
        print("  ".join(f"{o:.2g}" for o in orders))
    return 0


if __name__ == "__main__":
    sys.exit(main())
