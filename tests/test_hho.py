"""HHO kernel properties: polynomial consistency of the reconstruction and
stabilization operators (reference hho.hpp:32-237; the convergence-order
checks of stabilization_test.cpp are in test_convergence.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core import bases, ops
from proton_tpu.methods import hho


def _interpolant(m, g, hdi, f):
    return ops.project_function(m, g, hdi, f)


@pytest.mark.parametrize("kind", ["quad", "poly"])
@pytest.mark.parametrize("k", [0, 1, 2])
def test_reconstruction_polynomial_consistency(kind, k):
    """r(I_T p) = p (up to the mean) for polynomials p of degree <= k+1:
    the defining property of the gradient reconstruction."""
    mk = pt.make_quad_mesh if kind == "quad" else pt.make_poly_mesh
    m = mk(Nx=3, Ny=3)
    g = pt.cell_geometry(m)
    hdi = pt.HHODegreeInfo(k, k)
    recdeg = hdi.reconstruction_degree

    def p(pts):  # polynomial of degree k+1
        return (pts[..., 0] + 0.5 * pts[..., 1]) ** (k + 1)

    oper, data = hho.hho_laplacian(m, g, hdi)
    I = _interpolant(m, g, hdi, p)
    rec = jnp.einsum("crd,cd->cr", oper, I)  # [C, rbs-1] (no constant)

    # compare against the exact projection of p on the reconstruction basis
    Mr = ops.cell_mass_matrices(m, g, recdeg)
    rr = ops.cell_rhs(m, g, recdeg, p)
    exact = ops.cho_solve_batched(Mr, rr[..., None])[..., 0]
    assert np.allclose(np.asarray(rec), np.asarray(exact[:, 1:]),
                       atol=1e-10)

    # data must be symmetric PSD
    D = np.asarray(data)
    assert np.allclose(D, np.swapaxes(D, 1, 2), atol=1e-12)
    assert np.linalg.eigvalsh(D[0]).min() > -1e-10


@pytest.mark.parametrize("kind", ["quad", "poly"])
@pytest.mark.parametrize("k", [0, 1, 2])
def test_fancy_stabilization_annihilates_reconstruction_space(kind, k):
    """s_T(I p, I p) = 0 for polynomials of degree k+1 — the classical HHO
    stabilization property (eqns 21-22, hho.hpp:181)."""
    mk = pt.make_quad_mesh if kind == "quad" else pt.make_poly_mesh
    m = mk(Nx=3, Ny=3)
    g = pt.cell_geometry(m)
    hdi = pt.HHODegreeInfo(k, k)

    def p(pts):
        return (0.7 * pts[..., 0] - pts[..., 1]) ** (k + 1) + pts[..., 0]

    oper, _ = hho.hho_laplacian(m, g, hdi)
    S = hho.fancy_stabilization(m, g, hdi, oper)
    I = _interpolant(m, g, hdi, p)
    val = jnp.einsum("cd,cde,ce->c", I, S, I)
    assert float(jnp.max(jnp.abs(val))) < 1e-10

    Sm = np.asarray(S)
    assert np.allclose(Sm, np.swapaxes(Sm, 1, 2), atol=1e-12)
    assert np.linalg.eigvalsh(Sm[0]).min() > -1e-10


@pytest.mark.parametrize("k", [0, 1])
def test_naive_stabilization_annihilates_cell_space(k):
    """The naive stabilization vanishes on interpolants of polynomials of
    degree <= k (equal order): pi_F(v_F - v_T) = 0 when both traces agree."""
    m = pt.make_quad_mesh(Nx=3, Ny=3)
    g = pt.cell_geometry(m)
    hdi = pt.HHODegreeInfo(k, k)

    def p(pts):
        return (0.3 * pts[..., 0] + pts[..., 1]) ** k

    S = hho.naive_stabilization(m, g, hdi)
    I = _interpolant(m, g, hdi, p)
    val = jnp.einsum("cd,cde,ce->c", I, S, I)
    assert float(jnp.max(jnp.abs(val))) < 1e-10


def test_quad_poly_agree():
    """The quad tensor-GL path and the poly barycenter-fan path must
    produce identical operators on the same (square-cell) mesh; the fan
    path is forced by clearing the all_quads fast-path flag."""
    import dataclasses
    k = 1
    hdi = pt.HHODegreeInfo(k + 1, k)
    mq = pt.make_quad_mesh(Nx=3, Ny=3)
    mp = dataclasses.replace(pt.make_poly_mesh(Nx=3, Ny=3),
                             all_quads=False)
    gq, gp = pt.cell_geometry(mq), pt.cell_geometry(mp)
    oq, dq = hho.hho_laplacian(mq, gq, hdi)
    op_, dp = hho.hho_laplacian(mp, gp, hdi)
    assert np.allclose(np.asarray(dq), np.asarray(dp), atol=1e-11)
    sq = hho.fancy_stabilization(mq, gq, hdi, oq)
    sp = hho.fancy_stabilization(mp, gp, hdi, op_)
    assert np.allclose(np.asarray(sq), np.asarray(sp), atol=1e-11)
