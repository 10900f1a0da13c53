"""Scaled monomial basis checks (reference bases.hpp:70-291)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core import bases


def test_sizes():
    assert [bases.cell_basis_size(k) for k in range(4)] == [1, 3, 6, 10]
    assert [bases.face_basis_size(k) for k in range(4)] == [1, 2, 3, 4]


def test_hierarchical_ordering():
    """First size(k) entries of a degree-(k+1) basis equal the degree-k
    basis — the HHO kernels rely on this (hho.hpp:78-80)."""
    pts = jnp.array([[0.3, 0.7], [0.9, 0.1]])
    bar = jnp.array([0.5, 0.5])
    h = jnp.asarray(1.3)
    lo = bases.eval_cell_basis(pts, bar, h, 2)
    hi = bases.eval_cell_basis(pts, bar, h, 3)
    assert np.allclose(np.asarray(hi[:, :lo.shape[1]]), np.asarray(lo))


def test_cell_basis_values():
    """phi ordering: 1, bx, by, bx^2, bx*by, by^2, ... with
    b = (p - bar)/(h/2) (bases.hpp:98-127)."""
    bar = jnp.array([0.5, 0.5])
    h = jnp.asarray(2.0)
    pt_ = jnp.array([1.5, 0.0])
    phi = np.asarray(bases.eval_cell_basis(pt_, bar, h, 2))
    bx, by = 1.0, -0.5
    assert np.allclose(phi, [1, bx, by, bx * bx, bx * by, by * by])


def test_cell_gradients_vs_jax_grad():
    bar = jnp.array([0.21, 0.8])
    h = jnp.asarray(0.37)
    deg = 3

    def scalar_phi(p):
        return bases.eval_cell_basis(p, bar, h, deg)

    p0 = jnp.array([0.3, 0.65])
    J = jax.jacfwd(scalar_phi)(p0)  # [B, 2]
    dphi = bases.eval_cell_gradients(p0, bar, h, deg)
    assert np.allclose(np.asarray(J), np.asarray(dphi), atol=1e-12)


def test_face_basis_values():
    """ep = 4 (v . t)/h^2 with v = bar - p0 (bases.hpp:264-279): at p1,
    ep = +1; at p0, ep = -1."""
    p0 = jnp.array([0.0, 0.0])
    p1 = jnp.array([0.6, 0.8])
    fbar = 0.5 * (p0 + p1)
    base = fbar - p0
    h = jnp.linalg.norm(p1 - p0)
    phi1 = np.asarray(bases.eval_face_basis(p1, fbar, base, h, 3))
    phi0 = np.asarray(bases.eval_face_basis(p0, fbar, base, h, 3))
    assert np.allclose(phi1, [1, 1, 1, 1])
    assert np.allclose(phi0, [1, -1, 1, -1])
