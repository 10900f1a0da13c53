"""Quadrature exactness to machine precision on polynomials (the test
strategy SURVEY.md section 4 prescribes for the rebuild)."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core import quadrature as quad


@pytest.mark.parametrize("deg", range(0, 12))
def test_gauss_legendre_exact(deg):
    x, w = quad.gauss_legendre(deg)
    for p in range(deg + 1):
        exact = (1 - (-1) ** (p + 1)) / (p + 1)
        assert np.isclose(np.sum(w * x ** p), exact, atol=1e-13)


@pytest.mark.parametrize("deg", [1, 3, 7, 11, 15, 21])
def test_golub_welsch_matches_leggauss(deg):
    x1, w1 = quad.gauss_legendre(deg)
    x2, w2 = quad.golub_welsch(deg)
    assert np.allclose(np.sort(x1), np.sort(x2), atol=1e-12)
    assert np.allclose(w1[np.argsort(x1)], w2[np.argsort(x2)], atol=1e-12)


@pytest.mark.parametrize("deg", range(1, 13))
def test_duffy_triangle_exact(deg):
    """Exactness on all monomials x^a y^b, a+b <= deg, over an arbitrary
    triangle (replaces the reference Dunavant tables, degree-capped at 8)."""
    tri = jnp.array([[0.2, -0.1], [1.3, 0.4], [0.5, 1.7]])
    rule = quad.triangle_rule(tri[0], tri[1], tri[2], deg)

    # exact monomial integrals by very high order reference rule
    ref = quad.triangle_rule(tri[0], tri[1], tri[2], deg + 8)
    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            f = rule.pts[..., 0] ** a * rule.pts[..., 1] ** b
            fr = ref.pts[..., 0] ** a * ref.pts[..., 1] ** b
            assert np.isclose(float(jnp.sum(rule.w * f)),
                              float(jnp.sum(ref.w * fr)),
                              rtol=1e-12, atol=1e-14)


def test_duffy_weights_sum_to_area():
    tri = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
    rule = quad.triangle_rule(tri[0], tri[1], tri[2], 5)
    assert np.isclose(float(jnp.sum(rule.w)), 2.0)


@pytest.mark.parametrize("deg", [0, 1, 2, 4, 7])
def test_quad_cell_rule_exact(deg):
    """Tensor-GL on an affine cell integrates x^a y^b exactly."""
    m = pt.make_quad_mesh(Nx=2, Ny=2)
    g = pt.cell_geometry(m)
    rule = quad.cell_rule(m, g, deg)
    for a in range(deg + 1):
        for b in range(deg + 1):
            if a + b > deg:
                continue
            val = float(jnp.sum(rule.w * rule.pts[..., 0] ** a
                                * rule.pts[..., 1] ** b))
            exact = 1.0 / ((a + 1) * (b + 1))
            assert np.isclose(val, exact, atol=1e-13), (a, b)


def test_quad_rule_on_distorted_quad():
    """Bilinear Jacobian: integral of 1 equals the quad's area."""
    pts4 = jnp.array([[[0.0, 0.0], [1.2, 0.1], [0.9, 1.3], [-0.2, 0.8]]])
    rule = quad.quad_cell_rule(pts4, 4)
    # shoelace area
    p = np.asarray(pts4[0])
    area = 0.5 * abs(sum(p[i, 0] * p[(i + 1) % 4, 1] -
                         p[(i + 1) % 4, 0] * p[i, 1] for i in range(4)))
    assert np.isclose(float(jnp.sum(rule.w)), area, atol=1e-13)


@pytest.mark.parametrize("deg", [0, 1, 3, 6])
def test_poly_cell_rule_matches_quad(deg):
    import dataclasses
    mq = pt.make_quad_mesh(Nx=3, Ny=3)
    # force the barycenter-fan path (all_quads would take tensor GL)
    mp = dataclasses.replace(pt.make_poly_mesh(Nx=3, Ny=3),
                             all_quads=False)
    gq, gp = pt.cell_geometry(mq), pt.cell_geometry(mp)
    rq = quad.cell_rule(mq, gq, deg)
    rp = quad.cell_rule(mp, gp, deg)
    f = lambda pts: (1.3 + pts[..., 0]) ** deg + pts[..., 1] ** deg
    vq = float(jnp.sum(rq.w * f(rq.pts)))
    vp = float(jnp.sum(rp.w * f(rp.pts)))
    assert np.isclose(vq, vp, rtol=1e-12)


def test_face_rule_exact():
    p0 = jnp.array([0.0, 0.0])
    p1 = jnp.array([1.0, 2.0])
    rule = quad.face_rule(p0, p1, 5)
    # integral of x*y along the segment = int_0^1 t*2t*|p1-p0| dt
    L = np.sqrt(5.0)
    val = float(jnp.sum(rule.w * rule.pts[..., 0] * rule.pts[..., 1]))
    assert np.isclose(val, 2.0 / 3.0 * L, atol=1e-13)
