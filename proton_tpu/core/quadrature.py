"""Quadrature rules, batched over whole element sets.

Reference behavior being reproduced (src/core/core_bits/quadratures.hpp):

- 1D Gauss-Legendre on [-1, 1]: an even requested degree d is bumped to d+1,
  then n = (d+1)/2 nodes are used (quadratures.hpp:78-95). The reference
  hardcodes n <= 5 and falls back to a Golub-Welsch eigensolve; here both are
  host-side NumPy (``leggauss`` == Golub-Welsch to machine precision) and the
  nodes ship to device as constants.
- Quad cells: tensor-product GL mapped through the bilinear reference map
  with the analytic Jacobian (quadratures.hpp:311-375).
- Polygonal cells: fan-triangulation from the barycenter, one triangle rule
  per edge (quadratures.hpp:377-402).
- Faces: GL on the segment, weight scaled by length/2
  (quadratures.hpp:404-432).

Design deviation (documented): the reference uses Dunavant symmetric
triangle tables capped at degree 8 (quadratures_dunavant.hpp:27-130,
quadratures.hpp:245-246). We instead build collapsed tensor-product
(Duffy-transform) rules of *arbitrary* degree from GL nodes. Both are exact
for polynomials up to the requested degree, so all integrals of polynomial
integrands agree to rounding, and there is no degree cap.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import MATMUL_PRECISION, np_real_dtype


# ---------------------------------------------------------------------------
# Host-side 1D rules
# ---------------------------------------------------------------------------

def _gl_num_nodes(degree: int) -> int:
    """Node-count rule of gauss_legendre (quadratures.hpp:81-87): even
    degrees are bumped by one, then n = (degree+1)/2."""
    if degree % 2 == 0:
        degree += 1
    return (degree + 1) // 2


@lru_cache(maxsize=None)
def gauss_legendre(degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes/weights on [-1, 1] exact to ``degree``
    (quadratures.hpp:78-158). Returns (x [n], w [n]), sum(w) == 2."""
    n = _gl_num_nodes(degree)
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


@lru_cache(maxsize=None)
def golub_welsch(degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """Golub-Welsch construction via the Jacobi-matrix eigendecomposition
    (quadratures.hpp:32-75). Kept for API parity with the reference; agrees
    with :func:`gauss_legendre` to machine precision."""
    n = _gl_num_nodes(degree)
    if n == 1:
        return np.zeros(1), np.full(1, 2.0)
    i = np.arange(1, n)
    beta = np.sqrt(1.0 / (4.0 - 1.0 / (i * i)))
    J = np.diag(beta, -1) + np.diag(beta, 1)
    nodes, vecs = np.linalg.eigh(J)
    weights = 2.0 * vecs[0, :] ** 2
    return nodes, weights


edge_quadrature = gauss_legendre  # alias, quadratures.hpp:160-165


@lru_cache(maxsize=None)
def duffy_triangle(degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """Collapsed (Duffy) tensor rule on the reference triangle, exact for
    total degree ``degree``.

    Returns (lam [n, 3], wbar [n]) with barycentric coordinates and weights
    normalized so that sum(wbar) == 1; a physical rule is
    qp = lam @ [p0, p1, p2], qw = area * wbar — the same contract as the
    reference's Dunavant wrapper (quadratures.hpp:255-268).
    """
    degree = max(degree, 1)
    # x = u, y = v(1-u); integrand of total degree d gains a (1-u) Jacobian:
    # degree d+1 in u, d in v.
    nu = (degree + 1) // 2 + 1
    nv = (degree + 2) // 2
    xu, wu = np.polynomial.legendre.leggauss(nu)
    xv, wv = np.polynomial.legendre.leggauss(nv)
    u = (xu + 1.0) / 2.0
    v = (xv + 1.0) / 2.0
    wu = wu / 2.0
    wv = wv / 2.0
    U, V = np.meshgrid(u, v, indexing="ij")
    WU, WV = np.meshgrid(wu, wv, indexing="ij")
    x = U.ravel()
    y = (V * (1.0 - U)).ravel()
    w = (WU * WV * (1.0 - U)).ravel()  # sums to 1/2 == unit triangle area
    lam = np.stack([1.0 - x - y, x, y], axis=1)
    return lam, 2.0 * w


# ---------------------------------------------------------------------------
# Device-side batched rules
# ---------------------------------------------------------------------------

class QuadRule(NamedTuple):
    """Batched quadrature: points [..., Q, 2] and weights [..., Q]."""

    pts: jnp.ndarray
    w: jnp.ndarray


def triangle_rule(p0, p1, p2, degree: int) -> QuadRule:
    """Batched physical-triangle rule (triangle_quadrature,
    quadratures.hpp:238-271). p0/p1/p2: [..., 2]."""
    lam, wbar = duffy_triangle(degree)
    rdt = p0.dtype  # follow input dtype (mixed-precision paths)
    lam = jnp.asarray(lam, dtype=rdt)
    wbar = jnp.asarray(wbar, dtype=rdt)
    v0 = p1 - p0
    v1 = p2 - p0
    area = 0.5 * jnp.abs(v0[..., 0] * v1[..., 1] - v0[..., 1] * v1[..., 0])
    pts = (lam[:, 0, None] * p0[..., None, :] +
           lam[:, 1, None] * p1[..., None, :] +
           lam[:, 2, None] * p2[..., None, :])
    w = area[..., None] * wbar
    return QuadRule(pts, w)


def quad_cell_rule(pts4, degree: int) -> QuadRule:
    """Tensor GL rule on bilinear quads with analytic Jacobian
    (integrate(quad cell), quadratures.hpp:311-375).

    pts4: [..., 4, 2] CCW corner coordinates.
    Returns points [..., n*n, 2], weights [..., n*n].
    """
    x, w = gauss_legendre(degree)
    rdt = pts4.dtype  # follow input dtype (mixed-precision paths)
    xi = jnp.asarray(np.tile(x, len(x)), dtype=rdt)         # inner: x fast
    eta = jnp.asarray(np.repeat(x, len(x)), dtype=rdt)      # outer: y slow
    ww = jnp.asarray(np.repeat(w, len(w)) * np.tile(w, len(w)), dtype=rdt)

    p0, p1, p2, p3 = (pts4[..., i, :] for i in range(4))
    # bilinear map (quadratures.hpp:331-343)
    s0 = (1 - xi) * (1 - eta)
    s1 = (1 + xi) * (1 - eta)
    s2 = (1 + xi) * (1 + eta)
    s3 = (1 - xi) * (1 + eta)
    pts = 0.25 * (p0[..., None, :] * s0[..., None] +
                  p1[..., None, :] * s1[..., None] +
                  p2[..., None, :] * s2[..., None] +
                  p3[..., None, :] * s3[..., None])
    # analytic Jacobian (quadratures.hpp:345-352)
    j11 = 0.25 * ((p1 - p0)[..., None, 0] * (1 - eta) + (p2 - p3)[..., None, 0] * (1 + eta))
    j12 = 0.25 * ((p1 - p0)[..., None, 1] * (1 - eta) + (p2 - p3)[..., None, 1] * (1 + eta))
    j21 = 0.25 * ((p3 - p0)[..., None, 0] * (1 - xi) + (p2 - p1)[..., None, 0] * (1 + xi))
    j22 = 0.25 * ((p3 - p0)[..., None, 1] * (1 - xi) + (p2 - p1)[..., None, 1] * (1 + xi))
    jac = jnp.abs(j11 * j22 - j12 * j21)
    return QuadRule(pts, ww * jac)


def poly_cell_rule(pts, npts, bar, degree: int) -> QuadRule:
    """Barycenter-fan rule on (padded) polygons (integrate(poly cell),
    quadratures.hpp:377-402): one triangle (p_k, p_{k+1}, bar) per edge.

    pts: [C, Pmax, 2], npts: [C], bar: [C, 2].
    Returns points [C, Pmax*Qt, 2], weights [C, Pmax*Qt] (padded triangles
    are degenerate -> zero weights).
    """
    C, P, _ = pts.shape
    k = jnp.arange(P)[None, :]
    valid = k < npts[:, None]
    i1 = jnp.where(k + 1 < npts[:, None], k + 1, 0)
    i1 = jnp.where(valid, i1, jnp.minimum(k, npts[:, None] - 1))
    e0 = pts
    e1 = jnp.take_along_axis(pts, i1[..., None].astype(jnp.int32), axis=1)
    rule = triangle_rule(e0, e1, jnp.broadcast_to(bar[:, None, :], e0.shape),
                         degree)
    Q = rule.w.shape[-1]
    return QuadRule(rule.pts.reshape(C, P * Q, 2), rule.w.reshape(C, P * Q))


def cell_rule(mesh, geom, degree: int) -> QuadRule:
    """integrate(msh, cl, degree) for every cell at once
    (quadratures.hpp:311-402).

    Fast path: a "poly" mesh whose cells are all quadrilaterals
    (``mesh.all_quads``) uses the tensor-GL bilinear-map rule — exact for
    the same polynomial degrees as the barycenter fan (the bilinear
    Jacobian raises the per-axis degree by one, which the GL node-count
    rule already covers) with ~4x fewer points.
    """
    from .geometry import cell_points
    if mesh.kind == "quad" or mesh.all_quads:
        return quad_cell_rule(cell_points(mesh)[..., :4, :], degree)
    return poly_cell_rule(cell_points(mesh), mesh.cell_npts, geom.bar, degree)


def bilinear_ref_to_phys(pts4, ref_pts):
    """The quad reference transform (reference_transform::ref_to_phys,
    quadratures.hpp:274-308): map points of [-1,1]^2 through the bilinear
    map of each cell. pts4 [..., 4, 2], ref_pts [R, 2] -> [..., R, 2]."""
    xi = ref_pts[..., 0]
    eta = ref_pts[..., 1]
    s = jnp.stack([0.25 * (1 - xi) * (1 - eta),
                   0.25 * (1 + xi) * (1 - eta),
                   0.25 * (1 + xi) * (1 + eta),
                   0.25 * (1 - xi) * (1 + eta)], axis=-1)     # [R, 4]
    return jnp.einsum("rk,...kx->...rx", s, pts4,
                      precision=MATMUL_PRECISION)


def face_rule(fp0, fp1, degree: int) -> QuadRule:
    """GL rule on segments (integrate(msh, fc, degree),
    quadratures.hpp:404-432). fp0/fp1: [..., 2] endpoints."""
    x, w = gauss_legendre(degree)
    rdt = fp0.dtype  # follow input dtype (mixed-precision paths)
    t = jnp.asarray(x, dtype=rdt)
    ww = jnp.asarray(w, dtype=rdt)
    meas = jnp.linalg.norm(fp1 - fp0, axis=-1)
    pts = (0.5 * (1 - t)[:, None] * fp0[..., None, :] +
           0.5 * (1 + t)[:, None] * fp1[..., None, :])
    return QuadRule(pts, 0.5 * meas[..., None] * ww)
