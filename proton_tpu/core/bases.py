"""Batched scaled-monomial bases (replaces cell_basis / face_basis,
src/core/core_bits/bases.hpp:70-291).

The reference evaluates one basis function vector per quadrature point per
cell inside nested loops with integer-power scalar math. Here a single call
evaluates the whole [C, Q, B] (or [F, Q, Bf]) tensor; powers are built with a
cumulative product (no transcendental pow, exact for negative bases).

Cell basis (bases.hpp:93-133): monomials ordered by total degree k then i,
phi_(k,i) = bx^(k-i) * by^i with b = (p - barycenter) / (h/2), h = diameter.
Size (deg+1)(deg+2)/2. The ordering is hierarchical: the first
size(celdeg) entries of a reconstruction-degree basis ARE the cell-degree
basis, which the HHO kernels rely on (hho.hpp:78-80).

Face basis (bases.hpp:241-291): 1D monomials in
ep = 4 * (v . (p - face_bar)) / h^2 with v = face_bar - p0 (p0 = endpoint
with the smaller point id, since face ptids are stored sorted).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ..config import MATMUL_PRECISION  # noqa: F401  (re-export convenience)


def cell_basis_size(degree: int) -> int:
    """(deg+1)(deg+2)/2 (bases.hpp:90,191-194)."""
    return (degree + 1) * (degree + 2) // 2


def face_basis_size(degree: int) -> int:
    """deg + 1 (bases.hpp:258,287-290)."""
    return degree + 1


@lru_cache(maxsize=None)
def _exponent_tables(degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """PX[b], PY[b]: x/y exponents of basis entry b, ordered by total degree
    (bases.hpp:114-127)."""
    px, py = [], []
    for k in range(degree + 1):
        for i in range(k + 1):
            px.append(k - i)
            py.append(i)
    return np.array(px, dtype=np.int32), np.array(py, dtype=np.int32)


def _powers(x, max_pow: int):
    """[..., max_pow+1] tensor of x^0 .. x^max_pow via cumulative product."""
    ones = jnp.ones_like(x[..., None])
    if max_pow == 0:
        return ones
    reps = jnp.cumprod(jnp.repeat(x[..., None], max_pow, axis=-1), axis=-1)
    return jnp.concatenate([ones, reps], axis=-1)


def eval_cell_basis(pts, bar, h, degree: int):
    """phi [..., B] at pts [..., 2]; bar [..., 2] and h [...] broadcast
    against the leading dims of pts (bases.hpp:93-133)."""
    px, py = _exponent_tables(degree)
    b = (pts - bar) / (0.5 * h[..., None])
    powx = _powers(b[..., 0], degree)
    powy = _powers(b[..., 1], degree)
    return powx[..., px] * powy[..., py]


def eval_cell_gradients(pts, bar, h, degree: int):
    """dphi [..., B, 2] (bases.hpp:135-184)."""
    px, py = _exponent_tables(degree)
    b = (pts - bar) / (0.5 * h[..., None])
    ih = 2.0 / h
    powx = _powers(b[..., 0], degree)
    powy = _powers(b[..., 1], degree)
    fx = powx[..., px]
    fy = powy[..., py]
    pxm1 = np.maximum(px - 1, 0)
    pym1 = np.maximum(py - 1, 0)
    jpx = jnp.asarray(px.astype(np.int32))
    jpy = jnp.asarray(py.astype(np.int32))
    dx = jnp.where(jpx > 0, jpx * powx[..., pxm1], 0.0) * ih[..., None]
    dy = jnp.where(jpy > 0, jpy * powy[..., pym1], 0.0) * ih[..., None]
    return jnp.stack([dx * fy, fx * dy], axis=-1)


def eval_face_basis(pts, face_bar, face_base, face_h, degree: int):
    """phi [..., deg+1] at pts [..., 2] on faces described by barycenter,
    base vector (bar - p0) and length (bases.hpp:264-280)."""
    t = pts - face_bar
    dot = jnp.sum(face_base * t, axis=-1)
    ep = 4.0 * dot / (face_h * face_h)
    return _powers(ep, degree)
