"""DOF bookkeeping + batched Gram-matrix/RHS/projection operators
(replaces src/core/core_bits/utils.hpp:62-235).

Per-cell/per-face quadrature loops become single einsum contractions over
[C, Q, B] basis tensors; the per-block LLT solves become one batched
Cholesky. Contractions use HIGHEST matmul precision so the f32 TPU path
stays accurate.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from . import bases, quadrature
from .geometry import CellGeom, cell_geometry  # noqa: F401


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


@dataclasses.dataclass(frozen=True)
class HHODegreeInfo:
    """Cell/face/reconstruction degrees with the validity rule of
    hho_degree_info (utils.hpp:62-111): cell_deg must be within one of
    face_deg (and >= 0); otherwise revert to equal order. The
    reconstruction degree is always face_deg + 1."""

    cell_degree: int = 1
    face_degree: int = 1

    def __post_init__(self):
        cd, fd = self.cell_degree, self.face_degree
        ok = (fd > 0 and cd in (fd - 1, fd, fd + 1)) or \
             (fd == 0 and cd in (fd, fd + 1))
        if not ok:
            warnings.warn("Invalid cell degree. Reverting to equal-order")
            object.__setattr__(self, "cell_degree", fd)

    @property
    def reconstruction_degree(self) -> int:
        return self.face_degree + 1

    @classmethod
    def equal_order(cls, degree: int) -> "HHODegreeInfo":
        return cls(degree, degree)


def cell_mass_matrices(mesh, geom: CellGeom, degree: int, di: int = 0):
    """[C, B, B] mass matrices (make_mass_matrix cell overload,
    utils.hpp:113-131); quadrature degree 2*(degree+di)."""
    rule = quadrature.cell_rule(mesh, geom, 2 * (degree + di))
    phi = bases.eval_cell_basis(rule.pts, geom.bar[:, None, :],
                                geom.diam[:, None], degree)
    return _einsum("cq,cqi,cqj->cij", rule.w, phi, phi)


def cell_rhs(mesh, geom: CellGeom, degree: int, f, di: int = 0):
    """[C, B] load vectors for callable f(pts [...,2]) -> [...]
    (make_rhs cell overload, utils.hpp:153-174)."""
    rule = quadrature.cell_rule(mesh, geom, 2 * (degree + di))
    phi = bases.eval_cell_basis(rule.pts, geom.bar[:, None, :],
                                geom.diam[:, None], degree)
    fv = f(rule.pts)
    return _einsum("cq,cqi,cq->ci", rule.w, phi, fv)


def _face_basis_data(face_pts):
    """(bar, base, h) of faces given endpoint coords [..., 2, 2] in
    sorted-ptid order (bases.hpp:253-262)."""
    bar = jnp.mean(face_pts, axis=-2)
    base = bar - face_pts[..., 0, :]
    h = jnp.linalg.norm(face_pts[..., 1, :] - face_pts[..., 0, :], axis=-1)
    return bar, base, h


def face_mass_matrices(face_pts, degree: int, di: int = 0):
    """[..., Bf, Bf] mass matrices of faces given endpoints [..., 2, 2]
    (make_mass_matrix face overload, utils.hpp:133-151)."""
    bar, base, h = _face_basis_data(face_pts)
    rule = quadrature.face_rule(face_pts[..., 0, :], face_pts[..., 1, :],
                                2 * (degree + di))
    phi = bases.eval_face_basis(rule.pts, bar[..., None, :],
                                base[..., None, :], h[..., None], degree)
    return _einsum("...q,...qi,...qj->...ij", rule.w, phi, phi)


def face_rhs(face_pts, degree: int, f, di: int = 0):
    """[..., Bf] load vectors on faces (make_rhs face overload,
    utils.hpp:176-197)."""
    bar, base, h = _face_basis_data(face_pts)
    rule = quadrature.face_rule(face_pts[..., 0, :], face_pts[..., 1, :],
                                2 * (degree + di))
    phi = bases.eval_face_basis(rule.pts, bar[..., None, :],
                                base[..., None, :], h[..., None], degree)
    fv = f(rule.pts)
    return _einsum("...q,...qi,...q->...i", rule.w, phi, fv)


def cho_solve_batched(A, B):
    """Batched SPD solve A X = B via Cholesky (the LLT solves scattered all
    over the reference, e.g. utils.hpp:216,223)."""
    c = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((c, True), B)


def equilibrated_cho_solve(A, B):
    """Cholesky solve with symmetric diagonal equilibration
    A' = D^-1/2 A D^-1/2: scale-invariant and far more robust in float32
    for ill-conditioned SPD blocks (sliver-cut Nitsche stiffness at high
    degree — the reference runs f64 throughout and never hits this)."""
    d = jnp.sqrt(jnp.diagonal(A, axis1=-2, axis2=-1))
    A_ = A / (d[..., :, None] * d[..., None, :])
    B_ = B / d[..., :, None]
    X_ = cho_solve_batched(A_, B_)
    return X_ / d[..., :, None]


def robust_spd_solve(A, B):
    """Batched SPD solve that survives float32 rounding on marginal
    blocks: equilibrated Cholesky, with a pivoted-LU fallback on a
    trace-eps-shifted copy for any block whose Cholesky produced NaN (a
    perturbation at the dtype's rounding level; never selected in f64).
    A [..., n, n], B [..., n, m]."""
    X_chol = equilibrated_cho_solve(A, B)
    eps = jnp.finfo(A.dtype).eps
    tr = jnp.trace(A, axis1=-2, axis2=-1) / A.shape[-1]
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    A_reg = A + (16.0 * eps * tr)[..., None, None] * eye
    if A.dtype == jnp.float64 and jax.default_backend() == "tpu":
        # XLA:TPU has no f64 LuDecomposition; the shifted Cholesky is an
        # equivalent fallback here (the blocks are SPD at f64 rounding —
        # the LU branch exists for f32, where they can round indefinite).
        # On CPU the LU fallback is kept even at f64, so a genuinely
        # indefinite block (beyond rounding) still solves instead of
        # propagating NaN.
        X_fb = equilibrated_cho_solve(A_reg, B)
    else:
        X_fb = jnp.linalg.solve(A_reg, B)
    bad = jnp.any(jnp.isnan(X_chol), axis=(-2, -1), keepdims=True)
    return jnp.where(bad, X_fb, X_chol)


def spd_inverse(A):
    """Batched SPD inverse via robust_spd_solve against the identity.
    Use instead of jnp.linalg.inv whenever the dtype can be f64 and the
    code can run on TPU: XLA:TPU has no f64 LuDecomposition, so
    jnp.linalg.inv fails to compile there ("Only F32 and C64 types")."""
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    return robust_spd_solve(A, jnp.broadcast_to(eye, A.shape))


def project_function(mesh, geom: CellGeom, hdi: HHODegreeInfo, f,
                     di: int = 0):
    """L2-projection of f onto the per-cell HHO space [C, cbs + nF*fbs]
    (project_function, utils.hpp:199-227). Padded face slots get zeros."""
    cbs = bases.cell_basis_size(hdi.cell_degree)
    fbs = bases.face_basis_size(hdi.face_degree)
    cm = cell_mass_matrices(mesh, geom, hdi.cell_degree, di)
    cr = cell_rhs(mesh, geom, hdi.cell_degree, f, di)
    cell_dofs = cho_solve_batched(cm, cr[..., None])[..., 0]

    fm = face_mass_matrices(geom.face_pts, hdi.face_degree, di)
    fr = face_rhs(geom.face_pts, hdi.face_degree, f, di)
    face_dofs = cho_solve_batched(fm, fr[..., None])[..., 0]  # [C, nF, fbs]
    face_dofs = jnp.where(geom.edge_valid[..., None], face_dofs, 0.0)

    C = mesh.num_cells
    return jnp.concatenate(
        [cell_dofs.reshape(C, cbs), face_dofs.reshape(C, -1)], axis=1)


def condition_number(A):
    """SVD condition number (utils.hpp:229-235); batched."""
    s = jnp.linalg.svd(A, compute_uv=False)
    return s[..., 0] / s[..., -1]
