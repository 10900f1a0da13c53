"""Batched HHO operators (replaces src/methods/hho_bits/hho.hpp:32-237).

The reference builds one small dense operator per cell inside a Python-style
loop; here each builder produces the operator for *every* cell in one shot:

- gradient reconstruction  -> (oper [C, rbs-1, d], data [C, d, d])
- naive stabilization      -> [C, d, d]
- fancy (HHO) stabilization-> [C, d, d]

with d = cbs + nF*fbs and nF the (padded) max face count per cell. Invalid
(padded) face slots are masked by zeroing their quadrature weights, so the
same kernel serves quad and polygonal meshes.

All contractions are einsums feeding the MXU; the only factorizations are
batched Cholesky solves of tiny SPD blocks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..core import bases, quadrature
from ..core.geometry import CellGeom
from ..core.ops import HHODegreeInfo, cho_solve_batched, _face_basis_data


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


def local_dof_count(mesh, hdi: HHODegreeInfo) -> int:
    cbs = bases.cell_basis_size(hdi.cell_degree)
    fbs = bases.face_basis_size(hdi.face_degree)
    return cbs + mesh.max_pts * fbs


class FaceEvals(NamedTuple):
    """Basis/geometry evaluations on all cell-face quadrature points.

    Shapes: w [C,nF,Q]; cphi [C,nF,Q,rbs]; cdphi [C,nF,Q,rbs,2];
    fphi [C,nF,Q,fbs].
    """

    w: jnp.ndarray
    cphi: jnp.ndarray
    cdphi: jnp.ndarray
    fphi: jnp.ndarray


def _face_evals(geom: CellGeom, rec_degree: int, fac_degree: int,
                quad_degree: int, want_grads: bool) -> FaceEvals:
    """Evaluate cell (reconstruction-degree) and face bases at the GL points
    of every face of every cell; padded faces get zero weights."""
    frule = quadrature.face_rule(geom.face_pts[..., 0, :],
                                 geom.face_pts[..., 1, :], quad_degree)
    w = frule.w * geom.edge_valid[..., None]
    cphi = bases.eval_cell_basis(frule.pts, geom.bar[:, None, None, :],
                                 geom.diam[:, None, None], rec_degree)
    cdphi = (bases.eval_cell_gradients(frule.pts, geom.bar[:, None, None, :],
                                       geom.diam[:, None, None], rec_degree)
             if want_grads else None)
    fbar, fbase, fh = _face_basis_data(geom.face_pts)
    fphi = bases.eval_face_basis(frule.pts, fbar[..., None, :],
                                 fbase[..., None, :], fh[..., None],
                                 fac_degree)
    return FaceEvals(w, cphi, cdphi, fphi)


def hho_laplacian(mesh, geom: CellGeom, hdi: HHODegreeInfo
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched gradient reconstruction (make_hho_laplacian,
    hho.hpp:32-96).

    Returns (oper [C, rbs-1, d], data [C, d, d]) where data is the
    reconstruction bilinear form a_T(., .) = (grad r(.), grad r(.)).
    """
    recdeg = hdi.reconstruction_degree
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    rbs = bases.cell_basis_size(recdeg)
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    nF = mesh.max_pts
    C = mesh.num_cells
    d = cbs + nF * fbs

    # cell stiffness (hho.hpp:55-64)
    rule = quadrature.cell_rule(mesh, geom, 2 * recdeg)
    dphi = bases.eval_cell_gradients(rule.pts, geom.bar[:, None, :],
                                     geom.diam[:, None], recdeg)
    stiff = _einsum("cq,cqix,cqjx->cij", rule.w, dphi, dphi)
    gr_lhs = stiff[:, 1:, 1:]

    # face coupling (grad r . n, v_F - v_T) (hho.hpp:66-85)
    fe = _face_evals(geom, recdeg, facdeg, 2 * facdeg, want_grads=True)
    dn = _einsum("cfqrx,cfx->cfqr", fe.cdphi[..., 1:, :], geom.normals)
    face_blocks = _einsum("cfq,cfqr,cfqb->cfrb", fe.w, dn, fe.fphi)
    cell_corr = _einsum("cfq,cfqr,cfqk->crk", fe.w, dn, fe.cphi[..., :cbs])

    gr_rhs = jnp.concatenate(
        [stiff[:, 1:, :cbs] - cell_corr,
         jnp.moveaxis(face_blocks, 1, 2).reshape(C, rbs - 1, nF * fbs)],
        axis=2)

    oper = cho_solve_batched(gr_lhs, gr_rhs)           # hho.hpp:92
    data = _einsum("crm,crn->cmn", gr_rhs, oper)       # hho.hpp:93
    return oper, data


def naive_stabilization(mesh, geom: CellGeom, hdi: HHODegreeInfo):
    """Batched Ladyzhenskaya-type stabilization (1/h) sum_F ||pi_F(v_F -
    v_T)||^2 (make_hho_naive_stabilization, hho.hpp:99-148).

    NOTE: mirrors the reference exactly, including h = measure(cl) — the
    cell *area*, not diameter (hho.hpp:119).
    """
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    nF = mesh.max_pts
    d = cbs + nF * fbs

    fe = _face_evals(geom, celdeg, facdeg, 2 * facdeg, want_grads=False)
    mass = _einsum("cfq,cfqi,cfqj->cfij", fe.w, fe.fphi, fe.fphi)
    trace = _einsum("cfq,cfqi,cfqk->cfik", fe.w, fe.fphi, fe.cphi)

    # padded faces have all-zero mass blocks; substitute I so the batched
    # Cholesky stays well-posed (their contribution is masked out below).
    eye_f = jnp.eye(fbs, dtype=mass.dtype)
    safe_mass = jnp.where(geom.edge_valid[..., None, None], mass, eye_f)
    ratio = cho_solve_batched(safe_mass, trace)        # pi_F trace (hho.hpp:142)

    # oper[f] = [ratio | 0 ... -I ... 0] (hho.hpp:126-142)
    neg_eyes = np.zeros((nF, fbs, nF * fbs))
    for f in range(nF):
        neg_eyes[f, :, f * fbs:(f + 1) * fbs] = -np.eye(fbs)
    neg_eyes = jnp.asarray(neg_eyes.astype(mass.dtype))
    oper = jnp.concatenate(
        [ratio, jnp.broadcast_to(neg_eyes[None],
                                 (mesh.num_cells, nF, fbs, nF * fbs))],
        axis=3)

    h = geom.meas  # cell area (hho.hpp:119)
    mo = _einsum("cfij,cfjs->cfis", mass, oper)
    mo = jnp.where(geom.edge_valid[..., None, None], mo, 0.0)
    data = _einsum("cfir,cfis->crs", oper, mo)
    return data / h[:, None, None]


def fancy_stabilization(mesh, geom: CellGeom, hdi: HHODegreeInfo,
                        reconstruction):
    """Batched full HHO stabilization pi_F(v_F - p_T v) + pi_F(v_T -
    pi_T p_T v) (make_hho_fancy_stabilization, hho.hpp:155-237).

    NOTE: uses h = diameter(cl) — the cell diameter (hho.hpp:201), unlike
    the naive variant.
    """
    recdeg = hdi.reconstruction_degree
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    rbs = bases.cell_basis_size(recdeg)
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    nF = mesh.max_pts
    C = mesh.num_cells
    d = cbs + nF * fbs
    R = reconstruction  # [C, rbs-1, d]

    # cell mass at reconstruction degree (hho.hpp:173-179)
    rule = quadrature.cell_rule(mesh, geom, 2 * recdeg)
    phi = bases.eval_cell_basis(rule.pts, geom.bar[:, None, :],
                                geom.diam[:, None], recdeg)
    mass = _einsum("cq,cqi,cqj->cij", rule.w, phi, phi)

    # proj1 = v_T - pi_T p_T v (hho.hpp:184-190)
    M1 = mass[:, :cbs, :cbs]
    M2 = mass[:, :cbs, 1:rbs]
    proj1 = -cho_solve_batched(M1, _einsum("cir,crd->cid", M2, R))
    eye_c = jnp.zeros((cbs, d)).at[:, :cbs].set(jnp.eye(cbs))
    proj1 = proj1 + eye_c.astype(proj1.dtype)

    # face mass/trace at reconstruction degree (hho.hpp:199-216)
    fe = _face_evals(geom, recdeg, facdeg, 2 * facdeg, want_grads=False)
    fmass = _einsum("cfq,cfqi,cfqj->cfij", fe.w, fe.fphi, fe.fphi)
    ftrace = _einsum("cfq,cfqi,cfqk->cfik", fe.w, fe.fphi, fe.cphi)

    eye_f = jnp.eye(fbs, dtype=fmass.dtype)
    safe_mass = jnp.where(geom.edge_valid[..., None, None], fmass, eye_f)

    # proj2 = pi_F p_T v - v_F (hho.hpp:222-226)
    MR1 = ftrace[..., 1:rbs]
    proj2 = cho_solve_batched(safe_mass, _einsum("cfir,crd->cfid", MR1, R))
    neg_eyes = np.zeros((nF, fbs, d))
    for f in range(nF):
        neg_eyes[f, :, cbs + f * fbs:cbs + (f + 1) * fbs] = -np.eye(fbs)
    proj2 = proj2 + jnp.asarray(neg_eyes.astype(proj2.dtype))[None]

    # proj3 = pi_F(v_T - pi_T p_T v) (hho.hpp:229-230)
    MR2 = ftrace[..., :cbs]
    proj3 = cho_solve_batched(safe_mass,
                              _einsum("cfik,ckd->cfid", MR2, proj1))
    BRF = proj2 + proj3

    h = geom.diam  # cell diameter (hho.hpp:201)
    mB = _einsum("cfij,cfjs->cfis", fmass, BRF)
    mB = jnp.where(geom.edge_valid[..., None, None], mB, 0.0)
    data = _einsum("cfir,cfis->crs", BRF, mB)
    return data / h[:, None, None]
