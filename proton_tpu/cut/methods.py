"""Batched cutHHO operators over the cut-cell element class
(replaces the operator builders in apps/cuthho/cuthho_square.cpp:293-666
and src/methods/cuthho_bits/cuthho_utils.hpp).

Element-class batching: classification (classify.py) marks cells NEG / POS /
CUT; the host gathers the cut-cell indices once and these kernels run on the
compact [Cc, ...] batch. Uncut cells keep using the fitted kernels of
proton_tpu.methods.hho; the drivers merge the two classes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..core import bases
from ..core.geometry import CellGeom
from ..core.ops import HHODegreeInfo, cho_solve_batched, \
    equilibrated_cho_solve, robust_spd_solve, _face_basis_data
from .classify import CutData, LOC_CUT, LOC_NEG, LOC_POS
from .levelset import LevelSet
from .quadrature import SidePolygon, interface_rule, side_cell_rule, \
    side_face_rule, triangulation_points

# Nitsche penalty (cell_eta, cuthho_square.cpp:301-306). NOTE: a fixed
# eta = 5 loses coercivity on sliver cuts at reconstruction degree >= 3
# (observed: one indefinite cell at k=2, 64^2 — also true of the
# reference, which only ever runs low degrees); callers should scale
# eta ~ (k+1)^2 for higher degrees (see bench.py).
CELL_ETA = 5.0


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


class InterfaceParams(NamedTuple):
    """params{kappa_1, kappa_2, eta} (cuthho_square.cpp:293-299)."""

    kappa_1: float = 1.0
    kappa_2: float = 1.0
    eta: float = 5.0


class CutCellBatch(NamedTuple):
    """Gathered per-cut-cell data (the SoA slice of cell UserData plus
    geometry, restricted to cells where cell_loc == LOC_CUT)."""

    ids: jnp.ndarray         # [Cc] cell indices
    pts: jnp.ndarray         # [Cc, P, 2]
    npts: jnp.ndarray        # [Cc]
    geom: CellGeom           # all fields gathered to [Cc, ...]
    node_loc: jnp.ndarray    # [Cc, P] corner LOC codes
    face_loc: jnp.ndarray    # [Cc, nF]
    face_isect: jnp.ndarray  # [Cc, nF, 2]
    fnode_loc: jnp.ndarray   # [Cc, nF, 2] LOC of each face endpoint
    interface: jnp.ndarray   # [Cc, R+1, 2]


def make_cut_batch(mesh, geom: CellGeom, cutdata: CutData,
                   ids) -> CutCellBatch:
    """Gather the cut-cell class. ``ids`` comes from the host
    (np.nonzero(cell_loc == LOC_CUT)), giving static shapes."""
    ids = jnp.asarray(ids, dtype=jnp.int32)
    from ..core.geometry import cell_points
    sub_geom = CellGeom(*(f[ids] for f in geom))
    cf = mesh.cell_faces[ids]
    fn = mesh.face_ptids[cf]                    # [Cc, nF, 2]
    return CutCellBatch(
        ids=ids,
        pts=cell_points(mesh)[ids],
        npts=mesh.cell_npts[ids],
        geom=sub_geom,
        node_loc=cutdata.node_loc[mesh.cell_ptids[ids]],
        face_loc=cutdata.face_loc[cf],
        face_isect=cutdata.face_isect[cf],
        fnode_loc=cutdata.node_loc[fn],
        interface=cutdata.interface[ids],
    )


def side_polygon(batch: CutCellBatch, side: int) -> SidePolygon:
    return triangulation_points(batch.pts, batch.npts, batch.node_loc,
                                batch.interface, side)


def _side_cell_evals(batch, poly, degree, quad_degree, want_grads=True):
    """Cell-basis evaluations on the side quadrature of each cut cell."""
    rule = side_cell_rule(poly, quad_degree)
    g = batch.geom
    phi = bases.eval_cell_basis(rule.pts, g.bar[:, None, :],
                                g.diam[:, None], degree)
    dphi = (bases.eval_cell_gradients(rule.pts, g.bar[:, None, :],
                                      g.diam[:, None], degree)
            if want_grads else None)
    return rule, phi, dphi


def _side_face_evals(batch, cell_degree, face_degree, quad_degree,
                     side, want_grads=False):
    """Cell+face basis evaluations on the (sub-segment) quadrature of each
    face of each cut cell; off-side faces get zero weights."""
    g = batch.geom
    rule = side_face_rule(g.face_pts, batch.face_loc, batch.face_isect,
                          batch.fnode_loc[..., 0], batch.fnode_loc[..., 1],
                          quad_degree, side)
    w = rule.w * g.edge_valid[..., None]
    cphi = bases.eval_cell_basis(rule.pts, g.bar[:, None, None, :],
                                 g.diam[:, None, None], cell_degree)
    cdphi = (bases.eval_cell_gradients(rule.pts, g.bar[:, None, None, :],
                                       g.diam[:, None, None], cell_degree)
             if want_grads else None)
    fbar, fbase, fh = _face_basis_data(g.face_pts)
    fphi = bases.eval_face_basis(rule.pts, fbar[..., None, :],
                                 fbase[..., None, :], fh[..., None],
                                 face_degree)
    return w, cphi, cdphi, fphi, rule.pts


def _interface_evals(batch, poly, ls: LevelSet, degree, quad_degree):
    """Basis + level-set normal on the interface quadrature."""
    g = batch.geom
    irule = interface_rule(batch.interface, poly.bar, quad_degree)
    phi = bases.eval_cell_basis(irule.pts, g.bar[:, None, :],
                                g.diam[:, None], degree)
    dphi = bases.eval_cell_gradients(irule.pts, g.bar[:, None, :],
                                     g.diam[:, None], degree)
    n = ls.normal(irule.pts)
    return irule, phi, dphi, n


def cut_hho_laplacian(batch: CutCellBatch, ls: LevelSet,
                      hdi: HHODegreeInfo, side: int,
                      eta: float = CELL_ETA
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nitsche fictitious-domain reconstruction on cut cells
    (make_hho_laplacian cut overload, cuthho_square.cpp:308-388).

    Full-rank gr_lhs (constant kept, made invertible by the Nitsche
    penalty); returns (oper [Cc, rbs, d], data [Cc, d, d]).
    """
    recdeg = hdi.reconstruction_degree
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    rbs = bases.cell_basis_size(recdeg)
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    nF = batch.pts.shape[1]
    Cc = batch.pts.shape[0]

    poly = side_polygon(batch, side)

    # side stiffness (cuthho_square.cpp:337-342)
    rule, _, dphi = _side_cell_evals(batch, poly, recdeg, 2 * recdeg)
    stiff = _einsum("cq,cqix,cqjx->cij", rule.w, dphi, dphi)

    # Nitsche interface terms (cuthho_square.cpp:347-360)
    hT = batch.geom.meas  # full cell area (:344)
    irule, iphi, idphi, n = _interface_evals(batch, poly, ls, recdeg,
                                             2 * recdeg)
    dn = _einsum("cqix,cqx->cqi", idphi, n)
    A = _einsum("cq,cqi,cqj->cij", irule.w, iphi, dn)
    M = _einsum("cq,cqi,cqj->cij", irule.w, iphi, iphi)
    stiff = stiff - A - jnp.swapaxes(A, 1, 2) \
        + M * (eta / hT)[:, None, None]

    # face couplings at 2*recdeg quadrature, full-rbs gradients
    # (cuthho_square.cpp:366-383 — unlike the fitted kernel, the constant
    # row is kept and the face rule degree is 2*recdeg)
    w, cphi, cdphi, fphi, _ = _side_face_evals(batch, recdeg, facdeg,
                                               2 * recdeg, side,
                                               want_grads=True)
    fdn = _einsum("cfqrx,cfx->cfqr", cdphi, batch.geom.normals)
    face_blocks = _einsum("cfq,cfqr,cfqb->cfrb", w, fdn, fphi)
    cell_corr = _einsum("cfq,cfqr,cfqk->crk", w, fdn, cphi[..., :cbs])

    gr_rhs = jnp.concatenate(
        [stiff[:, :, :cbs] - cell_corr,
         jnp.moveaxis(face_blocks, 1, 2).reshape(Cc, rbs, nF * fbs)],
        axis=2)

    # LLT in the reference (:385); equilibrated here for robustness on
    # sliver cuts. In float32 a sliver's Nitsche stiffness can round to an
    # indefinite matrix (observed: min eig +4e-6 in f64, negative in f32 at
    # k=2); cells whose Cholesky NaNs fall back to a pivoted LU of a
    # trace-eps-shifted copy — a perturbation at the dtype's rounding
    # level, never selected in f64.
    oper = robust_spd_solve(stiff, gr_rhs)
    data = _einsum("crm,crn->cmn", gr_rhs, oper)
    return oper, data


def cut_stabilization(batch: CutCellBatch, hdi: HHODegreeInfo, side: int):
    """Naive stabilization restricted to one side, skipping faces whose
    side quadrature is empty (make_hho_cut_stabilization,
    cuthho_square.cpp:566-621). 1/h uses the full cell area (:589)."""
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    Cc, nF = batch.face_loc.shape
    d = cbs + nF * fbs

    w, cphi, _, fphi, _ = _side_face_evals(batch, celdeg, facdeg,
                                           2 * facdeg, side)
    mass = _einsum("cfq,cfqi,cfqj->cfij", w, fphi, fphi)
    trace = _einsum("cfq,cfqi,cfqk->cfik", w, fphi, cphi)

    live = jnp.sum(jnp.abs(w), axis=-1) > 0          # qps.size() != 0
    eye_f = jnp.eye(fbs, dtype=mass.dtype)
    safe_mass = jnp.where(live[..., None, None], mass, eye_f)
    ratio = cho_solve_batched(safe_mass, trace)

    neg_eyes = np.zeros((nF, fbs, nF * fbs))
    for f in range(nF):
        neg_eyes[f, :, f * fbs:(f + 1) * fbs] = -np.eye(fbs)
    oper = jnp.concatenate(
        [ratio, jnp.broadcast_to(jnp.asarray(neg_eyes.astype(mass.dtype))[None],
                                 (Cc, nF, fbs, nF * fbs))], axis=3)

    hT = batch.geom.meas
    mo = _einsum("cfij,cfjs->cfis", mass, oper)
    mo = jnp.where(live[..., None, None], mo, 0.0)
    data = _einsum("cfir,cfis->crs", oper, mo)
    return data / hT[:, None, None]


def cut_rhs(batch: CutCellBatch, degree: int, f, ls: LevelSet, bcs,
            side: int, eta: float = CELL_ETA):
    """Source + Nitsche boundary lifting on cut cells (make_rhs cut
    overload, cuthho_square.cpp:623-666): side source at 2*degree
    quadrature plus int_Gamma g (eta/hT phi - dphi.n) at *degree*
    quadrature (:647 — not 2*degree). Returns [Cc, cbs]."""
    poly = side_polygon(batch, side)
    rule, phi, _ = _side_cell_evals(batch, poly, degree, 2 * degree,
                                    want_grads=False)
    ret = _einsum("cq,cqi,cq->ci", rule.w, phi, f(rule.pts))

    hT = batch.geom.meas
    irule, iphi, idphi, n = _interface_evals(batch, poly, ls, degree,
                                             degree)
    dn = _einsum("cqix,cqx->cqi", idphi, n)
    lift = iphi * (eta / hT)[:, None, None] - dn
    ret = ret + _einsum("cq,cq,cqi->ci", irule.w, bcs(irule.pts), lift)
    return ret


def check_eigs(batch: CutCellBatch, ls: LevelSet, hdi: HHODegreeInfo,
               side: int):
    """Eigenvalues of the Nitsche-stabilized side stiffness per cut cell
    (check_eigs, cuthho_square.cpp:504-560) — the coercivity diagnostic.
    Returns [Cc, rbs]."""
    recdeg = hdi.reconstruction_degree
    poly = side_polygon(batch, side)
    rule, _, dphi = _side_cell_evals(batch, poly, recdeg, 2 * recdeg)
    stiff = _einsum("cq,cqix,cqjx->cij", rule.w, dphi, dphi)
    hT = batch.geom.meas
    irule, iphi, idphi, n = _interface_evals(batch, poly, ls, recdeg,
                                             2 * recdeg)
    dn = _einsum("cqix,cqx->cqi", idphi, n)
    A = _einsum("cq,cqi,cqj->cij", irule.w, iphi, dn)
    M = _einsum("cq,cqi,cqj->cij", irule.w, iphi, iphi)
    stiff = stiff - A - jnp.swapaxes(A, 1, 2) \
        + M * (CELL_ETA / hT)[:, None, None]
    return jnp.linalg.eigvalsh(stiff)


def interface_laplacian(batch: CutCellBatch, ls: LevelSet,
                        hdi: HHODegreeInfo,
                        parms: InterfaceParams = InterfaceParams()
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Doubled-space (neg/pos) reconstruction with kappa-weighted stiffness
    and interface jump/penalty coupling (make_hho_laplacian_interface,
    cuthho_square.cpp:390-502).

    Local dof layout (matching the reference): [cbs neg | cbs pos |
    nF*fbs neg | nF*fbs pos]. Returns (oper [Cc, 2*rbs, 2*d'],
    data [Cc, 2*d', 2*d']) with d' = cbs + nF*fbs.
    """
    recdeg = hdi.reconstruction_degree
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    rbs = bases.cell_basis_size(recdeg)
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    Cc, nF = batch.face_loc.shape
    nfd = nF * fbs
    D = 2 * (cbs + nfd)

    k1, k2, eta = parms.kappa_1, parms.kappa_2, parms.eta

    poly_n = side_polygon(batch, LOC_NEG)

    # side stiffnesses (cuthho_square.cpp:420-432)
    rule_n, _, dphi_n = _side_cell_evals(batch, poly_n, recdeg, 2 * recdeg)
    stiff_nn = k1 * _einsum("cq,cqix,cqjx->cij", rule_n.w, dphi_n, dphi_n)
    poly_p = side_polygon(batch, LOC_POS)
    rule_p, _, dphi_p = _side_cell_evals(batch, poly_p, recdeg, 2 * recdeg)
    stiff_pp = k2 * _einsum("cq,cqix,cqjx->cij", rule_p.w, dphi_p, dphi_p)

    hT = batch.geom.meas

    # interface coupling blocks (:437-459), integrated on the NEG side
    irule, iphi, idphi, n = _interface_evals(batch, poly_n, ls, recdeg,
                                             2 * recdeg)
    dn = _einsum("cqix,cqx->cqi", idphi, n)
    a = k1 * _einsum("cq,cqi,cqj->cij", irule.w, iphi, dn)
    b = jnp.swapaxes(a, 1, 2)
    c = (k1 * eta / hT)[:, None, None] * \
        _einsum("cq,cqi,cqj->cij", irule.w, iphi, iphi)

    z = jnp.zeros_like(stiff_nn)
    stiff = jnp.concatenate([
        jnp.concatenate([stiff_nn - a - b + c, b - c], axis=2),
        jnp.concatenate([a - c, stiff_pp + c], axis=2)], axis=1)

    # gr_rhs cell columns (:462-463)
    gr_rhs = jnp.zeros((Cc, 2 * rbs, D), dtype=stiff.dtype)
    gr_rhs = gr_rhs.at[:, :, :cbs].set(stiff[:, :, :cbs])
    gr_rhs = gr_rhs.at[:, :, cbs:2 * cbs].set(stiff[:, :, rbs:rbs + cbs])

    # face couplings per side (:465-496); gradients NOT deconstantized,
    # face quadrature at 2*recdeg
    for side, kap, row0, cell_col0, face_col0 in (
            (LOC_NEG, k1, 0, 0, 2 * cbs),
            (LOC_POS, k2, rbs, cbs, 2 * cbs + nfd)):
        w, cphi, cdphi, fphi, _ = _side_face_evals(batch, recdeg, facdeg,
                                                   2 * recdeg, side,
                                                   want_grads=True)
        fdn = _einsum("cfqrx,cfx->cfqr", cdphi, batch.geom.normals)
        fb = kap * _einsum("cfq,cfqr,cfqb->cfrb", w, fdn, fphi)
        cc = kap * _einsum("cfq,cfqr,cfqk->crk", w, fdn, cphi[..., :cbs])
        gr_rhs = gr_rhs.at[:, row0:row0 + rbs, cell_col0:cell_col0 + cbs] \
            .add(-cc)
        gr_rhs = gr_rhs.at[:, row0:row0 + rbs, face_col0:face_col0 + nfd] \
            .add(jnp.moveaxis(fb, 1, 2).reshape(Cc, rbs, nfd))

    # The doubled Nitsche matrix is singular: the global constant
    # (1 on both sides) has zero stiffness, zero jump penalty, and zero
    # consistency terms. The reference "solves" it with LDLT anyway
    # (:498) and survives on round-off; we regularize exactly instead:
    # gr_rhs is orthogonal to the null vector v = (e0, e0), so adding
    # sigma * v v^T changes oper only along v and leaves data invariant.
    v = jnp.zeros((2 * rbs,), dtype=stiff.dtype)
    v = v.at[0].set(1.0).at[rbs].set(1.0)
    sigma = jnp.einsum("cii->c", stiff) / (2 * rbs)
    stiff_reg = stiff + sigma[:, None, None] * (v[:, None] * v[None, :])
    # SPD after the rank-one fix; robust_spd_solve avoids f64 LU (which
    # XLA:TPU cannot expand) and keeps the f32 fallback semantics
    oper = robust_spd_solve(stiff_reg, gr_rhs)
    data = _einsum("crm,crn->cmn", gr_rhs, oper)
    return oper, data


def cut_project_function(batch: CutCellBatch, hdi: HHODegreeInfo, side: int,
                         f):
    """Side-restricted L2 projection (project_function,
    cuthho_utils.hpp:107-146): cell dofs from the side mass matrix, face
    dofs only on faces touching the side. Returns [Cc, d']."""
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    Cc, nF = batch.face_loc.shape

    poly = side_polygon(batch, side)
    rule, phi, _ = _side_cell_evals(batch, poly, celdeg, 2 * celdeg,
                                    want_grads=False)
    mass = _einsum("cq,cqi,cqj->cij", rule.w, phi, phi)
    rhs = _einsum("cq,cqi,cq->ci", rule.w, phi, f(rule.pts))
    cell_dofs = cho_solve_batched(mass, rhs[..., None])[..., 0]

    w, _, _, fphi, fpts = _side_face_evals(batch, celdeg, facdeg,
                                           2 * facdeg, side)
    fmass = _einsum("cfq,cfqi,cfqj->cfij", w, fphi, fphi)
    frhs = _einsum("cfq,cfqi,cfq->cfi", w, fphi, f(fpts))
    live = jnp.sum(jnp.abs(w), axis=-1) > 0
    eye_f = jnp.eye(fbs, dtype=fmass.dtype)
    safe = jnp.where(live[..., None, None], fmass, eye_f)
    fdofs = cho_solve_batched(safe, frhs[..., None])[..., 0]
    fdofs = jnp.where(live[..., None], fdofs, 0.0)
    return jnp.concatenate([cell_dofs, fdofs.reshape(Cc, nF * fbs)], axis=1)
