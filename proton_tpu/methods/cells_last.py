"""Cells-last ([entries, C]) layout for the condensed solve path.

TPU memory tiles are (8, 128) over the two minor axes, so batched local
operators stored as [C, d, d] pad their small trailing dims: at k=2 on a
1024^2 mesh, lc [1M, 22, 22] tile-pads to ~12 GB and OOMs a 16 GB chip
(round-1 blocker, ROADMAP item 2). Keeping the *cell* index in the lane
(minor) dimension makes every array dense: lc [d*d, C], condensed Schur
S [nfd*nfd, C], grids [fbs, Ny(+1), Nx(+1)].

This module provides the full condensed structured-grid solve in that
layout:

- ``condense_cl``: static condensation with an UNROLLED Cholesky over
  [C]-lane vectors (the same list-of-lanes algorithm as the fused Pallas
  assembly kernel, methods/pallas_assembly.py, which natively emits
  [d*d, C]) — jnp.linalg.cholesky on [C, cbs, cbs] would force the padded
  layout back.
- ``GridVecCL`` face grids with the polynomial coefficient LEADING, so
  gather/scatter are pure concatenations along the big spatial axes.
- operator / diagonal / block-Jacobi / cut-patch smoother / transfer
  equivalents of methods/structured.py, verified identical in tests.

The row-major path (methods/condensation.py, methods/structured.py)
remains the reference implementation for CPU/f64 accuracy gates.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from .pallas_assembly import _chol_solve_unrolled
from .structured import StructuredFaceSystem


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


class CondensedCL(NamedTuple):
    """Condensed system in cells-last layout (cf.
    condensation.CondensedSystem). Instead of the raw (ATT, ATF, fT)
    blocks it stores the BACK-SUBSTITUTION operators X = ATT^-1 ATF and
    y = ATT^-1 fT, computed once at condensation time in the
    condensation's working precision: recovery is then two stencil
    matmuls with no per-cell factorization, so a sliver-cut block that
    rounds indefinite in f32 (k >= 2, local cond ~1e8) can never NaN at
    recovery — the f64 mixed-precision splice computes X/y exactly and
    only their VALUES are rounded to f32 storage."""

    S: jnp.ndarray       # [nfd*nfd, C]
    bF: jnp.ndarray      # [nfd, C]
    X: jnp.ndarray       # [cbs*nfd, C]  ATT^-1 ATF
    y: jnp.ndarray       # [cbs, C]      ATT^-1 fT


def _rows(flat, n, m):
    """[n*m, C] -> list-of-lists of [C] lane vectors."""
    return [[flat[i * m + j] for j in range(m)] for i in range(n)]


def _stack(rows):
    return jnp.stack([e for row in rows for e in row])


def condense_cl(lc_cl, f_cl, cbs: int) -> CondensedCL:
    """Schur-eliminate the first cbs local dofs of every cell, entirely in
    lane vectors (see condensation.condense for the math)."""
    d2, C = lc_cl.shape
    d = int(round(d2 ** 0.5))
    nfd = d - cbs
    A = _rows(lc_cl, d, d)
    ATT = [[A[i][j] for j in range(cbs)] for i in range(cbs)]
    ATF = [[A[i][cbs + j] for j in range(nfd)] for i in range(cbs)]
    AFT = [[A[cbs + i][j] for j in range(cbs)] for i in range(nfd)]
    AFF = [[A[cbs + i][cbs + j] for j in range(nfd)] for i in range(nfd)]
    fT = [f_cl[i] for i in range(cbs)]

    B = [ATF[i] + [fT[i]] for i in range(cbs)]        # [cbs][nfd+1]
    X = _chol_solve_unrolled(ATT, B)
    S = [[AFF[i][j] - sum(AFT[i][k] * X[k][j] for k in range(cbs))
          for j in range(nfd)] for i in range(nfd)]
    bF = [[-sum(AFT[i][k] * X[k][nfd] for k in range(cbs))]
          for i in range(nfd)]
    Xop = [[X[i][j] for j in range(nfd)] for i in range(cbs)]
    y = [X[i][nfd] for i in range(cbs)]
    return CondensedCL(_stack(S), _stack(bF), _stack(Xop),
                       jnp.stack(y))


def recover_cells_cl(cond: CondensedCL, uF_cl):
    """uT [cbs, C] = y - X uF (back-substitution of the condensation
    through the stored operators), lane-vector unrolled — no per-cell
    factorization at recovery time."""
    cbs = cond.y.shape[0]
    nfd = cond.bF.shape[0]
    X = _rows(cond.X, cbs, nfd)
    return jnp.stack([
        cond.y[i] - sum(X[i][j] * uF_cl[j] for j in range(nfd))
        for i in range(cbs)])


def from_row_major(cond_rm) -> CondensedCL:
    """condensation.CondensedSystem ([C, ...]) -> CondensedCL (transpose
    + back-substitution operators; used to splice small special-cell
    batches, e.g. the f64 cut class, into a cells-last system). X/y are
    computed here in cond_rm's dtype — for the mixed-precision f64 cut
    splice this is the point where the exact f64 back-substitution is
    captured before any downcast."""
    from ..core.ops import robust_spd_solve

    C, nfd = cond_rm.bF.shape
    cbs = cond_rm.fT.shape[1]
    XY = robust_spd_solve(
        cond_rm.ATT,
        jnp.concatenate([cond_rm.ATF, cond_rm.fT[..., None]], axis=-1))
    return CondensedCL(
        jnp.transpose(cond_rm.S, (1, 2, 0)).reshape(nfd * nfd, C),
        jnp.transpose(cond_rm.bF, (1, 0)),
        jnp.transpose(XY[..., :nfd], (1, 2, 0)).reshape(cbs * nfd, C),
        jnp.transpose(XY[..., nfd], (1, 0)))


def set_columns(a, ids, b):
    """a[:, ids] = b WITHOUT a lane-dimension scatter: libtpu faults on
    indexed scatters along the minor axis (reproduced at [484, 65536]
    with ~700 indices — the k=2 worker-crash bug). ``ids`` must be
    sorted ascending; out-of-range ids (sentinel padding, cut/batched.py)
    never match and are dropped, matching scatter-drop semantics."""
    ids = jnp.asarray(ids)
    if ids.shape[0] == 0:
        return a
    C = a.shape[-1]
    cols = jnp.arange(C, dtype=ids.dtype)
    pos = jnp.clip(jnp.searchsorted(ids, cols), 0, ids.shape[0] - 1)
    match = ids[pos] == cols
    return jnp.where(match[None, :], b[..., pos], a)


def set_cells(cond: CondensedCL, ids, sub: CondensedCL) -> CondensedCL:
    """Overwrite the columns ``ids`` with another (small) condensed batch
    (the cut-cell class overwrite of the fictdom assembly)."""
    return CondensedCL(*(set_columns(a, ids, b)
                         for a, b in zip(cond, sub)))


# ---------------------------------------------------------------------------
# Face grids with the coefficient axis leading
# ---------------------------------------------------------------------------


class GridVecCL(NamedTuple):
    H: jnp.ndarray   # [fbs, Ny+1, Nx]
    V: jnp.ndarray   # [fbs, Ny, Nx+1]


def zeros_grid_cl(sys: StructuredFaceSystem, dtype) -> GridVecCL:
    return GridVecCL(jnp.zeros((sys.fbs, sys.Ny + 1, sys.Nx), dtype),
                     jnp.zeros((sys.fbs, sys.Ny, sys.Nx + 1), dtype))


def to_cells_last(x) -> GridVecCL:
    """structured.GridVec ([Ny+1, Nx, fbs]) -> GridVecCL."""
    return GridVecCL(jnp.transpose(x.H, (2, 0, 1)),
                     jnp.transpose(x.V, (2, 0, 1)))


def from_cells_last(x: GridVecCL):
    from .structured import GridVec
    return GridVec(jnp.transpose(x.H, (1, 2, 0)),
                   jnp.transpose(x.V, (1, 2, 0)))


def grid_gather_cl(sys: StructuredFaceSystem, x: GridVecCL):
    """Local face vectors [4*fbs, C] by slicing (local slot order
    bottom, right, top, left as in structured.grid_gather)."""
    loc = jnp.concatenate([x.H[:, :-1, :], x.V[:, :, 1:],
                           x.H[:, 1:, :], x.V[:, :, :-1]], axis=0)
    return loc.reshape(4 * sys.fbs, sys.Ny * sys.Nx)


def grid_scatter_cl(sys: StructuredFaceSystem, contrib) -> GridVecCL:
    """Adjoint of grid_gather_cl: [4*B, C] -> grids [B, ...]."""
    B = contrib.shape[0] // 4
    c = contrib.reshape(4, B, sys.Ny, sys.Nx)
    zH = jnp.zeros((B, 1, sys.Nx), dtype=contrib.dtype)
    H = jnp.concatenate([c[0], zH], axis=1) + \
        jnp.concatenate([zH, c[2]], axis=1)
    zV = jnp.zeros((B, sys.Ny, 1), dtype=contrib.dtype)
    V = jnp.concatenate([c[3], zV], axis=2) + \
        jnp.concatenate([zV, c[1]], axis=2)
    return GridVecCL(H, V)


def mask_cl(sys: StructuredFaceSystem, x: GridVecCL) -> GridVecCL:
    return GridVecCL(x.H * sys.freeH[None], x.V * sys.freeV[None])


def _matvec_rows(S_cl, xl, n_out, n_in):
    """y[i] = sum_j S[i*n_in+j] * xl[j], unrolled multiply-adds over lane
    vectors/planes (fusible elementwise chains; no dot_general layout
    surprises)."""
    out = []
    for i in range(n_out):
        acc = S_cl[i * n_in] * xl[0]
        for j in range(1, n_in):
            acc = acc + S_cl[i * n_in + j] * xl[j]
        out.append(acc)
    return jnp.stack(out)


def make_structured_operator_cl(sys: StructuredFaceSystem, S_cl):
    """Matrix-free Schur operator, cells-last (cf.
    structured.make_structured_operator)."""
    nfd = 4 * sys.fbs

    def apply_S(x: GridVecCL) -> GridVecCL:
        xm = mask_cl(sys, x)
        xl = grid_gather_cl(sys, xm)
        contrib = _matvec_rows(S_cl, xl, nfd, nfd)
        y = mask_cl(sys, grid_scatter_cl(sys, contrib))
        return GridVecCL(y.H + x.H * (~sys.freeH[None]),
                         y.V + x.V * (~sys.freeV[None]))

    return apply_S


# ---------------------------------------------------------------------------
# Uniform-stencil split operator
#
# On the generated mesh the condensed local Schur matrix is IDENTICAL for
# every uncut/undistorted cell (congruent squares + translation-invariant
# scaled-monomial bases), so S_cl = broadcast(S_u) + dS with dS supported
# on the O(N) irregular (cut/displaced) columns. The matvec then needs to
# read only x — a constant-coefficient stencil whose 64 coefficients are
# compile-time scalars — plus a small indexed correction, instead of
# streaming the [nfd*nfd, C] S array: measured 3.7 ms -> 0.5 + ~1 ms per
# apply at 1024^2 (scripts/op_chain_prof.py).
# ---------------------------------------------------------------------------


def uniform_deltas(S_cl, S_u, ids):
    """dS [nfd*nfd, Ci] = S_cl[:, ids] - S_u (setup-time)."""
    ids = jnp.asarray(ids)
    return S_cl[:, ids] - jnp.asarray(S_u).reshape(-1, 1).astype(S_cl.dtype)


def _shift_rows(a, d):
    """Rows of a [.., R, L] shifted by d with zero fill (axis -2)."""
    if d == 0:
        return a
    z = jnp.zeros_like(a[..., :abs(d), :])
    return (jnp.concatenate([a[..., d:, :], z], axis=-2) if d > 0
            else jnp.concatenate([z, a[..., :d, :]], axis=-2))


def make_uniform_operator_cl(sys: StructuredFaceSystem, S_u,
                             ids=None, dS=None):
    """Matrix-free Schur operator for the CONSTANT-coefficient system:
    ``S_u`` is the [nfd, nfd] unit-cell condensed matrix as a host
    (numpy) array — its entries become compile-time scalars. With
    ``ids``/``dS`` (irregular columns and their S deviation,
    uniform_deltas), the result is EXACTLY make_structured_operator_cl of
    the spliced system; without them it is the pure uniform operator
    (used as the V-cycle smoother operator)."""
    fbs = sys.fbs
    nfd = 4 * fbs
    Su = np.asarray(S_u)
    assert Su.shape == (nfd, nfd)
    b, r, t, l = 0, fbs, 2 * fbs, 3 * fbs
    if ids is not None:
        ids_np = np.asarray(ids)
        jj = jnp.asarray(ids_np // sys.Nx, jnp.int32)
        ii = jnp.asarray(ids_np % sys.Nx, jnp.int32)

    def apply_S(x: GridVecCL) -> GridVecCL:
        H = x.H * sys.freeH[None]
        V = x.V * sys.freeV[None]
        # local slot planes on the cell grid [Ny, Nx]
        xl = [None] * nfd
        for m in range(fbs):
            xl[b + m] = H[m, :-1, :]
            xl[t + m] = H[m, 1:, :]
            xl[l + m] = V[m, :, :-1]
            xl[r + m] = V[m, :, 1:]
        c = [sum(float(Su[s, s2]) * xl[s2] for s2 in range(nfd)
                 if Su[s, s2] != 0.0) for s in range(nfd)]
        zrow = jnp.zeros((1, sys.Nx), H.dtype)
        yH = jnp.stack([
            jnp.concatenate([c[b + m], zrow], axis=0) +
            jnp.concatenate([zrow, c[t + m]], axis=0)
            for m in range(fbs)])
        zcol = jnp.zeros((sys.Ny, 1), V.dtype)
        yV = jnp.stack([
            jnp.concatenate([c[l + m], zcol], axis=1) +
            jnp.concatenate([zcol, c[r + m]], axis=1)
            for m in range(fbs)])

        if ids is not None and ids_np.shape[0] > 0:
            # correction: gather local vectors of irregular cells, apply
            # dS, scatter-add (masks: sources already masked; targets
            # masked by re-multiplying free)
            xli = jnp.concatenate([H[:, jj, ii], V[:, jj, ii + 1],
                                   H[:, jj + 1, ii], V[:, jj, ii]], axis=0)
            ci = _matvec_rows(dS, xli, nfd, nfd).reshape(4, fbs, -1)
            yH = yH.at[:, jj, ii].add(ci[0]).at[:, jj + 1, ii].add(ci[2])
            yV = yV.at[:, jj, ii].add(ci[3]).at[:, jj, ii + 1].add(ci[1])

        return GridVecCL(
            yH * sys.freeH[None] + x.H * (~sys.freeH[None]),
            yV * sys.freeV[None] + x.V * (~sys.freeV[None]))

    return apply_S


def uniform_block_jacobi_blocks(sys: StructuredFaceSystem, S_u):
    """Host-side [fbs, fbs] inverse diagonal blocks of the uniform
    system's interior H- and V-faces: every free face sees the same two
    cell contributions (bottom+top slots resp. left+right slots)."""
    fbs = np.asarray(S_u).shape[0] // 4
    Su = np.asarray(S_u)
    b, r, t, l = 0, fbs, 2 * fbs, 3 * fbs
    BH = Su[b:b + fbs, b:b + fbs] + Su[t:t + fbs, t:t + fbs]
    BV = Su[l:l + fbs, l:l + fbs] + Su[r:r + fbs, r:r + fbs]
    return np.linalg.inv(BH), np.linalg.inv(BV)


def irregular_face_indices(sys: StructuredFaceSystem, ids):
    """STATIC (host) face index sets touched by the irregular cells
    ``ids``: ((hj, hi), (vj, vi)) as unique numpy index arrays — the only
    faces whose assembled diagonal block can deviate from the uniform
    interior block. (Frozen faces also deviate — identity — but carry
    zero residual throughout the masked CG, so they need no
    correction.)"""
    ids_np = np.asarray(ids)
    jj, ii = ids_np // sys.Nx, ids_np % sys.Nx
    hkey = np.unique(np.concatenate([jj * sys.Nx + ii,
                                     (jj + 1) * sys.Nx + ii]))
    vkey = np.unique(np.concatenate([jj * (sys.Nx + 1) + ii,
                                     jj * (sys.Nx + 1) + ii + 1]))
    return ((hkey // sys.Nx, hkey % sys.Nx),
            (vkey // (sys.Nx + 1), vkey % (sys.Nx + 1)))


def uniform_bj_corrections(sys: StructuredFaceSystem, iH, iV, iHu, iVu,
                           ids):
    """Setup (traceable): per-face deviations of the block-Jacobi inverse
    planes against the uniform interior inverses, on the faces touched by
    the irregular cells. Returns (hj, hi, dH [fbs, fbs, nH]),
    (vj, vi, dV)."""
    (hj, hi), (vj, vi) = irregular_face_indices(sys, ids)
    dH = iH[:, :, hj, hi] - jnp.asarray(iHu)[:, :, None].astype(iH.dtype)
    dV = iV[:, :, vj, vi] - jnp.asarray(iVu)[:, :, None].astype(iV.dtype)
    return ((jnp.asarray(hj, jnp.int32), jnp.asarray(hi, jnp.int32), dH),
            (jnp.asarray(vj, jnp.int32), jnp.asarray(vi, jnp.int32), dV))


def make_uniform_block_jacobi_cl(sys: StructuredFaceSystem, iHu, iVu,
                                 corrH=None, corrV=None):
    """Block-Jacobi apply with CONSTANT interior inverse blocks (host
    scalars) plus optional per-face corrections from
    uniform_bj_corrections."""
    fbs = sys.fbs
    iHu = np.asarray(iHu)
    iVu = np.asarray(iVu)

    def precond(x: GridVecCL) -> GridVecCL:
        H = jnp.stack([sum(float(iHu[i, j]) * x.H[j] for j in range(fbs))
                       for i in range(fbs)])
        V = jnp.stack([sum(float(iVu[i, j]) * x.V[j] for j in range(fbs))
                       for i in range(fbs)])
        if corrH is not None and corrH[0].shape[0] > 0:
            hj, hi, dH = corrH
            rh = x.H[:, hj, hi]
            H = H.at[:, hj, hi].add(_einsum("ijc,jc->ic", dH, rh))
        if corrV is not None and corrV[0].shape[0] > 0:
            vj, vi, dV = corrV
            rv = x.V[:, vj, vi]
            V = V.at[:, vj, vi].add(_einsum("ijc,jc->ic", dV, rv))
        return GridVecCL(H, V)

    return precond


# ---------------------------------------------------------------------------
# LEAN uniform condensed system
#
# At 4096^2 (k=3) the dense cells-last planes are ~17 GB; the lean form
# keeps the O(N^2) broadcasts IMPLICIT (static unit-cell blocks) and
# stores only the O(C) moment vectors plus the O(N) irregular columns.
# Every setup quantity the solver stack needs (face diagonal blocks,
# block-Jacobi, patch smoother, rhs fold, recovery) is derived from the
# dS deviations without ever materializing a [nfd*nfd, C] plane.
# ---------------------------------------------------------------------------


class UniformCondCL(NamedTuple):
    """Lean uniform condensed system (see section comment). The static
    half (S_u, X_u, ATT_u, ATF_u unit-cell blocks + the irregular ids)
    travels OUTSIDE the pytree as host numpy. Irregular columns store
    the exact back-substitution operators X_i = ATT^-1 ATF and
    y_i = ATT^-1 fT (see CondensedCL) — for the mixed-precision splice
    these are f64-computed values rounded to storage dtype, so cut-cell
    recovery never factors a rounded sliver block."""

    dS: jnp.ndarray      # [nfd*nfd, Ci]  S deviation at irregular columns
    bF: jnp.ndarray      # [nfd, C]
    fT: jnp.ndarray      # [cbs, C]
    X_i: jnp.ndarray     # [cbs*nfd, Ci]  ATT^-1 ATF at irregular columns
    y_i: jnp.ndarray     # [cbs, Ci]      ATT^-1 fT at irregular columns


def _slot_diag_blocks(dS, fbs, slot):
    """[fbs, fbs, Ci] diagonal slot block of dS [nfd*nfd, Ci]."""
    nfd = 4 * fbs
    return jnp.stack([
        jnp.stack([dS[(slot * fbs + i) * nfd + slot * fbs + j]
                   for j in range(fbs)]) for i in range(fbs)])


def uniform_face_block_deltas(sys: StructuredFaceSystem, dS, irr_ids):
    """Per-face deviations of the assembled fbs x fbs diagonal blocks
    against the uniform interior block, computed from the dS columns
    alone (no [fbs, fbs, Ny+1, Nx] planes): each irregular cell adds its
    dS diagonal slot block to its 4 faces; frozen (grid-boundary) faces
    are dropped (identity rows, zero residual). Returns
    ((hj, hi, dBH [nH, fbs, fbs]), (vj, vi, dBV [nV, fbs, fbs])) with
    hj/hi/vj/vi static numpy."""
    fbs, Nx, Ny = sys.fbs, sys.Nx, sys.Ny
    ids = np.asarray(irr_ids)
    jj, ii = ids // Nx, ids % Nx

    # H faces: slot b -> (jj, ii), slot t -> (jj+1, ii)
    hkey = np.concatenate([jj * Nx + ii, (jj + 1) * Nx + ii])
    hfree = (hkey // Nx != 0) & (hkey // Nx != Ny)
    hu, hinv = np.unique(hkey[hfree], return_inverse=True)
    db = jnp.moveaxis(_slot_diag_blocks(dS, fbs, 0), -1, 0)  # [Ci,f,f]
    dt = jnp.moveaxis(_slot_diag_blocks(dS, fbs, 2), -1, 0)
    hcontrib = jnp.concatenate([db, dt], axis=0)[
        jnp.asarray(np.nonzero(hfree)[0])]
    dBH = jax.ops.segment_sum(hcontrib, jnp.asarray(hinv),
                              num_segments=max(len(hu), 1))

    # V faces: slot l -> (jj, ii), slot r -> (jj, ii+1)
    W = Nx + 1
    vkey = np.concatenate([jj * W + ii, jj * W + ii + 1])
    vfree = (vkey % W != 0) & (vkey % W != Nx)
    vu, vinv = np.unique(vkey[vfree], return_inverse=True)
    dl = jnp.moveaxis(_slot_diag_blocks(dS, fbs, 3), -1, 0)
    dr = jnp.moveaxis(_slot_diag_blocks(dS, fbs, 1), -1, 0)
    vcontrib = jnp.concatenate([dl, dr], axis=0)[
        jnp.asarray(np.nonzero(vfree)[0])]
    dBV = jax.ops.segment_sum(vcontrib, jnp.asarray(vinv),
                              num_segments=max(len(vu), 1))

    return ((hu // Nx, hu % Nx, dBH), (vu // W, vu % W, dBV))


def uniform_bj_from_deltas(sys: StructuredFaceSystem, S_u, hfaces,
                           vfaces, dtype):
    """(corrH, corrV) for make_uniform_block_jacobi_cl from the face
    block deltas: inv(Bu + dB) - inv(Bu) at each touched free face."""
    iHu, iVu = uniform_block_jacobi_blocks(sys, S_u)
    BHu = np.linalg.inv(iHu)
    BVu = np.linalg.inv(iVu)
    hj, hi, dBH = hfaces
    vj, vi, dBV = vfaces
    dH = jnp.linalg.inv(jnp.asarray(BHu, dtype) + dBH) - \
        jnp.asarray(iHu, dtype)
    dV = jnp.linalg.inv(jnp.asarray(BVu, dtype) + dBV) - \
        jnp.asarray(iVu, dtype)
    corrH = (jnp.asarray(hj, jnp.int32), jnp.asarray(hi, jnp.int32),
             jnp.moveaxis(dH, 0, -1))
    corrV = (jnp.asarray(vj, jnp.int32), jnp.asarray(vi, jnp.int32),
             jnp.moveaxis(dV, 0, -1))
    return corrH, corrV


def _pick_columns(table_keys, table_vals, keys, default_shape, dtype):
    """vals at ``keys`` from a sorted static (table_keys -> table_vals)
    map; zeros where missing. table_vals [n, ...] device; keys static."""
    keys = np.asarray(keys)
    if len(table_keys) == 0:
        return jnp.zeros((len(keys),) + default_shape, dtype)
    pos = np.clip(np.searchsorted(table_keys, keys), 0,
                  len(table_keys) - 1)
    hit = table_keys[pos] == keys
    vals = table_vals[jnp.asarray(pos)]
    return jnp.where(jnp.asarray(hit).reshape((-1,) + (1,) * (
        vals.ndim - 1)), vals, 0)


def uniform_patch_setup_lean(sys: StructuredFaceSystem, S_u, dS,
                             irr_ids, patch_ids, dtype):
    """cut_patch_setup_cl from the lean data: patch cells' S columns are
    Su + dS (zero off the irregular set), their face diagonal blocks are
    Bu + dB from uniform_face_block_deltas. Same outputs (Binv, wH, wV);
    exact equality with the dense setup on free faces."""
    fbs, Nx, Ny = sys.fbs, sys.Nx, sys.Ny
    nfd = 4 * fbs
    pids = np.asarray(patch_ids)
    Cc = len(pids)
    irr = np.asarray(irr_ids)
    jj, ii = pids // Nx, pids % Nx

    # S columns of the patch cells
    dS_cols = _pick_columns(irr, jnp.moveaxis(dS, -1, 0), pids,
                            (nfd * nfd,), dtype)      # [Cc, nfd*nfd]
    Su = jnp.asarray(np.asarray(S_u), dtype)
    B = Su[None] + dS_cols.reshape(Cc, nfd, nfd)

    # diagonal slot blocks at the patch cells' faces
    (hfj, hfi, dBH), (vfj, vfi, dBV) = uniform_face_block_deltas(
        sys, dS, irr_ids)
    hkeys, vkeys = hfj * Nx + hfi, vfj * (Nx + 1) + vfi
    iHu, iVu = uniform_block_jacobi_blocks(sys, S_u)
    BHu = jnp.asarray(np.linalg.inv(iHu), dtype)
    BVu = jnp.asarray(np.linalg.inv(iVu), dtype)

    def face_blocks(keys_cell, dB_tab, tab_keys, Bu):
        dB = _pick_columns(tab_keys, dB_tab, keys_cell, (fbs, fbs),
                           dtype)
        return Bu[None] + dB

    sb = jnp.stack([
        face_blocks(jj * Nx + ii, dBH, hkeys, BHu),          # bottom
        face_blocks(jj * (Nx + 1) + ii + 1, dBV, vkeys, BVu),  # right
        face_blocks((jj + 1) * Nx + ii, dBH, hkeys, BHu),    # top
        face_blocks(jj * (Nx + 1) + ii, dBV, vkeys, BVu),    # left
    ], axis=1)                                      # [Cc, 4, fbs, fbs]

    B = B.reshape(Cc, 4, fbs, 4, fbs)
    for s in range(4):
        B = B.at[:, s, :, s, :].set(sb[:, s])
    B = B.reshape(Cc, nfd, nfd)

    jjd = jnp.asarray(jj, jnp.int32)
    iid = jnp.asarray(ii, jnp.int32)
    free_slot = jnp.stack([sys.freeH[jjd, iid], sys.freeV[jjd, iid + 1],
                           sys.freeH[jjd + 1, iid],
                           sys.freeV[jjd, iid]], axis=1)
    m = jnp.repeat(free_slot, fbs, axis=1).astype(dtype)
    B = B * (m[:, :, None] * m[:, None, :]) + \
        jnp.eye(nfd, dtype=dtype) * (1.0 - m)[:, None, :]
    Binv = jnp.linalg.inv(B)

    C = Nx * Ny
    mask = jnp.zeros((C,), dtype).at[jnp.asarray(pids)].set(1.0)
    onesl = jnp.broadcast_to(mask, (nfd, C))
    mult = grid_scatter_cl(sys, onesl)
    wH = jnp.where(mult.H > 0, 1.0 / jnp.sqrt(jnp.maximum(mult.H, 1.0)),
                   0.0)
    wV = jnp.where(mult.V > 0, 1.0 / jnp.sqrt(jnp.maximum(mult.V, 1.0)),
                   0.0)
    return Binv, wH, wV


def uniform_rhs_cl(sys: StructuredFaceSystem, ucond: UniformCondCL,
                   S_u, irr_ids, gF_cl=None) -> GridVecCL:
    """structured_rhs_cl for the lean system: the S @ gF Dirichlet fold
    uses the static stencil + dS corrections (scatter-free via
    set_columns)."""
    nfd = ucond.bF.shape[0]
    loads = ucond.bF
    if gF_cl is not None:
        Su = np.asarray(S_u)
        fold = jnp.stack([
            sum(float(Su[i, j]) * gF_cl[j] for j in range(nfd)
                if Su[i, j] != 0.0) for i in range(nfd)])
        loads = loads - fold
        irr = np.asarray(irr_ids)
        if len(irr):
            idx = jnp.asarray(irr)
            corr = _matvec_rows(ucond.dS, gF_cl[:, idx], nfd, nfd)
            loads = set_columns(loads, irr, loads[:, idx] - corr)
    return mask_cl(sys, grid_scatter_cl(sys, loads))


def uniform_recover_cl(sys: StructuredFaceSystem, ucond: UniformCondCL,
                       X_u, ATT_u, irr_ids, x: GridVecCL, gF_cl=None):
    """solve_recover_cl for the lean system: regular cells back-
    substitute through the static unit blocks (two stencil matmuls),
    irregular cells through their exact stored blocks."""
    cbs = ucond.fT.shape[0]
    nfd = ucond.bF.shape[0]
    uF = grid_gather_cl(sys, mask_cl(sys, x))
    if gF_cl is not None:
        uF = uF + gF_cl
    Xu = np.asarray(X_u)
    Ai = np.linalg.inv(np.asarray(ATT_u))
    uT = jnp.stack([
        sum(float(Ai[i, k]) * ucond.fT[k] for k in range(cbs)) -
        sum(float(Xu[i, j]) * uF[j] for j in range(nfd)
            if Xu[i, j] != 0.0) for i in range(cbs)])
    irr = np.asarray(irr_ids)
    if len(irr):
        idx = jnp.asarray(irr)
        Xi = _rows(ucond.X_i, cbs, nfd)
        uFi = uF[:, idx]
        uT_i = jnp.stack([
            ucond.y_i[i] - sum(Xi[i][j] * uFi[j] for j in range(nfd))
            for i in range(cbs)])
        uT = set_columns(uT, irr, uT_i)
    return jnp.concatenate([uT, uF], axis=0).T


def structured_diagonal_cl(sys: StructuredFaceSystem, S_cl) -> GridVecCL:
    nfd = 4 * sys.fbs
    dl = jnp.stack([S_cl[i * nfd + i] for i in range(nfd)])
    d = grid_scatter_cl(sys, dl)
    return GridVecCL(jnp.where(sys.freeH[None], d.H, 1.0),
                     jnp.where(sys.freeV[None], d.V, 1.0))


def structured_rhs_cl(sys: StructuredFaceSystem, cond: CondensedCL,
                      gF_cl=None) -> GridVecCL:
    """Condensed loads (+ Dirichlet fold) scattered to the grids; gF_cl
    [nfd, C] is the local Dirichlet data restricted to face slots."""
    nfd = cond.bF.shape[0]
    loads = cond.bF
    if gF_cl is not None:
        loads = loads - _matvec_rows(cond.S, gF_cl, nfd, nfd)
    return mask_cl(sys, grid_scatter_cl(sys, loads))


def assembled_face_blocks_cl(sys: StructuredFaceSystem, S_cl):
    """Per-face assembled fbs x fbs diagonal blocks, cells-last:
    (BH [fbs, fbs, Ny+1, Nx], BV [fbs, fbs, Ny, Nx+1]); identity on
    frozen faces."""
    fbs, nfd = sys.fbs, 4 * sys.fbs
    C = S_cl.shape[1]
    blocks = jnp.stack([
        jnp.stack([S_cl[(s * fbs + i) * nfd + s * fbs + j]
                   for j in range(fbs)])
        for s in range(4) for i in range(fbs)])      # [4*fbs*fbs ... ]
    blocks = blocks.reshape(4, fbs * fbs, C).reshape(4 * fbs * fbs, C)
    acc = grid_scatter_cl(sys, blocks)
    BH = acc.H.reshape(fbs, fbs, sys.Ny + 1, sys.Nx)
    BV = acc.V.reshape(fbs, fbs, sys.Ny, sys.Nx + 1)
    eye = jnp.eye(fbs, dtype=S_cl.dtype)[:, :, None, None]
    BH = jnp.where(sys.freeH[None, None], BH, eye)
    BV = jnp.where(sys.freeV[None, None], BV, eye)
    return BH, BV


def _inv_planes(B):
    """Inverse of [n, n, ...] plane-stacked matrices (setup-only)."""
    perm = (*range(2, B.ndim), 0, 1)
    inv = jnp.linalg.inv(jnp.transpose(B, perm))
    back = (B.ndim - 2, B.ndim - 1, *range(B.ndim - 2))
    return jnp.transpose(inv, back)


def block_jacobi_setup_cl(sys: StructuredFaceSystem, S_cl):
    """Setup arrays of the per-face block-Jacobi: inverse fbs x fbs
    blocks in grid planes (iH [fbs, fbs, Ny+1, Nx], iV likewise)."""
    BH, BV = assembled_face_blocks_cl(sys, S_cl)
    return _inv_planes(BH), _inv_planes(BV)


def apply_block_jacobi_cl(iH, iV, r: GridVecCL) -> GridVecCL:
    fbs = r.H.shape[0]
    H = jnp.stack([sum(iH[i, j] * r.H[j] for j in range(fbs))
                   for i in range(fbs)])
    V = jnp.stack([sum(iV[i, j] * r.V[j] for j in range(fbs))
                   for i in range(fbs)])
    return GridVecCL(H, V)


def block_jacobi_preconditioner_cl(sys: StructuredFaceSystem, S_cl):
    """Per-face block-Jacobi, cells-last (cf.
    structured.block_jacobi_preconditioner)."""
    iH, iV = block_jacobi_setup_cl(sys, S_cl)

    def precond(r: GridVecCL) -> GridVecCL:
        return apply_block_jacobi_cl(iH, iV, r)

    return precond


def checkerboard_split(ids, Nx: int):
    """Split cell ids on the Nx-wide grid into (even, odd) checkerboard
    colors. Same-color cells are never edge-adjacent, so their 4-face
    patches are face-disjoint: sweeping the colors in sequence turns
    the additive-Schwarz patch smoother into a multiplicative (colored
    block Gauss-Seidel) one — exact block solves per color, no
    1/sqrt(multiplicity) damping."""
    ids = np.asarray(ids)
    par = ((ids // Nx) + (ids % Nx)) % 2
    return ids[par == 0], ids[par == 1]


def patch_color_groups(ids, Nx: int, patch_colors: int):
    """Static per-color id groups for the patch smoother (non-empty
    only; patch_colors in {1, 2})."""
    groups = (np.asarray(ids),) if patch_colors == 1 else \
        checkerboard_split(ids, Nx)
    return tuple(g for g in groups if len(g) > 0)


def cut_patch_setup_cl(sys: StructuredFaceSystem, S_cl, cut_ids):
    """Setup arrays of the interface-patch smoother: inverted patch
    blocks [Cc, 4*fbs, 4*fbs] and the 1/sqrt(multiplicity) overlap
    weight grids."""
    fbs, Nx = sys.fbs, sys.Nx
    nfd = 4 * fbs
    ids_np = np.asarray(cut_ids)
    Cc = len(ids_np)
    jj = jnp.asarray(ids_np // Nx, dtype=jnp.int32)
    ii = jnp.asarray(ids_np % Nx, dtype=jnp.int32)

    BH, BV = assembled_face_blocks_cl(sys, S_cl)
    slot_blocks = jnp.stack([
        BH[:, :, jj, ii], BV[:, :, jj, ii + 1],
        BH[:, :, jj + 1, ii], BV[:, :, jj, ii]], axis=0)  # [4,fbs,fbs,Cc]
    B = jnp.transpose(S_cl[:, ids_np].reshape(nfd, nfd, Cc), (2, 0, 1))
    sb = jnp.transpose(slot_blocks, (3, 0, 1, 2))          # [Cc,4,fbs,fbs]
    B = B.reshape(Cc, 4, fbs, 4, fbs)
    for s in range(4):
        B = B.at[:, s, :, s, :].set(sb[:, s])
    B = B.reshape(Cc, nfd, nfd)
    free_slot = jnp.stack([sys.freeH[jj, ii], sys.freeV[jj, ii + 1],
                           sys.freeH[jj + 1, ii], sys.freeV[jj, ii]],
                          axis=1)
    m = jnp.repeat(free_slot, fbs, axis=1).astype(S_cl.dtype)
    B = B * (m[:, :, None] * m[:, None, :]) + \
        jnp.eye(nfd, dtype=S_cl.dtype) * (1.0 - m)[:, None, :]
    Binv = jnp.linalg.inv(B)

    # column membership without a lane-dim scatter (libtpu bug)
    mask = jnp.zeros((S_cl.shape[1],), S_cl.dtype).at[
        jnp.asarray(ids_np)].set(1.0)
    onesl = jnp.broadcast_to(mask, (nfd, S_cl.shape[1]))
    mult = grid_scatter_cl(sys, onesl)
    wH = jnp.where(mult.H > 0, 1.0 / jnp.sqrt(jnp.maximum(mult.H, 1.0)),
                   0.0)
    wV = jnp.where(mult.V > 0, 1.0 / jnp.sqrt(jnp.maximum(mult.V, 1.0)),
                   0.0)
    return Binv, wH, wV


def apply_cut_patch_cl(sys: StructuredFaceSystem, cut_ids, Binv, wH, wV,
                       r: GridVecCL) -> GridVecCL:
    fbs, Nx = sys.fbs, sys.Nx
    ids_np = np.asarray(cut_ids)
    jj = jnp.asarray(ids_np // Nx, dtype=jnp.int32)
    ii = jnp.asarray(ids_np % Nx, dtype=jnp.int32)
    rH, rV = r.H * wH, r.V * wV
    rl = jnp.concatenate([rH[:, jj, ii], rV[:, jj, ii + 1],
                          rH[:, jj + 1, ii], rV[:, jj, ii]], axis=0)
    xc = _einsum("cij,jc->ic", Binv, rl).reshape(4, fbs, -1)
    H = jnp.zeros_like(r.H)
    H = H.at[:, jj, ii].add(xc[0]).at[:, jj + 1, ii].add(xc[2])
    V = jnp.zeros_like(r.V)
    V = V.at[:, jj, ii].add(xc[3]).at[:, jj, ii + 1].add(xc[1])
    return mask_cl(sys, GridVecCL(H * wH, V * wV))


def make_cut_patch_smoother_cl(sys: StructuredFaceSystem, S_cl, cut_ids):
    """Interface-patch additive Schwarz smoother, cells-last (cf.
    structured.make_cut_patch_smoother for the construction and
    rationale)."""
    Binv, wH, wV = cut_patch_setup_cl(sys, S_cl, cut_ids)

    def apply_patch(r: GridVecCL) -> GridVecCL:
        return apply_cut_patch_cl(sys, cut_ids, Binv, wH, wV, r)

    return apply_patch


def solve_recover_cl(sys: StructuredFaceSystem, cond: CondensedCL,
                     x: GridVecCL, gF_cl=None):
    """Face solution -> per-cell local dofs [C, d] (row-major output for
    postprocessing)."""
    uF = grid_gather_cl(sys, mask_cl(sys, x))
    if gF_cl is not None:
        uF = uF + gF_cl
    uT = recover_cells_cl(cond, uF)
    return jnp.concatenate([uT, uF], axis=0).T
