"""Fused Pallas local-assembly kernel for fitted HHO on quadrilateral
cells (the hot op of the cutHHO fictdom benchmark).

The XLA path (methods/hho.py) materializes ~40 intermediate [C, Q, B, ...]
tensors whose small trailing dims tile-pad 10-36x on TPU; at 1024^2 the
local-operator build costs ~2.4 s, two orders of magnitude above its
memory bound. This kernel computes, for a block of cells held in the
*lane* dimension:

    quadrature -> monomial basis/gradients -> reconstruction stiffness ->
    face couplings -> unrolled Cholesky solve -> data = gr_rhs^T oper ->
    naive stabilization (closed-form fbs x fbs inverse) -> lc

entirely in registers/VMEM: HBM traffic is corners + face geometry in,
lc out. All loops over quadrature points and basis indices are unrolled
in Python at trace time (sizes are O(10)); every value is a [BLK] vector.

Scope: quad cells (bilinear map), fitted operator + naive stabilization —
exactly the uncut path of the fictdom driver, valid for any hho degree.
Cut cells are overwritten by the (tiny) cut-class kernels afterwards.
Correctness is asserted against the XLA path in tests (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import bases, quadrature
from ..core.ops import HHODegreeInfo

BLK = 256  # cells per kernel instance (lane-dim multiples of 128)


def _chol_solve_unrolled(A, B):
    """Solve A X = B with A an n x n SPD matrix of [BLK] lane-vectors
    (list-of-lists) and B an n x m list-of-lists. Unrolled Cholesky +
    forward/back substitution; all ops are elementwise over lanes."""
    n = len(A)
    m = len(B[0])
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    # forward: L Y = B
    Y = [[None] * m for _ in range(n)]
    for i in range(n):
        for c in range(m):
            s = B[i][c]
            for k in range(i):
                s = s - L[i][k] * Y[k][c]
            Y[i][c] = s / L[i][i]
    # backward: L^T X = Y
    X = [[None] * m for _ in range(n)]
    for i in reversed(range(n)):
        for c in range(m):
            s = Y[i][c]
            for k in range(i + 1, n):
                s = s - L[k][i] * X[k][c]
            X[i][c] = s / L[i][i]
    return X


def _small_inv_mul(M, B):
    """X = M^-1 B for n <= 3 (closed-form adjugate), entries are lane
    vectors; M SPD."""
    n = len(M)
    m = len(B[0])
    if n == 1:
        inv = [[1.0 / M[0][0]]]
    elif n == 2:
        det = M[0][0] * M[1][1] - M[0][1] * M[1][0]
        idet = 1.0 / det
        inv = [[M[1][1] * idet, -M[0][1] * idet],
               [-M[1][0] * idet, M[0][0] * idet]]
    elif n == 3:
        a, b, c = M[0]
        d, e, f = M[1]
        g, h, i = M[2]
        A = e * i - f * h
        Bc = -(d * i - f * g)
        Cc = d * h - e * g
        det = a * A + b * Bc + c * Cc
        idet = 1.0 / det
        inv = [[A * idet, -(b * i - c * h) * idet, (b * f - c * e) * idet],
               [Bc * idet, (a * i - c * g) * idet, -(a * f - c * d) * idet],
               [Cc * idet, -(a * h - b * g) * idet, (a * e - b * d) * idet]]
    else:
        return _chol_solve_unrolled(M, B)
    return [[sum(inv[i][k] * B[k][c] for k in range(n)) for c in range(m)]
            for i in range(n)]


def _basis_terms(bx, by, px, py, invh, want_grads=True):
    """Monomial values and gradients for exponent tables px/py, as lists of
    lane vectors. Powers built by repeated multiplication (cached)."""
    deg = int(max(px.max(), py.max()))
    powx = [None] * (deg + 2)
    powy = [None] * (deg + 2)
    powx[0] = 1.0
    powy[0] = 1.0
    for p in range(1, deg + 1):
        powx[p] = bx * (powx[p - 1] if p > 1 else 1.0)
        powy[p] = by * (powy[p - 1] if p > 1 else 1.0)

    def P(pows, e):
        return pows[e] if e > 0 else None  # None == 1.0

    def mul(a, b):
        if a is None:
            return b if b is not None else None
        if b is None:
            return a
        return a * b

    phi, dphix, dphiy = [], [], []
    for ex, ey in zip(px, py):
        fx, fy = P(powx, ex), P(powy, ey)
        v = mul(fx, fy)
        phi.append(v)
        if want_grads:
            if ex > 0:
                t = mul(P(powx, ex - 1), fy)
                dx = (float(ex) * invh) if t is None \
                    else (float(ex) * invh) * t
            else:
                dx = 0.0
            if ey > 0:
                t = mul(fx, P(powy, ey - 1))
                dy = (float(ey) * invh) if t is None \
                    else (float(ey) * invh) * t
            else:
                dy = 0.0
            dphix.append(dx)
            dphiy.append(dy)
    # replace None (constant 1) by 1.0 scalars; callers multiply by w
    phi = [1.0 if v is None else v for v in phi]
    return phi, dphix, dphiy


def _make_kernel(hdi: HHODegreeInfo):
    recdeg = hdi.reconstruction_degree
    celdeg = hdi.cell_degree
    facdeg = hdi.face_degree
    rbs = bases.cell_basis_size(recdeg)
    cbs = bases.cell_basis_size(celdeg)
    fbs = bases.face_basis_size(facdeg)
    d = cbs + 4 * fbs
    px, py = bases._exponent_tables(recdeg)

    # static quadrature tables
    gx, gw = quadrature.gauss_legendre(2 * recdeg)      # cell rule, per axis
    fx_, fw_ = quadrature.gauss_legendre(2 * facdeg)    # face rule

    def kernel(corners_ref, bar_ref, diam_ref, meas_ref, normals_ref,
               fgeo_ref, out_ref):
        # corners [4, 2, BLK]; bar [2, BLK]; diam/meas [1, BLK];
        # normals [4, 2, BLK]; fgeo [4, 5, BLK] (fbar x/y, fbase x/y, fh);
        # out [d*d, BLK]
        X = [corners_ref[i, 0, :] for i in range(4)]
        Y = [corners_ref[i, 1, :] for i in range(4)]
        bx0, by0 = bar_ref[0, :], bar_ref[1, :]
        invh = 2.0 / diam_ref[0, :]
        inv_meas = 1.0 / meas_ref[0, :]

        stiff = [[0.0] * rbs for _ in range(rbs)]
        for qj in range(len(gx)):
            for qi in range(len(gx)):
                xi, eta = float(gx[qi]), float(gx[qj])
                s0 = 0.25 * (1 - xi) * (1 - eta)
                s1 = 0.25 * (1 + xi) * (1 - eta)
                s2 = 0.25 * (1 + xi) * (1 + eta)
                s3 = 0.25 * (1 - xi) * (1 + eta)
                pxq = s0 * X[0] + s1 * X[1] + s2 * X[2] + s3 * X[3]
                pyq = s0 * Y[0] + s1 * Y[1] + s2 * Y[2] + s3 * Y[3]
                j11 = 0.25 * ((X[1] - X[0]) * (1 - eta) +
                              (X[2] - X[3]) * (1 + eta))
                j12 = 0.25 * ((Y[1] - Y[0]) * (1 - eta) +
                              (Y[2] - Y[3]) * (1 + eta))
                j21 = 0.25 * ((X[3] - X[0]) * (1 - xi) +
                              (X[2] - X[1]) * (1 + xi))
                j22 = 0.25 * ((Y[3] - Y[0]) * (1 - xi) +
                              (Y[2] - Y[1]) * (1 + xi))
                w = float(gw[qi] * gw[qj]) * jnp.abs(j11 * j22 - j12 * j21)
                bxv = (pxq - bx0) * invh
                byv = (pyq - by0) * invh
                _, dx, dy = _basis_terms(bxv, byv, px, py, invh)
                for i in range(rbs):
                    for j in range(i + 1):
                        if isinstance(dx[i], float) and isinstance(dy[i],
                                                                   float):
                            continue  # constant basis: zero gradient
                        t = dx[i] * dx[j] + dy[i] * dy[j]
                        stiff[i][j] = stiff[i][j] + w * t
        for i in range(rbs):
            for j in range(i + 1, rbs):
                stiff[i][j] = stiff[j][i]

        # gr_rhs [rbs-1, d], stab accumulators
        gr = [[0.0] * d for _ in range(rbs - 1)]
        for i in range(rbs - 1):
            for j in range(cbs):
                gr[i][j] = stiff[i + 1][j]

        lc = [[0.0] * d for _ in range(d)]   # stabilization goes here

        for f in range(4):
            e0x, e0y = X[f], Y[f]
            e1x, e1y = X[(f + 1) % 4], Y[(f + 1) % 4]
            nx = normals_ref[f, 0, :]
            ny = normals_ref[f, 1, :]
            fbarx = fgeo_ref[f, 0, :]
            fbary = fgeo_ref[f, 1, :]
            fbasex = fgeo_ref[f, 2, :]
            fbasey = fgeo_ref[f, 3, :]
            fh = fgeo_ref[f, 4, :]
            seg = 0.5 * jnp.sqrt((e1x - e0x) ** 2 + (e1y - e0y) ** 2)
            inv_fh2 = 4.0 / (fh * fh)

            fmass = [[0.0] * fbs for _ in range(fbs)]
            ftrace = [[0.0] * cbs for _ in range(fbs)]
            for q in range(len(fx_)):
                t = float(fx_[q])
                pxq = 0.5 * (1 - t) * e0x + 0.5 * (1 + t) * e1x
                pyq = 0.5 * (1 - t) * e0y + 0.5 * (1 + t) * e1y
                w = float(fw_[q]) * seg
                bxv = (pxq - bx0) * invh
                byv = (pyq - by0) * invh
                phi, dx, dy = _basis_terms(bxv, byv, px, py, invh)
                dn = [dx[i] * nx + dy[i] * ny for i in range(rbs)]
                ep = (fbasex * (pxq - fbarx) + fbasey * (pyq - fbary)) \
                    * inv_fh2
                fphi = [1.0]
                for p in range(1, fbs):
                    fphi.append(fphi[-1] * ep)
                # gr_rhs face couplings (hho.hpp:82-83)
                for i in range(rbs - 1):
                    wdn = w * dn[i + 1]
                    for b in range(fbs):
                        col = cbs + f * fbs + b
                        gr[i][col] = gr[i][col] + wdn * fphi[b]
                    for jc in range(cbs):
                        gr[i][jc] = gr[i][jc] - wdn * phi[jc]
                # stabilization mass/trace (hho.hpp:132-140)
                for a in range(fbs):
                    wf = w * fphi[a]
                    for b in range(a + 1):
                        fmass[a][b] = fmass[a][b] + wf * fphi[b]
                    for jc in range(cbs):
                        ftrace[a][jc] = ftrace[a][jc] + wf * phi[jc]
            for a in range(fbs):
                for b in range(a + 1, fbs):
                    fmass[a][b] = fmass[b][a]

            # naive stab: R = fmass^-1 ftrace; contribution / meas
            R = _small_inv_mul(fmass, ftrace)
            MR = [[sum(fmass[a][k] * R[k][jc] for k in range(fbs))
                   for jc in range(cbs)] for a in range(fbs)]
            # (cell, cell) += R^T M R
            for i in range(cbs):
                for j in range(cbs):
                    lc[i][j] = lc[i][j] + inv_meas * sum(
                        R[a][i] * MR[a][j] for a in range(fbs))
            # (cell, face) -= R^T M ; (face, cell) -= M R
            for i in range(cbs):
                for b in range(fbs):
                    col = cbs + f * fbs + b
                    v = inv_meas * sum(R[a][i] * fmass[a][b]
                                       for a in range(fbs))
                    lc[i][col] = lc[i][col] - v
                    lc[col][i] = lc[col][i] - v
            # (face, face) += M
            for a in range(fbs):
                for b in range(fbs):
                    lc[cbs + f * fbs + a][cbs + f * fbs + b] = \
                        lc[cbs + f * fbs + a][cbs + f * fbs + b] + \
                        inv_meas * fmass[a][b]

        # reconstruction solve + data = gr^T oper
        gr_lhs = [[stiff[i + 1][j + 1] for j in range(rbs - 1)]
                  for i in range(rbs - 1)]
        oper = _chol_solve_unrolled(gr_lhs, gr)
        for i in range(d):
            for j in range(d):
                lc[i][j] = lc[i][j] + sum(gr[r][i] * oper[r][j]
                                          for r in range(rbs - 1))

        for i in range(d):
            for j in range(d):
                v = lc[i][j]
                if isinstance(v, float):
                    v = jnp.full((out_ref.shape[1],), v,
                                 dtype=out_ref.dtype)
                out_ref[i * d + j, :] = v

    return kernel, d


@functools.partial(jax.jit, static_argnames=("cell_degree", "face_degree",
                                             "interpret", "cells_last"))
def fused_local_operator(corners, bar, diam, meas, normals, fgeo,
                         cell_degree: int, face_degree: int,
                         interpret: bool = False,
                         cells_last: bool = False):
    """lc [C, d, d] = reconstruction data + naive stabilization for quad
    cells, via the fused kernel. With ``cells_last``, returns the kernel's
    native [d*d, C] layout untransposed (the dense TPU layout — see
    methods/cells_last.py).

    corners [4, 2, C]; bar [2, C]; diam/meas [1, C]; normals [4, 2, C];
    fgeo [4, 5, C] (face barycenter x/y, face-basis base vector x/y,
    face length), all cells-last and C a multiple of BLK.
    """
    hdi = HHODegreeInfo(cell_degree, face_degree)
    kernel, d = _make_kernel(hdi)
    C = corners.shape[-1]
    assert C % BLK == 0

    # NOTE: index-map literals must be np.int32 — under jax_enable_x64
    # (the mixed-precision bench mode) plain `0` literals trace as i64,
    # which Mosaic fails to legalize ("func.return (i64, i64, i32)").
    zero = np.int32(0)
    spec = lambda *dims: pl.BlockSpec((*dims, BLK),
                                      lambda i: (*(zero,) * len(dims), i),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(C // BLK,),
        in_specs=[spec(4, 2), spec(2), spec(1), spec(1), spec(4, 2),
                  spec(4, 5)],
        out_specs=spec(d * d),
        out_shape=jax.ShapeDtypeStruct((d * d, C), corners.dtype),
        interpret=interpret,
    )(corners, bar, diam, meas, normals, fgeo)
    if cells_last:
        return out
    return jnp.transpose(out.reshape(d, d, C), (2, 0, 1))


def pack_inputs(mesh, geom):
    """Transpose mesh/geometry data into the kernel's cells-last layout,
    padding the cell count to a BLK multiple (padded cells replicate cell
    0; callers slice the output)."""
    from ..core.geometry import cell_points

    C = mesh.num_cells
    Cpad = -(-C // BLK) * BLK
    cp = cell_points(mesh)[:, :4, :]

    def pad(a):  # [C, ...] -> [Cpad, ...]
        if Cpad == C:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (Cpad - C,) + a.shape[1:])], axis=0)

    corners = jnp.transpose(pad(cp), (1, 2, 0))
    bar = jnp.transpose(pad(geom.bar), (1, 0))
    diam = pad(geom.diam)[None, :]
    meas = pad(geom.meas)[None, :]
    normals = jnp.transpose(pad(geom.normals[:, :4]), (1, 2, 0))
    fbar = geom.face_bar[:, :4]
    fbase = fbar - geom.face_pts[:, :4, 0, :]
    fgeo = jnp.concatenate(
        [fbar, fbase, geom.face_h[:, :4, None]], axis=2)   # [C, 4, 5]
    fgeo = jnp.transpose(pad(fgeo), (1, 2, 0))
    return corners, bar, diam, meas, normals, fgeo, C


def fitted_local_operator(mesh, geom, hdi: HHODegreeInfo,
                          interpret: bool = False,
                          cells_last: bool = False):
    """Drop-in fused replacement for
    ``poisson.assemble_local(mesh, geom, hdi, "naive")[1]`` on all-quad
    meshes. With ``cells_last``, returns [d*d, C] (the kernel's native
    layout; see methods/cells_last.py) instead of [C, d, d]."""
    if not (mesh.kind == "quad" or mesh.all_quads):
        raise ValueError("fused kernel requires quadrilateral cells")
    corners, bar, diam, meas, normals, fgeo, C = pack_inputs(mesh, geom)
    lc = fused_local_operator(corners, bar, diam, meas, normals, fgeo,
                              hdi.cell_degree, hdi.face_degree,
                              interpret=interpret, cells_last=cells_last)
    return lc[:, :C] if cells_last else lc[:C]
