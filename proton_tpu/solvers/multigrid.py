"""Geometric multigrid preconditioner for the condensed HHO face system
on structured meshes.

The condensed Schur system is spectrally a second-order elliptic operator
on the face skeleton; Jacobi-PCG iteration counts grow ~linearly in N
(7.9k iterations at 1024^2). This V-cycle brings them down to O(10-100):

- hierarchy: the *same discretization* reassembled on meshes N, N/2, ...
  (rediscretized coarse operators — for cut problems the coarse level is
  simply the cutHHO operator on the coarser background mesh);
- transfers: *reconstruction-based* prolongation (the HHO-multigrid
  construction, cf. Di Pietro et al. / Lu-Rupp-Kanschat): coarse face
  dofs -> harmonic cell extension u_T = -A_TT^-1 A_TF u_F -> potential
  reconstruction R(u_T, u_F) of degree k+1 (constant closed by the cell
  mean) -> L2 trace projection onto the 12 fine sub-faces of the 2x2
  refinement. For uniform square cells this collapses into 12 fixed
  [fbs, 4*fbs] matrices per level (computed numerically on a one-cell
  mesh with the production kernels, so every basis convention matches by
  construction), applied as a pure stencil over the face grids — no
  gathers. Fine faces on the coarse skeleton average the two adjacent
  coarse-cell reconstructions. Restriction is the *exact adjoint* via
  jax.linear_transpose, which keeps the V-cycle symmetric (valid as a CG
  preconditioner with equal pre/post smoothing);
- smoothing: damped per-face block-Jacobi (each fbs x fbs condensed
  diagonal block inverted once at setup), or damped point-Jacobi;
- coarsest level: dense Cholesky (the operator densified by applying it
  to identity columns once at setup).

The legacy constant-injection transfers of round 1 (make_prolongation)
are kept for comparison; build_multigrid uses the reconstruction-based
ones whenever ``hdi`` is provided.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..methods.structured import (GridVec, StructuredFaceSystem,
                                  block_jacobi_preconditioner,
                                  make_structured_operator,
                                  make_structured_system,
                                  structured_diagonal)


def _einsum(*args):
    """f32 contractions at HIGHEST precision: the TPU MXU's DEFAULT is a
    single bf16 pass (~4e-3 relative error per contraction) — transfer/
    operator noise at that level makes the V-cycle a *different* map on
    every apply, which floors the outer f32 CG (measured: the Galerkin
    hierarchy stagnated at rel ~2e-4 with DEFAULT-precision convs)."""
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


def _half_face_embedding(fbs: int, dtype):
    """Matrices E0, E1 [fbs, fbs] mapping coarse-face basis coefficients
    to the two half-faces' coefficients (exact trace embedding).

    The face basis is 1D monomials in ep in [-1, 1] along the face; the
    left half (toward endpoint p0 of the coarse face) sees
    ep_c = (ep_f - 1)/2, the right half ep_c = (ep_f + 1)/2. BUT the
    global face basis is oriented by sorted point ids; on a structured
    grid, collinear H-faces (and V-faces) share the orientation of
    increasing x (resp. y), so "left/right half" is consistent.
    """
    E0 = np.zeros((fbs, fbs))
    E1 = np.zeros((fbs, fbs))
    # coefficient of ep_f^m in ((ep_f + s)/2)^j, s = -1 (left), +1 (right)
    from math import comb
    for j in range(fbs):
        for m in range(j + 1):
            c = comb(j, m) / 2 ** j
            E0[m, j] += c * (-1.0) ** (j - m)
            E1[m, j] += c
    return jnp.asarray(E0.astype(dtype)), jnp.asarray(E1.astype(dtype))


def make_prolongation(sys_f: StructuredFaceSystem,
                      sys_c: StructuredFaceSystem, dtype=jnp.float32):
    """xc (coarse GridVec) -> fine GridVec. Linear; restriction is its
    transpose (jax.linear_transpose)."""
    Nf, fbs = sys_f.Nx, sys_f.fbs
    Nc = sys_c.Nx
    assert Nf == 2 * Nc and sys_f.Ny == 2 * sys_c.Ny
    E0, E1 = _half_face_embedding(fbs, np.float32 if dtype == jnp.float32
                                  else np.float64)

    def prolong(xc: GridVec) -> GridVec:
        Hc, Vc = xc.H, xc.V              # [Nc+1, Nc, fbs], [Nc, Nc+1, fbs]
        Nyc, Nxc = Hc.shape[0] - 1, Hc.shape[1]
        # coplanar H rows (fine row 2J): split each coarse face into halves
        left = _einsum("mk,yxk->yxm", E0, Hc)   # fine col 2I
        right = _einsum("mk,yxk->yxm", E1, Hc)  # fine col 2I+1
        Heven = jnp.stack([left, right], axis=2).reshape(
            Nyc + 1, 2 * Nxc, fbs)
        # mid H rows (fine row 2J+1): mean value of the vertically
        # adjacent coarse faces, injected into the constant component
        mid_mean = 0.5 * (Hc[:-1, :, 0] + Hc[1:, :, 0])   # [Nyc, Nxc]
        Hodd = jnp.zeros((Nyc, 2 * Nxc, fbs), dtype=Hc.dtype)
        Hodd = Hodd.at[:, 0::2, 0].set(mid_mean)
        Hodd = Hodd.at[:, 1::2, 0].set(mid_mean)
        H = jnp.zeros((2 * Nyc + 1, 2 * Nxc, fbs), dtype=Hc.dtype)
        H = H.at[0::2].set(Heven).at[1::2].set(Hodd)

        # V faces: mirrored construction
        Nyv, Nxv = Vc.shape[0], Vc.shape[1] - 1
        bot = _einsum("mk,yxk->yxm", E0, Vc)
        top = _einsum("mk,yxk->yxm", E1, Vc)
        Veven = jnp.stack([bot, top], axis=1).reshape(
            2 * Nyv, Nxv + 1, fbs)
        vmid = 0.5 * (Vc[:, :-1, 0] + Vc[:, 1:, 0])
        Vodd = jnp.zeros((2 * Nyv, Nxv, fbs), dtype=Vc.dtype)
        Vodd = Vodd.at[0::2, :, 0].set(vmid)
        Vodd = Vodd.at[1::2, :, 0].set(vmid)
        V = jnp.zeros((2 * Nyv, 2 * Nxv + 1, fbs), dtype=Vc.dtype)
        V = V.at[:, 0::2].set(Veven).at[:, 1::2].set(Vodd)

        # frozen (Dirichlet) fine faces receive nothing
        return GridVec(H * sys_f.freeH[..., None],
                       V * sys_f.freeV[..., None])

    return prolong


def _transfer_slot_matrices(hdi, h: float, dtype):
    """12 fine-face transfer matrices [fbs, nfd] for one coarse square
    cell of side ``h`` and its 2x2 refinement (see module docstring).

    Returned as (MH [3, 2, fbs, nfd], MV [2, 3, fbs, nfd]) indexed by the
    fine-face position inside the coarse cell: MH[r, c] is the horizontal
    fine face at height r*h/2 and column c; MV[r, c] the vertical fine
    face at abscissa c*h/2 and row r. Not h-invariant: the naive
    stabilization scales as 1/h against the O(1) reconstruction term, so
    the harmonic extension T depends on h — compute per level.
    """
    PH, PV = _transfer_face_projectors(hdi, h)
    recmap = _unit_recmap(hdi, h)
    MH = _einsum("rcfb,bn->rcfn", PH, recmap)
    MV = _einsum("rcfb,bn->rcfn", PV, recmap)
    return MH.astype(dtype), MV.astype(dtype)


def _unit_recmap(hdi, h: float):
    """Harmonic-extension reconstruction map [rbs, nfd] of the uniform
    square cell of side ``h``: coarse face dofs -> cell extension
    u_T = -A_TT^-1 A_TF u_F -> full degree-(k+1) reconstruction (constant
    closed by the cell mean). The per-cell half of the transfer stencils;
    cut-aware transfers replace it by each irregular cell's own map."""
    from ..core import bases, quadrature
    from ..core.geometry import cell_geometry
    from ..core.mesh import make_quad_mesh
    from ..methods import hho

    mesh_c = make_quad_mesh(Nx=1, Ny=1, min_x=0.0, max_x=h,
                            min_y=0.0, max_y=h)
    geom_c = cell_geometry(mesh_c)
    oper, data = hho.hho_laplacian(mesh_c, geom_c, hdi)
    stab = hho.naive_stabilization(mesh_c, geom_c, hdi)
    lc = (data + stab)[0]
    cbs = bases.cell_basis_size(hdi.cell_degree)
    fbs = bases.face_basis_size(hdi.face_degree)
    recdeg = hdi.reconstruction_degree
    nfd = 4 * fbs
    d = cbs + nfd

    # Cholesky (ATT is SPD, as in condensation.condense): XLA:TPU has no
    # f64 LuDecomposition
    chol_TT = jnp.linalg.cholesky(lc[:cbs, :cbs])
    T = -jax.scipy.linalg.cho_solve((chol_TT, True),
                                    lc[:cbs, cbs:])          # [cbs, nfd]
    Vmap = jnp.concatenate([T, jnp.eye(nfd, dtype=lc.dtype)], axis=0)

    # full reconstruction: rows 1: are the gradient-reconstruction
    # operator; the constant row closes the cell mean, m @ (Rfull v) =
    # m[:cbs] @ u_T with m_i = int_T rphi_i.
    rule = quadrature.cell_rule(mesh_c, geom_c, recdeg)
    rphi = bases.eval_cell_basis(rule.pts, geom_c.bar[:, None, :],
                                 geom_c.diam[:, None], recdeg)
    m = _einsum("cq,cqi->ci", rule.w, rphi)[0]            # [rbs]
    R1 = oper[0]                                             # [rbs-1, d]
    Icbs = jnp.zeros((cbs, d), lc.dtype).at[:, :cbs].set(
        jnp.eye(cbs, dtype=lc.dtype))
    r0 = (m[:cbs] @ Icbs - m[1:] @ R1) / m[0]                # [d]
    Rfull = jnp.concatenate([r0[None, :], R1], axis=0)       # [rbs, d]
    return Rfull @ Vmap                                      # [rbs, nfd]


def _transfer_face_projectors(hdi, h: float):
    """Trace projections (PH [3, 2, fbs, rbs], PV [2, 3, fbs, rbs]) of
    the degree-(k+1) cell basis of one coarse square cell of side ``h``
    (anchored at the origin; translation-invariant by the (p - bar)/(h/2)
    basis scaling) onto its 12 fine sub-faces: PH[r, c] maps
    reconstruction coefficients to the face-basis L2 projection on the
    horizontal fine face at height r*h/2, column c. The geometric half of
    the transfer stencils: M_slot = P_slot @ recmap."""
    from ..core import bases, quadrature
    from ..core.geometry import cell_geometry
    from ..core.mesh import make_quad_mesh

    mesh_c = make_quad_mesh(Nx=1, Ny=1, min_x=0.0, max_x=h,
                            min_y=0.0, max_y=h)
    geom_c = cell_geometry(mesh_c)
    recdeg = hdi.reconstruction_degree
    bar_c, diam_c = geom_c.bar[0], geom_c.diam[0]
    dt = mesh_c.points.dtype

    def face_proj(p0, p1):
        # p0 is the sorted-ptid endpoint (left for H faces, bottom for V),
        # matching the generator's face-basis orientation.
        p0 = jnp.asarray(p0, dt)
        p1 = jnp.asarray(p1, dt)
        frule = quadrature.face_rule(p0, p1, hdi.face_degree + recdeg)
        fbar = 0.5 * (p0 + p1)
        fphi = bases.eval_face_basis(frule.pts, fbar, fbar - p0,
                                     jnp.linalg.norm(p1 - p0),
                                     hdi.face_degree)         # [Q, fbs]
        rphiF = bases.eval_cell_basis(frule.pts, bar_c, diam_c, recdeg)
        Mf = _einsum("q,qi,qj->ij", frule.w, fphi, fphi)
        B = _einsum("q,qi,qr->ir", frule.w, fphi, rphiF)
        cf = jnp.linalg.cholesky(Mf)             # SPD face mass matrix
        return jax.scipy.linalg.cho_solve((cf, True), B)

    hh = h / 2.0
    PH = jnp.stack([
        jnp.stack([face_proj((c * hh, r * hh), ((c + 1) * hh, r * hh))
                   for c in range(2)]) for r in range(3)])
    PV = jnp.stack([
        jnp.stack([face_proj((c * hh, r * hh), (c * hh, (r + 1) * hh))
                   for c in range(3)]) for r in range(2)])
    return PH, PV


def make_reconstruction_prolongation(sys_f: StructuredFaceSystem,
                                     sys_c: StructuredFaceSystem,
                                     hdi, h_coarse: float,
                                     dtype=jnp.float32):
    """Reconstruction-based coarse->fine transfer (module docstring):
    returns a linear callable GridVec_c -> GridVec_f."""
    from ..methods.structured import grid_gather

    fbs = sys_f.fbs
    assert sys_f.Nx == 2 * sys_c.Nx and sys_f.Ny == 2 * sys_c.Ny
    MH, MV = _transfer_slot_matrices(hdi, h_coarse, dtype)

    def prolong(xc: GridVec) -> GridVec:
        Nyc, Nxc = sys_c.Ny, sys_c.Nx
        xl = grid_gather(sys_c, xc).reshape(Nyc, Nxc, 4 * fbs)
        fh = _einsum("rcfn,YXn->YXrcf", MH, xl)   # [Nyc,Nxc,3,2,fbs]
        fv = _einsum("rcfn,YXn->YXrcf", MV, xl)   # [Nyc,Nxc,2,3,fbs]

        def cols2(a):   # [Nyc, Nxc, 2, fbs] -> [Nyc, 2*Nxc, fbs]
            return a.reshape(Nyc, 2 * Nxc, fbs)

        bot, mid_h, top = (cols2(fh[:, :, r]) for r in range(3))
        zrow = jnp.zeros((1, 2 * Nxc, fbs), dtype=bot.dtype)
        # coarse-skeleton rows average the two adjacent reconstructions
        Heven = 0.5 * (jnp.concatenate([bot, zrow], axis=0) +
                       jnp.concatenate([zrow, top], axis=0))
        H = jnp.zeros((2 * Nyc + 1, 2 * Nxc, fbs), dtype=bot.dtype)
        H = H.at[0::2].set(Heven).at[1::2].set(mid_h)

        def rows2(a):   # [Nyc, Nxc, 2, fbs] -> [2*Nyc, Nxc, fbs]
            return jnp.swapaxes(a, 1, 2).reshape(2 * Nyc, Nxc, fbs)

        left = rows2(fv[:, :, :, 0])
        mid_v = rows2(fv[:, :, :, 1])
        right = rows2(fv[:, :, :, 2])
        zcol = jnp.zeros((2 * Nyc, 1, fbs), dtype=left.dtype)
        Veven = 0.5 * (jnp.concatenate([left, zcol], axis=1) +
                       jnp.concatenate([zcol, right], axis=1))
        V = jnp.zeros((2 * Nyc, 2 * Nxc + 1, fbs), dtype=left.dtype)
        V = V.at[:, 0::2].set(Veven).at[:, 1::2].set(mid_v)

        return GridVec(H * sys_f.freeH[..., None],
                       V * sys_f.freeV[..., None])

    return prolong


def make_reconstruction_prolongation_cl(sys_f: StructuredFaceSystem,
                                        sys_c: StructuredFaceSystem,
                                        hdi, h_coarse: float,
                                        dtype=jnp.float32, mats=None,
                                        corr=None):
    """Cells-last variant of make_reconstruction_prolongation (operates on
    cells_last.GridVecCL grids). ``mats``: precomputed (MH, MV) transfer
    matrices (mg_setup_cl passes them across the jit boundary).

    ``corr``: optional CUT-AWARE correction (ids, drec, PH, PV) — the
    static coarse irregular-cell ids, their reconstruction-map deviations
    drec [rbs*nfd, Ci] (cells-last; each irregular cell's own Nitsche
    harmonic-extension reconstruction minus the uniform one,
    fictdom_structured._level_recdev), and the face trace projectors of
    _transfer_face_projectors. The prolonged value at each of the 12 fine
    faces of an irregular coarse cell gains P_slot @ drec_i @ xl_i
    (skeleton slots at the prolongation's 0.5 averaging weight), making
    the transfer the exact harmonic-extension interpolation of the CUT
    operator along the band — the O(1) transfer error at the interface
    was the diagnosed cause of the MG iteration growth in N."""
    from ..methods.cells_last import GridVecCL, grid_gather_cl

    fbs = sys_f.fbs
    assert sys_f.Nx == 2 * sys_c.Nx and sys_f.Ny == 2 * sys_c.Ny
    MH, MV = mats if mats is not None else \
        _transfer_slot_matrices(hdi, h_coarse, dtype)
    if corr is not None:
        ids, drec, PHc, PVc = corr
        ids_np = np.asarray(ids)
        cjj = jnp.asarray(ids_np // sys_c.Nx, jnp.int32)
        cii = jnp.asarray(ids_np % sys_c.Nx, jnp.int32)
        rbs = PHc.shape[-1]
        nfd = 4 * fbs

    def prolong(xc: "GridVecCL") -> "GridVecCL":
        Nyc, Nxc = sys_c.Ny, sys_c.Nx
        xl = grid_gather_cl(sys_c, xc).reshape(4 * fbs, Nyc, Nxc)
        fh = _einsum("rcfn,nYX->rcfYX", MH, xl)
        fv = _einsum("rcfn,nYX->rcfYX", MV, xl)

        def cols2(r):   # interleave the two column slots of H row r
            return jnp.stack([fh[r, 0], fh[r, 1]], axis=-1).reshape(
                fbs, Nyc, 2 * Nxc)

        bot, mid_h, top = cols2(0), cols2(1), cols2(2)
        zrow = jnp.zeros((fbs, 1, 2 * Nxc), bot.dtype)
        Heven = 0.5 * (jnp.concatenate([bot, zrow], axis=1) +
                       jnp.concatenate([zrow, top], axis=1))
        H = jnp.zeros((fbs, 2 * Nyc + 1, 2 * Nxc), bot.dtype)
        H = H.at[:, 0::2].set(Heven).at[:, 1::2].set(mid_h)

        def rows2(c):   # interleave the two row slots of V column c
            return jnp.stack([fv[0, c], fv[1, c]], axis=2).reshape(
                fbs, 2 * Nyc, Nxc)

        left, mid_v, right = rows2(0), rows2(1), rows2(2)
        zcol = jnp.zeros((fbs, 2 * Nyc, 1), left.dtype)
        Veven = 0.5 * (jnp.concatenate([left, zcol], axis=2) +
                       jnp.concatenate([zcol, right], axis=2))
        V = jnp.zeros((fbs, 2 * Nyc, 2 * Nxc + 1), left.dtype)
        V = V.at[:, :, 0::2].set(Veven).at[:, :, 1::2].set(mid_v)

        if corr is not None and ids_np.shape[0] > 0:
            xli = xl[:, cjj, cii]                        # [nfd, Ci]
            dv = jnp.stack([                             # [rbs, Ci]
                sum(drec[r * nfd + n] * xli[n] for n in range(nfd))
                for r in range(rbs)])
            for r in range(3):
                w = 0.5 if r != 1 else 1.0
                for c in range(2):
                    add = w * _einsum("fb,bi->fi", PHc[r, c], dv)
                    H = H.at[:, 2 * cjj + r, 2 * cii + c].add(add)
            for rr in range(2):
                for c in range(3):
                    w = 0.5 if c != 1 else 1.0
                    add = w * _einsum("fb,bi->fi", PVc[rr, c], dv)
                    V = V.at[:, 2 * cjj + rr, 2 * cii + c].add(add)

        return GridVecCL(H * sys_f.freeH[None], V * sys_f.freeV[None])

    return prolong


def _tree_axpby(a, x, b, y):
    return jax.tree.map(lambda xx, yy: a * xx + b * yy, x, y)


def estimate_lambda_max(apply_A, precond, like, iters: int = 12,
                        safety: float = 1.05):
    """Power iteration on M^-1 A (deterministic all-ones start); the
    standard Chebyshev-smoother eigenvalue estimate. Runs traced at
    setup; ``like`` provides the vector structure."""
    v = jax.tree.map(jnp.ones_like, like)

    def norm(x):
        return jnp.sqrt(sum(jnp.vdot(l, l).real
                            for l in jax.tree.leaves(x)))

    lam = jnp.asarray(1.0, jax.tree.leaves(like)[0].dtype)
    for _ in range(iters):
        w = precond(apply_A(v))
        lam = norm(w)
        v = jax.tree.map(lambda a: a / lam, w)
    return lam * safety


def make_chebyshev_smoother(apply_A, precond, lam_max, degree: int = 4,
                            alpha: float = 4.0):
    """Chebyshev(degree) polynomial smoother targeting the upper part
    [lam_max/alpha, lam_max] of the M^-1 A spectrum (Adams et al.,
    'Parallel multigrid smoothing'): r -> accumulated correction. Only
    matvecs and the base preconditioner — the TPU-friendly alternative
    to Gauss-Seidel, and far stronger per-application than damped
    Jacobi. SPD (a fixed polynomial in M^-1 A applied to M^-1), so the
    V-cycle stays a valid CG preconditioner."""
    lmin = lam_max / alpha
    theta = 0.5 * (lam_max + lmin)
    delta = 0.5 * (lam_max - lmin)
    sigma = theta / delta

    def smooth(r):
        rho = 1.0 / sigma
        z = precond(r)
        d = jax.tree.map(lambda a: a / theta, z)
        x = d
        for _ in range(degree - 1):
            r = _tree_axpby(1.0, r, -1.0, apply_A(d))
            z = precond(r)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = _tree_axpby(rho_new * rho, d, 2.0 * rho_new / delta, z)
            x = jax.tree.map(lambda a, b: a + b, x, d)
            rho = rho_new
        return x

    return smooth


def make_reconstruction_restriction_cl(sys_f: StructuredFaceSystem,
                                       sys_c: StructuredFaceSystem,
                                       hdi, h_coarse: float,
                                       dtype=jnp.float32, mats=None,
                                       corr=None):
    """EXPLICIT adjoint of make_reconstruction_prolongation_cl, written
    as a stencil: per coarse cell, gather its 12 fine-face cotangents by
    strided slicing (skeleton faces carry the prolongation's 0.5
    averaging weight), contract with the transfer matrices transposed,
    and accumulate cell contributions onto the coarse grids with the
    scatter-free concatenation adds of grid_scatter_cl.

    jax.linear_transpose of the prolongation is numerically identical
    (tests assert it) but XLA transposes the interleaving into real
    SCATTERS — ~8 ns/element on TPU, which dominated the V-cycle
    (measured ~56 ms/iteration at 1024^2)."""
    from ..methods.cells_last import GridVecCL, grid_scatter_cl

    fbs = sys_f.fbs
    assert sys_f.Nx == 2 * sys_c.Nx and sys_f.Ny == 2 * sys_c.Ny
    MH, MV = mats if mats is not None else \
        _transfer_slot_matrices(hdi, h_coarse, dtype)
    Nyc, Nxc = sys_c.Ny, sys_c.Nx
    if corr is not None:
        # exact adjoint of the prolongation's cut-aware correction
        ids, drec, PHc, PVc = corr
        ids_np = np.asarray(ids)
        cjj = jnp.asarray(ids_np // sys_c.Nx, jnp.int32)
        cii = jnp.asarray(ids_np % sys_c.Nx, jnp.int32)
        rbs = PHc.shape[-1]
        nfd = 4 * fbs

    def restrict(rf: "GridVecCL") -> "GridVecCL":
        # adjoint of the prolongation's final masking: mask the input
        H = rf.H * sys_f.freeH[None]
        V = rf.V * sys_f.freeV[None]

        # coarse cell (J, I) sees fine H rows 2J (its bottom slot,
        # carrying the skeleton 0.5 averaging weight), 2J+1 (mid, its
        # own), 2J+2 (top, 0.5); columns (2I, 2I+1) pair contiguously
        re = H[:, 0::2, :].reshape(fbs, Nyc + 1, Nxc, 2)
        ro = H[:, 1::2, :].reshape(fbs, Nyc, Nxc, 2)
        fh = jnp.stack([0.5 * re[:, :-1], ro, 0.5 * re[:, 1:]],
                       axis=3)               # [fbs, Nyc, Nxc, 3r, 2c]

        # fine V cols 2I (left, 0.5), 2I+1 (mid), 2I+2 (right, 0.5);
        # rows (2J, 2J+1) pair contiguously
        ce = V[:, :, 0::2].reshape(fbs, Nyc, 2, Nxc + 1)
        co = V[:, :, 1::2].reshape(fbs, Nyc, 2, Nxc)
        fv = jnp.stack([0.5 * ce[..., :-1], co, 0.5 * ce[..., 1:]],
                       axis=4)               # [fbs, Nyc, 2r, Nxc, 3c]

        # transposed transfer contraction: xl_cot[n] =
        # sum_{r,c,f} M[r,c,f,n] * rf_slot[r,c,f]; then the cell->face
        # accumulation is the scatter-free concatenation add
        a = _einsum("rcfn,fYXrc->nYX", MH, fh)
        b = _einsum("rcfn,fYrXc->nYX", MV, fv)
        contrib = a + b                         # [nfd, Nyc, Nxc]

        if corr is not None and ids_np.shape[0] > 0:
            s = 0.0
            for r in range(3):
                w = 0.5 if r != 1 else 1.0
                for c in range(2):
                    rslot = H[:, 2 * cjj + r, 2 * cii + c]   # [fbs, Ci]
                    s = s + w * _einsum("fb,fi->bi", PHc[r, c], rslot)
            for rr in range(2):
                for c in range(3):
                    w = 0.5 if c != 1 else 1.0
                    rslot = V[:, 2 * cjj + rr, 2 * cii + c]
                    s = s + w * _einsum("fb,fi->bi", PVc[rr, c], rslot)
            dcot = jnp.stack([                   # [nfd, Ci]
                sum(drec[r * nfd + n] * s[r] for r in range(rbs))
                for n in range(nfd)])
            contrib = contrib.at[:, cjj, cii].add(dcot)

        return grid_scatter_cl(sys_c, contrib.reshape(4 * fbs,
                                                      Nyc * Nxc))

    return restrict


def _mg_sizes(N: int, coarsest: int):
    sizes = []
    n = N
    while n >= coarsest:
        sizes.append(n)
        if n == coarsest:
            break
        n //= 2
    return sizes


# ---------------------------------------------------------------------------
# Exact Galerkin coarse hierarchy (pair-operator coarsening engine)
#
# MEASURED ROOT CAUSE of the MG iteration growth on cut problems: the
# REDISCRETIZED coarse operator is non-Galerkin — on band-local modes it
# is much softer than R A_f P (the circle cuts coarse cells at different
# offsets; a coarse sliver's Nitsche block can be tiny where the fine
# cells under it are stiff), so the coarse correction OVERSHOOTS: the
# V-cycle error propagator has rho(E) ~ 4-5 at 128^2 (divergent as a
# stationary iteration; CG tolerates the outliers at ~1 iteration per
# outlier mode, whose count grows with the interface length — the
# 17 -> 32 -> 59 -> 446 growth). Two-level with EXACT Galerkin RAP:
# rho(E) = 0.90. Hybrids fail: RAP differs from the rediscretized
# operator GLOBALLY (the transfers do not reproduce the uniform coarse
# stencil — O(1) diagonal difference), so mixing redisc background with
# Galerkin band patches is inconsistent (measured rho 3-70). The coarse
# operators must be Galerkin everywhere.
#
# Representation (PairOp): A = translation-invariant CELL-PAIR stencil
# {direction d -> B_d [nfd, nfd]} (the Galerkin image of the uniform
# operator — applied on device as one small conv over the cell slot
# planes) + a sparse list of (row_cell, col_cell, block) deviations
# (cut/displaced cells, domain-boundary masking, and their propagated
# images). Coarsening is the exact triple product under the
# reconstruction-based transfers: each fine cell couples (parent,
# vertical neighbor, horizontal neighbor) coarse cells through M_loc
# built from the 12 transfer stencils with the 0.5 skeleton averaging,
# so a fine pair at direction d maps to coarse pairs within
# |d|//2 + 2 — the stencil footprint converges to 9x9 and the
# deviation list stays O(band + boundary) at every level.
# ---------------------------------------------------------------------------


def _mloc_cells(MH, MV, py: int, px: int):
    """Per-cell prolongation restriction of one fine child cell at
    position (py, px) inside its coarse parent: list of
    (coarse_cell_offset (dJ, dI), M [nfd_fine_faces, nfd_coarse]) over
    the (parent, vertical-neighbor, horizontal-neighbor) cells. Fine
    face slot order (bottom, right, top, left) matches grid_gather."""
    fbs = MH.shape[2]
    nfd = 4 * fbs
    b, r, t, l = 0, fbs, 2 * fbs, 3 * fbs
    P = np.zeros((nfd, nfd))
    V = np.zeros((nfd, nfd))
    H = np.zeros((nfd, nfd))
    if py == 0:    # bottom fine face on the coarse skeleton
        P[b:b + fbs] = 0.5 * MH[0, px]
        V[b:b + fbs] = 0.5 * MH[2, px]
        P[t:t + fbs] = MH[1, px]
    else:          # top fine face on the coarse skeleton
        P[b:b + fbs] = MH[1, px]
        P[t:t + fbs] = 0.5 * MH[2, px]
        V[t:t + fbs] = 0.5 * MH[0, px]
    if px == 0:    # left fine face on the coarse skeleton
        P[l:l + fbs] = 0.5 * MV[py, 0]
        H[l:l + fbs] = 0.5 * MV[py, 2]
        P[r:r + fbs] = MV[py, 1]
    else:          # right fine face on the coarse skeleton
        P[l:l + fbs] = MV[py, 1]
        P[r:r + fbs] = 0.5 * MV[py, 2]
        H[r:r + fbs] = 0.5 * MV[py, 0]
    voff = (2 * py - 1, 0)
    hoff = (0, 2 * px - 1)
    return [((0, 0), P), (voff, V), (hoff, H)]


def finest_pair_op(nf: int, S_u, dS, irr):
    """PairOp (const dict, (rows, cols, blocks)) of the finest level:
    the uniform block at direction (0, 0) plus the irregular deviations
    at their cells. The domain-boundary masking is added separately
    (mask_pair_op) before each coarsening step."""
    S_u = np.asarray(S_u, np.float64)
    nfd = S_u.shape[0]
    const = {(0, 0): S_u}
    irr = np.asarray(irr)
    dSm = np.moveaxis(np.asarray(dS, np.float64).reshape(
        nfd, nfd, len(irr)), -1, 0)
    dSm = 0.5 * (dSm + np.swapaxes(dSm, 1, 2))
    return const, (irr, irr.copy(), dSm)


def _frozen_slot_mask(n: int, cells, nfd: int):
    """[len(cells), nfd] multiplier zeroing the slots of domain-edge
    faces (bottom, right, top, left slot order; off-grid coordinates
    also read 0 — their faces do not exist)."""
    fbs = nfd // 4
    jj, ii = cells // n, cells % n
    m = np.ones((len(cells), nfd))
    m[jj <= 0, 0:fbs] = 0.0
    m[ii >= n - 1, fbs:2 * fbs] = 0.0
    m[jj >= n - 1, 2 * fbs:3 * fbs] = 0.0
    m[ii <= 0, 3 * fbs:4 * fbs] = 0.0
    return m


def mask_pair_op(n: int, const: dict, corr):
    """Corr list with the level's domain-boundary masking folded in:
    returns corr' such that const + corr' equals Z (const + corr) Z with
    Z zeroing the frozen (domain-edge) face dofs — the energy form the
    masked apply and the masked transfers realize. Needed before EVERY
    coarsening step (the dense harness confirms gap-2 exactness only
    with per-level masking)."""
    rows, cols, blocks = corr
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    blocks = np.asarray(blocks, np.float64)
    nfd = next(iter(const.values())).shape[0]

    # Z corr Z
    mr = _frozen_slot_mask(n, rows, nfd)
    mc = _frozen_slot_mask(n, cols, nfd)
    out_r = [rows]
    out_c = [cols]
    out_b = [blocks * mr[:, :, None] * mc[:, None, :]]

    # Z const Z - const on pairs touching the edge
    maxd = max((max(abs(dy), abs(dx)) for dy, dx in const), default=0)
    w = maxd + 1
    cells = np.arange(n * n)
    jj, ii = cells // n, cells % n
    frame = (jj < w) | (jj >= n - w) | (ii < w) | (ii >= n - w)
    fc = cells[frame]
    fj, fi = fc // n, fc % n
    for (dy, dx), B in const.items():
        cj, ci = fj + dy, fi + dx
        ok = (cj >= 0) & (cj < n) & (ci >= 0) & (ci < n)
        if not ok.any():
            continue
        rcell = fc[ok]
        ccell = (cj * n + ci)[ok]
        m1 = _frozen_slot_mask(n, rcell, nfd)
        m2 = _frozen_slot_mask(n, ccell, nfd)
        delta = B[None] * (m1[:, :, None] * m2[:, None, :]) - B[None]
        nz = np.abs(delta).max(axis=(1, 2)) > 0
        if nz.any():
            out_r.append(rcell[nz])
            out_c.append(ccell[nz])
            out_b.append(delta[nz])
    return _aggregate_pairs(np.concatenate(out_r),
                            np.concatenate(out_c),
                            np.concatenate(out_b, axis=0), n)


def _aggregate_pairs(rows, cols, blocks, n):
    key = rows.astype(np.int64) * (n * n) + cols.astype(np.int64)
    uk, inv = np.unique(key, return_inverse=True)
    agg = np.zeros((len(uk),) + blocks.shape[1:])
    np.add.at(agg, inv, blocks)
    return uk // (n * n), uk % (n * n), agg


def galerkin_coarsen_pair_op(hdi, nc: int, const_f: dict, corr_f,
                             domain: float = 1.0):
    """One exact Galerkin coarsening step of a PairOp: fine level
    nf = 2*nc -> coarse nc under the reconstruction-based transfers.
    Returns (const_c dict, (rows, cols, blocks))."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        MHj, MVj = _transfer_slot_matrices(hdi, domain / nc, jnp.float64)
    MH = np.asarray(MHj)
    MV = np.asarray(MVj)
    nfd = 4 * MH.shape[2]
    nf = 2 * nc
    mlocs = {(py, px): _mloc_cells(MH, MV, py, px)
             for py in (0, 1) for px in (0, 1)}

    # ---- translation-invariant part -----------------------------------
    const_c = {}
    for (py, px), ml_a in mlocs.items():
        for (dy, dx), B in const_f.items():
            qy, qx = (py + dy) % 2, (px + dx) % 2
            dPy, dPx = (py + dy) // 2, (px + dx) // 2
            for (ca, Ma) in ml_a:
                for (cb, Mb) in mlocs[(qy, qx)]:
                    d = (dPy + cb[0] - ca[0], dPx + cb[1] - ca[1])
                    const_c[d] = const_c.get(d, 0.0) + Ma.T @ B @ Mb

    # ---- deviation part ------------------------------------------------
    out_r, out_c, out_b = [], [], []

    def coarsen_pairs(ja, ia, jb, ib, blocks_f):
        """Exact triple product of explicit fine pairs (possibly with
        off-grid coordinates — combos whose coarse row/col cells are
        off-grid are dropped, which matches the masked transfers)."""
        pa_y, pa_x = ja % 2, ia % 2
        pb_y, pb_x = jb % 2, ib % 2
        Pa_j, Pa_i = ja // 2, ia // 2
        Pb_j, Pb_i = jb // 2, ib // 2
        for (py, px), ml_a in mlocs.items():
            for (qy, qx), ml_b in mlocs.items():
                sel = (pa_y == py) & (pa_x == px) & \
                      (pb_y == qy) & (pb_x == qx)
                if not sel.any():
                    continue
                Bsel = blocks_f[sel]
                for (ca, Ma) in ml_a:
                    rj, ri = Pa_j[sel] + ca[0], Pa_i[sel] + ca[1]
                    va = (rj >= 0) & (rj < nc) & (ri >= 0) & (ri < nc)
                    for (cb, Mb) in ml_b:
                        cj, ci = Pb_j[sel] + cb[0], Pb_i[sel] + cb[1]
                        ok = va & (cj >= 0) & (cj < nc) & (ci >= 0) & \
                            (ci < nc)
                        if not ok.any():
                            continue
                        out_r.append((rj * nc + ri)[ok])
                        out_c.append((cj * nc + ci)[ok])
                        out_b.append(np.einsum(
                            "im,cij,jn->cmn", Ma, Bsel[ok], Mb,
                            optimize=True))

    rows_f, cols_f, blocks_f = corr_f
    rows_f = np.asarray(rows_f)
    cols_f = np.asarray(cols_f)
    blocks_f = np.asarray(blocks_f, np.float64)
    coarsen_pairs(rows_f // nf, rows_f % nf, cols_f // nf, cols_f % nf,
                  blocks_f)

    # phantom-pair cancellation: the conv stencil is translation-
    # invariant, so near the grid edge it includes contributions whose
    # generating fine pair (fa, fb) does not exist (fa or fb off-grid)
    # while the coarse row/col cells ARE on-grid; emit their NEGATIVES.
    maxd = max((max(abs(dy), abs(dx)) for dy, dx in const_f),
               default=0)
    w = maxd + 2
    coords = np.arange(-1, nf + 1)
    JA, IA = np.meshgrid(coords, coords, indexing="ij")
    frame = (JA < w) | (JA >= nf - w) | (IA < w) | (IA >= nf - w)
    ja0 = JA[frame].ravel()
    ia0 = IA[frame].ravel()
    for (dy, dx), B in const_f.items():
        jb0, ib0 = ja0 + dy, ia0 + dx
        a_on = (ja0 >= 0) & (ja0 < nf) & (ia0 >= 0) & (ia0 < nf)
        b_on = (jb0 >= 0) & (jb0 < nf) & (ib0 >= 0) & (ib0 < nf)
        bad = ~(a_on & b_on)
        if not bad.any():
            continue
        nb = int(bad.sum())
        coarsen_pairs(ja0[bad], ia0[bad], jb0[bad], ib0[bad],
                      np.broadcast_to(-B, (nb,) + B.shape))

    if out_r:
        corr_c = _aggregate_pairs(np.concatenate(out_r),
                                  np.concatenate(out_c),
                                  np.concatenate(out_b, axis=0), nc)
    else:
        corr_c = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                  np.zeros((0, nfd, nfd)))
    return const_c, corr_c


class GalerkinLevel(NamedTuple):
    """One coarse level's exact-Galerkin operator + the diagonal data
    its band smoothers need (all arrays; index arrays traced)."""

    kernel: jnp.ndarray    # [nfd, nfd, ky, kx] constant conv stencil
    rows: jnp.ndarray      # [P] deviation pair row cells
    cols: jnp.ndarray      # [P] deviation pair col cells
    blocks: jnp.ndarray    # [P, nfd, nfd]
    BHu: jnp.ndarray       # [fbs, fbs] uniform interior H-face block
    BVu: jnp.ndarray
    fH: tuple              # (hj, hi, dBH [nH, fbs, fbs]) face deltas
    fV: tuple
    cells: jnp.ndarray     # [m] cells with deviating 4-face blocks
    cblocks: jnp.ndarray   # [m, nfd, nfd] EXACT 4-face restrictions
    Bu_cell: jnp.ndarray   # [nfd, nfd] uniform interior restriction
    coarse_Q: object = None     # COARSEST level only: host-f64 eigh
    coarse_winv: object = None  # pinv factor (see _coarse_solve)


def pair_op_diag_data(nc: int, const: dict, corr, fbs: int):
    """HOST: the Galerkin level's assembled face-diagonal data — the
    uniform interior H/V face blocks plus per-face deltas and the (c,c)
    cell deviation blocks (feeds the Galerkin-consistent patch/bj
    smoothers)."""
    nfd = 4 * fbs
    b, r, t, l = (slice(0, fbs), slice(fbs, 2 * fbs),
                  slice(2 * fbs, 3 * fbs), slice(3 * fbs, 4 * fbs))
    C00 = const[(0, 0)]
    C10 = const.get((1, 0), np.zeros((nfd, nfd)))
    C01 = const.get((0, 1), np.zeros((nfd, nfd)))
    BHu = C00[t, t] + C00[b, b] + C10[t, b] + C10[t, b].T
    BVu = C00[l, l] + C00[r, r] + C01[r, l] + C01[r, l].T

    rows, cols, blocks = corr
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    blocks = np.asarray(blocks)
    ja, ia = rows // nc, rows % nc
    jb, ib = cols // nc, cols % nc
    hkeys, hvals, vkeys, vvals = [], [], [], []

    diag = rows == cols
    if diag.any():
        jj, ii = ja[diag], ia[diag]
        B = blocks[diag]
        hkeys += [jj * nc + ii, (jj + 1) * nc + ii]
        hvals += [B[:, b, b], B[:, t, t]]
        vkeys += [jj * (nc + 1) + ii, jj * (nc + 1) + ii + 1]
        vvals += [B[:, l, l], B[:, r, r]]
    up = (jb == ja + 1) & (ib == ia)      # row cell below col cell
    if up.any():
        jj, ii = ja[up], ia[up]
        hkeys.append((jj + 1) * nc + ii)
        hvals.append(blocks[up][:, t, b])
    dn = (jb == ja - 1) & (ib == ia)
    if dn.any():
        jj, ii = ja[dn], ia[dn]
        hkeys.append(jj * nc + ii)
        hvals.append(blocks[dn][:, b, t])
    rt = (ib == ia + 1) & (jb == ja)
    if rt.any():
        jj, ii = ja[rt], ia[rt]
        vkeys.append(jj * (nc + 1) + ii + 1)
        vvals.append(blocks[rt][:, r, l])
    lt = (ib == ia - 1) & (jb == ja)
    if lt.any():
        jj, ii = ja[lt], ia[lt]
        vkeys.append(jj * (nc + 1) + ii)
        vvals.append(blocks[lt][:, l, r])

    def agg(keys, vals, W, frozen):
        if not keys:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros((0, fbs, fbs)))
        k = np.concatenate(keys)
        v = np.concatenate(vals, axis=0)
        ok = ~frozen(k)
        k, v = k[ok], v[ok]
        uk, inv = np.unique(k, return_inverse=True)
        out = np.zeros((len(uk), fbs, fbs))
        np.add.at(out, inv, v)
        return uk // W, uk % W, out

    hj, hi, dBH = agg(hkeys, hvals, nc,
                      lambda k: (k // nc == 0) | (k // nc == nc))
    vj, vi, dBV = agg(vkeys, vvals, nc + 1,
                      lambda k: (k % (nc + 1) == 0) |
                      (k % (nc + 1) == nc))
    return BHu, BVu, (hj, hi, dBH), (vj, vi, dBV)


def pair_op_cell_face_blocks(nc: int, const: dict, corr, fbs: int):
    """HOST: exact 4-face restrictions of the pair operator — the
    uniform interior cell's block B_u [nfd, nfd] and (cells, blocks)
    for every cell whose restriction deviates (cells within 1 of a
    deviation pair or of the domain boundary). These are the EXACT
    local solves of the Galerkin-consistent patch smoother (the
    assembled-diag + cell-block approximation misses the neighbor-pair
    couplings — measured 10% off and divergent at 256^2)."""
    nfd = 4 * fbs
    rows, cols, blocks = corr
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    blocks = np.asarray(blocks)
    # owners of slot s of cell c: (c, s) and (c + off[s], opp[s])
    off = np.array([(-1, 0), (0, 1), (1, 0), (0, -1)])
    opp = np.array([2, 3, 0, 1])

    corr_map = {}
    for idx in range(len(rows)):
        corr_map[(int(rows[idx]), int(cols[idx]))] = idx

    def block_of(a, b):
        """[nfd, nfd] A-entries between cells a, b (grid ids), or None
        if either is off-grid."""
        if a is None or b is None:
            return None
        d = (b[0] - a[0], b[1] - a[1])
        out = const.get(d)
        out = None if out is None else out.copy()
        key = (a[0] * nc + a[1], b[0] * nc + b[1])
        idx = corr_map.get(key)
        if idx is not None:
            out = (blocks[idx] if out is None else out + blocks[idx])
        return out

    def cell(j, i):
        return (j, i) if 0 <= j < nc and 0 <= i < nc else None

    def restriction(j, i):
        B = np.zeros((nfd, nfd))
        for s1 in range(4):
            own1 = [((j, i), s1)]
            nb = cell(j + off[s1][0], i + off[s1][1])
            if nb is not None:
                own1.append((nb, opp[s1]))
            for s2 in range(4):
                own2 = [((j, i), s2)]
                nb2 = cell(j + off[s2][0], i + off[s2][1])
                if nb2 is not None:
                    own2.append((nb2, opp[s2]))
                acc = np.zeros((fbs, fbs))
                for (a, sa) in own1:
                    for (b, sb) in own2:
                        blk = block_of(a, b)
                        if blk is not None:
                            acc += blk[sa * fbs:(sa + 1) * fbs,
                                       sb * fbs:(sb + 1) * fbs]
                B[s1 * fbs:(s1 + 1) * fbs, s2 * fbs:(s2 + 1) * fbs] = acc
        return B

    # interior uniform block: any interior cell far from deviations
    jmid = nc // 2
    B_u = None

    dev = set()
    for r_, c_ in zip(rows.tolist(), cols.tolist()):
        for cc_ in (r_, c_):
            j0, i0 = cc_ // nc, cc_ % nc
            for dj in (-1, 0, 1):
                for di in (-1, 0, 1):
                    j2, i2 = j0 + dj, i0 + di
                    if 0 <= j2 < nc and 0 <= i2 < nc:
                        dev.add(j2 * nc + i2)
    for i0 in range(nc):
        dev.add(i0)
        dev.add((nc - 1) * nc + i0)
        dev.add(i0 * nc)
        dev.add(i0 * nc + nc - 1)
    # uniform reference from a non-deviating interior cell
    for j0 in range(1, nc - 1):
        found = False
        for i0 in range(1, nc - 1):
            if j0 * nc + i0 not in dev:
                B_u = restriction(j0, i0)
                found = True
                break
        if found:
            break
    if B_u is None:   # tiny/fully-deviating grid: fall back to center
        B_u = restriction(jmid, jmid)

    cells = np.array(sorted(dev), dtype=np.int64)
    out = np.stack([restriction(c // nc, c % nc) for c in cells]) \
        if len(cells) else np.zeros((0, nfd, nfd))
    return B_u, cells, out


def galerkin_patch_setup(sys: StructuredFaceSystem, gal: "GalerkinLevel",
                         patch_ids, dtype):
    """uniform_patch_setup_lean's Galerkin twin: every patch cell's
    local block is the EXACT 4-face restriction of the Galerkin
    operator (pair_op_cell_face_blocks), masked at frozen faces and
    inverted. Same outputs (Binv, wH, wV)."""
    from ..methods import cells_last as cl

    fbs, Nx, Ny = sys.fbs, sys.Nx, sys.Ny
    nfd = 4 * fbs
    pids = np.asarray(patch_ids)
    Cc = len(pids)
    jj, ii = pids // Nx, pids % Nx
    B_u = gal.Bu_cell.astype(dtype)

    if gal.cells.shape[0] > 0:
        pos = jnp.clip(jnp.searchsorted(gal.cells, jnp.asarray(pids)),
                       0, gal.cells.shape[0] - 1)
        hit = gal.cells[pos] == jnp.asarray(pids)
        vals = gal.cblocks.astype(dtype)[pos]
        B = jnp.where(hit[:, None, None], vals, B_u[None])
    else:
        B = jnp.broadcast_to(B_u, (Cc, nfd, nfd))

    jjd = jnp.asarray(jj)
    iid = jnp.asarray(ii)
    free_slot = jnp.stack([sys.freeH[jjd, iid], sys.freeV[jjd, iid + 1],
                           sys.freeH[jjd + 1, iid],
                           sys.freeV[jjd, iid]], axis=1)
    msk = jnp.repeat(free_slot, fbs, axis=1).astype(dtype)
    B = B * (msk[:, :, None] * msk[:, None, :]) + \
        jnp.eye(nfd, dtype=dtype) * (1.0 - msk)[:, None, :]
    Binv = jnp.linalg.inv(B)

    C = Nx * Ny
    mask = jnp.zeros((C,), dtype).at[jnp.asarray(pids)].set(1.0)
    onesl = jnp.broadcast_to(mask, (nfd, C))
    mult = cl.grid_scatter_cl(sys, onesl)
    wH = jnp.where(mult.H > 0,
                   1.0 / jnp.sqrt(jnp.maximum(mult.H, 1.0)), 0.0)
    wV = jnp.where(mult.V > 0,
                   1.0 / jnp.sqrt(jnp.maximum(mult.V, 1.0)), 0.0)
    return Binv, wH, wV


def pair_op_kernel(const: dict, dtype=np.float64):
    """Pack a PairOp's constant stencil into a conv kernel
    [nfd_out, nfd_in, ky, kx] (odd spatial dims, center = direction
    (0, 0)); out[s, J, I] = sum_{s2, dy, dx} K[s, s2, cy+dy, cx+dx] *
    xl[s2, J+dy, I+dx] — zero padding realizes the dropped off-grid
    pairs exactly."""
    rmax = max((max(abs(dy), abs(dx)) for dy, dx in const), default=0)
    nfd = next(iter(const.values())).shape[0]
    k = 2 * rmax + 1
    K = np.zeros((nfd, nfd, k, k), dtype)
    for (dy, dx), B in const.items():
        K[:, :, rmax + dy, rmax + dx] = B
    return K


def make_galerkin_operator_cl(sys: StructuredFaceSystem, kernel,
                              rows=None, cols=None, blocks=None):
    """Matrix-free PairOp apply, cells-last: gather cell slot planes,
    one conv for the constant stencil, pair gather/matmul/scatter for
    the deviations, scatter to the face grids, mask + frozen identity
    (exactly make_structured_operator_cl's contract)."""
    from ..methods.cells_last import GridVecCL

    fbs = sys.fbs
    nfd = 4 * fbs
    b, r, t, l = 0, fbs, 2 * fbs, 3 * fbs
    has_pairs = rows is not None and rows.shape[0] > 0
    if has_pairs:
        rj, ri = rows // sys.Nx, rows % sys.Nx
        cj, ci = cols // sys.Nx, cols % sys.Nx

    def apply_S(x: GridVecCL) -> GridVecCL:
        H = x.H * sys.freeH[None]
        V = x.V * sys.freeV[None]
        xl = jnp.concatenate([H[:, :-1, :], V[:, :, 1:],
                              H[:, 1:, :], V[:, :, :-1]],
                             axis=0)                   # [nfd, Ny, Nx]
        kd = kernel.astype(x.H.dtype)
        c = jax.lax.conv_general_dilated(
            xl[None].astype(x.H.dtype), kd, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=MATMUL_PRECISION)[0]
        zrow = jnp.zeros((fbs, 1, sys.Nx), H.dtype)
        yH = jnp.concatenate([c[b:b + fbs], zrow], axis=1) + \
            jnp.concatenate([zrow, c[t:t + fbs]], axis=1)
        zcol = jnp.zeros((fbs, sys.Ny, 1), V.dtype)
        yV = jnp.concatenate([c[l:l + fbs], zcol], axis=2) + \
            jnp.concatenate([zcol, c[r:r + fbs]], axis=2)

        if has_pairs:
            xli = jnp.concatenate([H[:, cj, ci], V[:, cj, ci + 1],
                                   H[:, cj + 1, ci], V[:, cj, ci]],
                                  axis=0)              # [nfd, P]
            yp = _einsum("pij,jp->ip", blocks.astype(x.H.dtype),
                            xli).reshape(4, fbs, -1)
            yH = yH.at[:, rj, ri].add(yp[0]).at[:, rj + 1, ri].add(yp[2])
            yV = yV.at[:, rj, ri].add(yp[3]).at[:, rj, ri + 1].add(yp[1])

        return GridVecCL(
            yH * sys.freeH[None] + x.H * (~sys.freeH[None]),
            yV * sys.freeV[None] + x.V * (~sys.freeV[None]))

    return apply_S


# ---------------------------------------------------------------------------
# Interface-band deflation space
#
# The V-cycle's stubborn error components on cut problems are SMOOTH ALONG
# the interface band: the patch/Chebyshev smoothers are local (they damp
# oscillatory band modes) and the rediscretized coarse level cuts the
# circle at different offsets, so its correction for band-tangential
# smooth modes degrades as N grows — the measured iteration growth
# (17 -> 32 -> 59 -> ... doubling N). A small auxiliary space B of
# Fourier modes in the interface angle, supported on the band faces'
# constant components, captures exactly those modes; the additive
# coarse correction z += B (B^T A B)^-1 B^T r (two-level additive
# Schwarz) removes them at O(m^2) cost per apply, m = 2K+1 modes.
# ---------------------------------------------------------------------------


def band_face_features(n: int, cut_ids, K: int):
    """STATIC (host) deflation basis over the free faces of the cut
    cells on the n x n unit-square grid: ((hj, hi, Wh), (vj, vi, Wv))
    with W* [nface, 2K+1] Fourier features [1, cos k\\theta, sin k\\theta]
    of the face-center angle around the band centroid (valid for
    star-shaped interfaces; the bench geometries — circle, flower —
    qualify). Rows are scaled by 1/sqrt(nface) for conditioning."""
    ids = np.asarray(cut_ids)
    jj, ii = ids // n, ids % n
    hkey = np.unique(np.concatenate([jj * n + ii, (jj + 1) * n + ii]))
    hfree = (hkey // n != 0) & (hkey // n != n)
    hkey = hkey[hfree]
    W = n + 1
    vkey = np.unique(np.concatenate([jj * W + ii, jj * W + ii + 1]))
    vfree = (vkey % W != 0) & (vkey % W != n)
    vkey = vkey[vfree]
    hj, hi = hkey // n, hkey % n
    vj, vi = vkey // W, vkey % W
    hx, hy = (hi + 0.5) / n, hj / n
    vx, vy = vi / n, (vj + 0.5) / n
    xc = (np.concatenate([hx, vx]).mean()
          if len(hx) + len(vx) else 0.5)
    yc = (np.concatenate([hy, vy]).mean()
          if len(hy) + len(vy) else 0.5)

    def feats(x, y):
        th = np.arctan2(y - yc, x - xc)
        cols = [np.ones_like(th)]
        for k in range(1, K + 1):
            cols.append(np.cos(k * th))
            cols.append(np.sin(k * th))
        return np.stack(cols, axis=1)

    nf = max(len(hj) + len(vj), 1)
    return ((hj, hi, feats(hx, hy) / np.sqrt(nf)),
            (vj, vi, feats(vx, vy) / np.sqrt(nf)))


def make_band_deflation(sys_f: StructuredFaceSystem, apply_S, cut_ids,
                        K: int, dtype, chunk: int = 16):
    """Build the band deflation operator (module section comment):
    returns (arrays, apply) where ``arrays`` = (Wh, Wv, G_chol) feeds
    MGDataCL and ``apply`` is r -> B (B^T A B)^-1 B^T r. ``chunk``
    bounds the vmapped operator applications at setup (memory)."""
    (hj, hi, Wh), (vj, vi, Wv) = band_face_features(sys_f.Nx, cut_ids, K)
    m = Wh.shape[1]
    Wh_d = jnp.asarray(Wh, dtype)
    Wv_d = jnp.asarray(Wv, dtype)
    hj_d, hi_d = jnp.asarray(hj, jnp.int32), jnp.asarray(hi, jnp.int32)
    vj_d, vi_d = jnp.asarray(vj, jnp.int32), jnp.asarray(vi, jnp.int32)

    from ..methods.cells_last import GridVecCL

    def B(y):
        H = jnp.zeros((sys_f.fbs, sys_f.Ny + 1, sys_f.Nx), dtype)
        V = jnp.zeros((sys_f.fbs, sys_f.Ny, sys_f.Nx + 1), dtype)
        H = H.at[0, hj_d, hi_d].add(
            jnp.matmul(Wh_d, y, precision=MATMUL_PRECISION))
        V = V.at[0, vj_d, vi_d].add(
            jnp.matmul(Wv_d, y, precision=MATMUL_PRECISION))
        return GridVecCL(H * sys_f.freeH[None], V * sys_f.freeV[None])

    def Bt(r):
        return (jnp.matmul(Wh_d.T, r.H[0, hj_d, hi_d],
                           precision=MATMUL_PRECISION) +
                jnp.matmul(Wv_d.T, r.V[0, vj_d, vi_d],
                           precision=MATMUL_PRECISION))

    # G = B^T A B via chunked vmapped operator columns
    eye = jnp.eye(m, dtype=dtype)
    cols = []
    for s in range(0, m, chunk):
        block = eye[s:s + chunk]
        cols.append(jax.vmap(lambda y: Bt(apply_S(B(y))))(block))
    G = jnp.concatenate(cols, axis=0).T
    shift = 100.0 * float(jnp.finfo(dtype).eps) / m
    G = 0.5 * (G + G.T) + shift * jnp.trace(G) * jnp.eye(m, dtype=dtype)
    G_chol = jnp.linalg.cholesky(G)

    def apply(r):
        y = jax.scipy.linalg.cho_solve((G_chol, True), Bt(r)[:, None])
        return B(y[:, 0])

    return (Wh_d, Wv_d, G_chol), apply


def make_band_deflation_apply(sys_f: StructuredFaceSystem, cut_ids,
                              arrays):
    """Re-materialize the deflation apply from precomputed MGDataCL
    arrays (the static cut_ids regenerate the face index sets)."""
    Wh_d, Wv_d, G_chol = arrays
    K = (Wh_d.shape[1] - 1) // 2
    (hj, hi, _), (vj, vi, _) = band_face_features(sys_f.Nx, cut_ids, K)
    hj_d, hi_d = jnp.asarray(hj, jnp.int32), jnp.asarray(hi, jnp.int32)
    vj_d, vi_d = jnp.asarray(vj, jnp.int32), jnp.asarray(vi, jnp.int32)
    dtype = Wh_d.dtype

    from ..methods.cells_last import GridVecCL

    def B(y):
        H = jnp.zeros((sys_f.fbs, sys_f.Ny + 1, sys_f.Nx), dtype)
        V = jnp.zeros((sys_f.fbs, sys_f.Ny, sys_f.Nx + 1), dtype)
        H = H.at[0, hj_d, hi_d].add(
            jnp.matmul(Wh_d, y, precision=MATMUL_PRECISION))
        V = V.at[0, vj_d, vi_d].add(
            jnp.matmul(Wv_d, y, precision=MATMUL_PRECISION))
        return GridVecCL(H * sys_f.freeH[None], V * sys_f.freeV[None])

    def Bt(r):
        return (jnp.matmul(Wh_d.T, r.H[0, hj_d, hi_d],
                           precision=MATMUL_PRECISION) +
                jnp.matmul(Wv_d.T, r.V[0, vj_d, vi_d],
                           precision=MATMUL_PRECISION))

    def apply(r):
        y = jax.scipy.linalg.cho_solve((G_chol, True), Bt(r)[:, None])
        return B(y[:, 0])

    return apply


class MGDataCL(NamedTuple):
    """All V-cycle setup ARRAYS as a pytree (cells-last layout), so MG
    setup can live in its own jit and the CG segments reuse it instead
    of re-executing patch inversions / lambda_max power iterations /
    the coarse factorization on every warm-started segment.

    In UNIFORM mode (``uniform_per_level`` given to mg_setup_cl — the
    generated-mesh fast path), per-level entries hold the constant-
    stencil decomposition instead of full planes: S = dS [nfd*nfd, Ci]
    deviations on the irregular columns (the [nfd, nfd] uniform block
    itself travels STATICALLY, outside this pytree), bj = (corrH, corrV)
    sparse block-Jacobi corrections."""

    S: tuple           # per level [nfd*nfd, C_n] — or dS (uniform mode)
    bj: tuple          # per level (iH, iV) planes — or (corrH, corrV)
    lam: tuple         # per level Chebyshev lambda_max (scalar arrays)
    patch: tuple       # per level: tuple of per-color (Binv, wH, wV)
    #                    triples (1 color = additive Schwarz, 2 colors =
    #                    checkerboard multiplicative), () w/o cut cells
    transfers: tuple   # per gap (MH, MV) transfer-matrix stencils
    coarse_chol: jnp.ndarray
    recdev: tuple = () # per gap: None or (drec [rbs*nfd, Ci], PH, PV) —
    #                    the cut-aware transfer correction of the gap's
    #                    COARSE level (ids travel statically via
    #                    uniform_per_level)
    deflate: tuple = ()  # () or (Wh, Wv, G_chol): fine-level interface-
    #                      band deflation space (make_band_deflation)
    galerkin: tuple = ()  # per level: None or (row_cells, col_cells,
    #                       blocks) — the band-Galerkin dG pair term
    #                       (band_galerkin_blocks); index arrays traced


def _uniform_su(uniform_per_level, n):
    """Static [nfd, nfd] numpy block + irregular ids of level n (the
    static half of the uniform decomposition), or (None, None)."""
    if uniform_per_level is None or n not in uniform_per_level:
        return None, None
    S_u, ids = uniform_per_level[n]
    return np.asarray(S_u, dtype=np.float64), np.asarray(ids)


def _cheb_op_pair(cl, sys_n, dtype, apply_S, base, S_u, cheb_ops):
    """(operator, preconditioner) the Chebyshev smoother polynomials in:
    'exact' uses the true spliced operator + corrected block-Jacobi;
    'mixed' swaps the INNER matvecs for the pure constant stencil
    (exact bj keeps the sliver-row scaling sane); 'uniform' uses pure
    constant-coefficient ops on both sides. The smoother stays SPD in
    every mode (a fixed polynomial of an SPD pair); the V-cycle's
    residual corrections always use the exact operator, so only
    smoothing QUALITY near the interface changes — the irregular
    gather/scatter corrections are the dominant per-apply cost on TPU
    (~8 ns/element), and the interface-patch smoother already owns
    that neighborhood."""
    if S_u is None or cheb_ops == "exact":
        return apply_S, base
    apply_sm = cl.make_uniform_operator_cl(sys_n, S_u.astype(dtype))
    if cheb_ops == "mixed":
        return apply_sm, base
    iHu, iVu = cl.uniform_block_jacobi_blocks(sys_n, S_u)
    base_sm = cl.make_uniform_block_jacobi_cl(
        sys_n, iHu.astype(dtype), iVu.astype(dtype))
    return apply_sm, base_sm


def mg_setup_cl(N: int, fbs: int, S_per_level, hdi, domain: float = 1.0,
                coarsest: int = 8, cut_ids_per_level=None,
                cheb_degree: int = 4, patch_colors: int = 1,
                uniform_per_level=None,
                cheb_ops: str = "exact",
                rec_dev_per_level=None,
                deflate_K: int = 0,
                galerkin_per_level=None) -> MGDataCL:
    """Compute every array the Chebyshev-smoothed cells-last V-cycle
    needs (see MGDataCL). Pure function of the S arrays — jit it with
    S as arguments (closures over big arrays break the axon remote
    compile). ``uniform_per_level`` ({n: (S_u [nfd, nfd] numpy,
    irregular ids numpy)}, static) switches level n to the
    constant-stencil decomposition. ``cheb_ops`` picks the smoother's
    operator pair (_cheb_op_pair); the lambda_max estimate matches.
    ``rec_dev_per_level`` ({n: drec [rbs*nfd, Ci] device arrays,
    column-aligned with level n's irregular ids}) enables the cut-aware
    transfer corrections on every gap whose coarse level has an entry."""
    from ..methods import cells_last as cl

    sizes = _mg_sizes(N, coarsest)
    systems = {n: make_structured_system(n, n, fbs) for n in sizes}
    dtype = S_per_level[N].dtype

    S_t, bj_t, lam_t, patch_t, trans_t, recdev_t = [], [], [], [], [], []
    gal_t = []
    deflate_arrays = ()
    for i, n in enumerate(sizes):
        sys_n = systems[n]
        S_n = S_per_level[n]
        S_u, irr = _uniform_su(uniform_per_level, n)
        if S_u is not None:
            # S_n may be the full [nfd*nfd, C] planes OR already the
            # lean dS [nfd*nfd, Ci] deviations (UniformCondCL path)
            lean_in = S_n.shape[1] == len(irr) and len(irr) != n * n
            dS = S_n if lean_in else \
                cl.uniform_deltas(S_n, S_u.astype(dtype), irr)
            S_t.append(dS)
            # block-Jacobi corrections from the dS deltas alone — no
            # full [fbs, fbs, n+1, n] plane inversion
            hf, vf = cl.uniform_face_block_deltas(sys_n, dS, irr)
            corrH, corrV = cl.uniform_bj_from_deltas(sys_n, S_u, hf, vf,
                                                     dtype)
            bj_t.append((corrH, corrV))
            iHu, iVu = cl.uniform_block_jacobi_blocks(sys_n, S_u)
            apply_S = cl.make_uniform_operator_cl(sys_n, S_u.astype(dtype),
                                                  irr, dS)
            base = cl.make_uniform_block_jacobi_cl(
                sys_n, iHu.astype(dtype), iVu.astype(dtype), corrH, corrV)
        else:
            iH, iV = cl.block_jacobi_setup_cl(sys_n, S_n)
            S_t.append(S_n)
            bj_t.append((iH, iV))
            apply_S = cl.make_structured_operator_cl(sys_n, S_n)
            base = partial(cl.apply_block_jacobi_cl, iH, iV)
        gal = None if galerkin_per_level is None else \
            galerkin_per_level.get(n)
        gal_t.append(gal)
        if gal is not None:
            # exact Galerkin coarse operator replaces the rediscretized
            # one (the bj base stays dS-based — a spectrally equivalent
            # smoother preconditioner; the OPERATOR and the exact-solve
            # PATCH blocks are what must be Galerkin-consistent)
            apply_S = make_galerkin_operator_cl(sys_n, gal.kernel,
                                                gal.rows, gal.cols,
                                                gal.blocks)
        like = cl.GridVecCL(jnp.zeros((fbs, n + 1, n), dtype),
                            jnp.zeros((fbs, n, n + 1), dtype))
        apply_sm, base_sm = _cheb_op_pair(cl, sys_n, dtype, apply_S,
                                          base, S_u, cheb_ops)
        lam_t.append(estimate_lambda_max(apply_sm, base_sm, like))
        ids = None if cut_ids_per_level is None else \
            cut_ids_per_level.get(n, None)
        if i == 0 and deflate_K > 0 and ids is not None and len(ids):
            deflate_arrays, _ = make_band_deflation(sys_n, apply_S, ids,
                                                    deflate_K, dtype)
        if ids is not None and len(ids) > 0:
            cols = []
            for g in cl.patch_color_groups(ids, n, patch_colors):
                if gal is not None:
                    cols.append(galerkin_patch_setup(sys_n, gal, g,
                                                     dtype))
                elif S_u is not None:
                    cols.append(cl.uniform_patch_setup_lean(
                        sys_n, S_u, S_t[-1], irr, g, dtype))
                else:
                    cols.append(cl.cut_patch_setup_cl(sys_n, S_n, g))
            patch_t.append(tuple(cols))
        else:
            patch_t.append(())
        if i + 1 < len(sizes):
            nc = sizes[i + 1]
            trans_t.append(_transfer_slot_matrices(hdi, domain / nc,
                                                   dtype))
            if rec_dev_per_level is not None and \
                    rec_dev_per_level.get(nc) is not None:
                PHc, PVc = _transfer_face_projectors(hdi, domain / nc)
                recdev_t.append((rec_dev_per_level[nc].astype(dtype),
                                 PHc.astype(dtype), PVc.astype(dtype)))
            else:
                recdev_t.append(None)

    # densify + factor the coarsest operator
    nco = sizes[-1]
    sys_c = systems[nco]
    S_u, irr = _uniform_su(uniform_per_level, nco)
    if S_u is not None:
        apply_c = cl.make_uniform_operator_cl(sys_c, S_u.astype(dtype),
                                              irr, S_t[-1])
    else:
        apply_c = cl.make_structured_operator_cl(sys_c, S_per_level[nco])
    if gal_t[-1] is not None:
        g = gal_t[-1]
        apply_c = make_galerkin_operator_cl(sys_c, g.kernel, g.rows,
                                            g.cols, g.blocks)
    hshape = (fbs, nco + 1, nco)
    vshape = (fbs, nco, nco + 1)
    if gal_t[-1] is not None and gal_t[-1].coarse_Q is not None:
        # host-f64 pinv factor shipped with the Galerkin hierarchy
        chol = (gal_t[-1].coarse_Q, gal_t[-1].coarse_winv)
    else:
        ntot = int(np.prod(hshape) + np.prod(vshape))
        eye = jnp.eye(ntot, dtype=dtype)

        def col(v):
            return _flatten(apply_c(_unflatten(v, (hshape, vshape),
                                               "cl")))

        Ac = jax.vmap(col, in_axes=1, out_axes=1)(eye)
        chol = _coarse_factor(Ac)
    return MGDataCL(tuple(S_t), tuple(bj_t), tuple(lam_t),
                    tuple(patch_t), tuple(trans_t), chol,
                    tuple(recdev_t), tuple(deflate_arrays),
                    tuple(gal_t))


def _smooth_transfer_pair(prol, restrict, apply_S, base, lam):
    """Operator-smoothed transfer pair (smoothed-aggregation style):
    P' = (I - omega M^-1 A) P with omega = 4/(3 lambda_max(M^-1 A)),
    R' = R (I - omega A M^-1) — the exact adjoint since A and M are
    symmetric. One extra fine operator + base-preconditioner apply per
    transfer; damps the prolonged correction's high-frequency energy
    (the component the uniform stencil gets O(1) wrong along the cut
    band) without ever forming explicit wide stencils."""
    def prol_s(xc):
        p = prol(xc)
        om = 4.0 / (3.0 * lam)
        return _tree_axpby(1.0, p, -om, base(apply_S(p)))

    def restrict_s(rf):
        om = 4.0 / (3.0 * lam)
        return restrict(_tree_axpby(1.0, rf, -om, apply_S(base(rf))))

    return prol_s, restrict_s


def mg_precondition_cl(data: MGDataCL, r, *, N: int, fbs: int,
                       cut_ids_per_level=None, coarsest: int = 8,
                       n_smooth: int = 1, cheb_degree: int = 4,
                       patch_colors: int = 1,
                       hdi=None, uniform_per_level=None,
                       cheb_ops: str = "exact", patch_sweeps: int = 1,
                       smooth_transfers: bool = False,
                       mg_gamma: int = 1):
    """Apply the V-cycle from precomputed MGDataCL arrays (the pure-
    function twin of Multigrid.precondition; cut ids are static).
    ``uniform_per_level`` and ``cheb_ops`` must match the mg_setup_cl
    call. ``smooth_transfers`` wraps every transfer pair in
    _smooth_transfer_pair. If ``data.deflate`` is non-empty the
    interface-band coarse correction is added (additive two-level
    Schwarz, SPD)."""
    from ..methods import cells_last as cl

    if mg_gamma > 1 and not any(g is not None for g in data.galerkin):
        # W-style re-visits make the coarse correction 2M^-1 - M^-1AM^-1,
        # indefinite whenever lambda_max(M^-1 A) >= 2 — exactly the
        # measured regime (rho(E)~4.9) of the rediscretized cut
        # hierarchy; a non-SPD preconditioner breaks CG. Only the
        # Galerkin hierarchy (rho < 1) supports gamma > 1.
        import warnings
        warnings.warn("mg_gamma > 1 requires the Galerkin hierarchy "
                      "(rediscretized coarse cut operators diverge as a "
                      "stationary iteration); clamping gamma to 1",
                      stacklevel=2)
        mg_gamma = 1

    sizes = _mg_sizes(N, coarsest)
    systems = {n: make_structured_system(n, n, fbs) for n in sizes}
    dtype = jax.tree.leaves(r)[0].dtype
    levels = []
    for i, n in enumerate(sizes):
        sys_n = systems[n]
        S_u, irr = _uniform_su(uniform_per_level, n)
        if S_u is not None:
            apply_S = cl.make_uniform_operator_cl(sys_n, S_u.astype(dtype),
                                                  irr, data.S[i])
            corrH, corrV = data.bj[i]
            iHu, iVu = cl.uniform_block_jacobi_blocks(sys_n, S_u)
            base = cl.make_uniform_block_jacobi_cl(
                sys_n, iHu.astype(dtype), iVu.astype(dtype), corrH, corrV)
        else:
            apply_S = cl.make_structured_operator_cl(sys_n, data.S[i])
            iH, iV = data.bj[i]
            base = partial(cl.apply_block_jacobi_cl, iH, iV)
        gal = data.galerkin[i] if i < len(data.galerkin) else None
        if gal is not None:
            apply_S = make_galerkin_operator_cl(sys_n, gal.kernel,
                                                gal.rows, gal.cols,
                                                gal.blocks)
        apply_sm, base_sm = _cheb_op_pair(cl, sys_n, dtype, apply_S,
                                          base, S_u, cheb_ops)
        smooth = make_chebyshev_smoother(apply_sm, base_sm, data.lam[i],
                                         degree=cheb_degree)
        smoothers = (smooth,)
        if data.patch[i]:
            groups = cl.patch_color_groups(cut_ids_per_level[n], n,
                                           patch_colors)
            smoothers = smoothers + tuple(
                partial(cl.apply_cut_patch_cl, sys_n, g, *blk)
                for g, blk in zip(groups, data.patch[i])) * patch_sweeps
        if i + 1 < len(sizes):
            nc = sizes[i + 1]
            corr = None
            rd = data.recdev[i] if i < len(data.recdev) else None
            if rd is not None:
                _, irr_c = _uniform_su(uniform_per_level, nc)
                corr = (irr_c,) + tuple(rd)
            prol = make_reconstruction_prolongation_cl(
                sys_n, systems[nc], hdi, 1.0 / nc,
                dtype, mats=data.transfers[i], corr=corr)
            restrict = make_reconstruction_restriction_cl(
                sys_n, systems[nc], hdi, 1.0 / nc,
                dtype, mats=data.transfers[i], corr=corr)
            if smooth_transfers:
                prol, restrict = _smooth_transfer_pair(
                    prol, restrict, apply_S, base, data.lam[i])
        else:
            prol = restrict = None
        levels.append(MGLevel(sys_n, apply_S, smoothers, prol, restrict))

    nco = sizes[-1]
    mg = Multigrid(levels, data.coarse_chol,
                   ((fbs, nco + 1, nco), (fbs, nco, nco + 1)),
                   n_smooth, 0.67, "cl", mg_gamma)
    z = mg.precondition(r)
    if data.deflate:
        defl = make_band_deflation_apply(systems[N],
                                         cut_ids_per_level[N],
                                         data.deflate)
        z = jax.tree.map(lambda a, b: a + b, z, defl(r))
    return z


class MGLevel(NamedTuple):
    sys: StructuredFaceSystem
    apply_S: Callable
    smoothers: tuple       # damped r -> dx steps; pre-smoothing applies
    #                        them in order, post-smoothing in reverse
    #                        (keeps the V-cycle symmetric)
    prolong: Callable      # from the NEXT-coarser level (None on coarsest)
    restrict: Callable


class Multigrid(NamedTuple):
    levels: List[MGLevel]
    coarse_chol: jnp.ndarray
    coarse_shape: tuple
    n_smooth: int
    omega: float
    layout: str = "rm"
    gamma: int = 1      # 1 = V-cycle, 2 = W-style re-visits (the coarse
    #                     problem is solved twice — recovers near-two-
    #                     level quality when per-gap correction quality
    #                     degrades with depth, as measured on the
    #                     Galerkin cut hierarchy)
    gamma_depth: int = 2  # re-visit only the top ``gamma_depth`` gaps:
    #                       a full W-cycle's trace (and remote-AOT
    #                       compile) grows 2^levels — bounding the depth
    #                       keeps it linear

    def precondition(self, r):
        return _vcycle(self, 0, r)


def _coarse_factor(Ac):
    """Eigendecomposition pseudo-inverse factor of the densified
    coarsest operator. The exact-Galerkin coarsest is SINGULAR (the
    composed masked prolongation has a small kernel; measured min eig
    ~1e-15 at 8^2) — Cholesky NaNs there. Restricted residuals are
    orthogonal to the kernel (r_c = P~^T r in range(P~^T)), so the
    pseudo-inverse is the exact coarse solve on the relevant subspace."""
    As = 0.5 * (Ac + Ac.T)
    w, Q = jnp.linalg.eigh(As)
    # drop only the rounding-level kernel: the coarsest cond is ~n, so
    # an n-proportional cutoff would zero LEGITIMATE smooth modes in
    # f32 (50*n*eps*wmax = 2.5% of wmax at 4224 dofs — it gutted the
    # coarse solve and the 512^2 bench ground for 1000+ segments)
    tol = 100.0 * jnp.finfo(Ac.dtype).eps * jnp.max(jnp.abs(w))
    winv = jnp.where(w > tol, 1.0 / jnp.where(w > tol, w, 1.0), 0.0)
    return (Q, winv)


def _coarse_solve(fac, rhs):
    """Apply the coarsest factor: (Q, winv) eigh-pinv tuple, or a lower
    Cholesky factor (legacy). The solve runs in the FACTOR's dtype —
    Galerkin hierarchies ship a host-computed f64 factor (the coarsest
    Galerkin cond is ~1e5; an f32 eigh-pinv solve is only ~1e-2
    accurate and floors the outer f32 CG at ~2.5e-4, measured at
    512^2) — and the result is cast back to the rhs dtype."""
    if isinstance(fac, tuple):
        Q, winv = fac
        y = Q @ (winv * (Q.T @ rhs.astype(Q.dtype)))
        return y.astype(rhs.dtype)
    return jax.scipy.linalg.cho_solve((fac, True), rhs[:, None])[:, 0]


def pair_op_dense(nc: int, const: dict, corr, fbs: int):
    """HOST: densify the pair operator on the free face dofs of the
    nc x nc grid (frozen rows/cols get identity) — flat dof order
    [H(m, j, i) | V(m, j, i)], matching multigrid._flatten."""
    nfd = 4 * fbs
    nH = fbs * (nc + 1) * nc
    ntot = nH + fbs * nc * (nc + 1)
    A = np.zeros((ntot, ntot))

    def face_dofs_vec(cells, slot):
        """[len, fbs] flat dofs of slot ``slot`` of each cell, with -1
        at frozen (domain-edge) faces."""
        j, i = cells // nc, cells % nc
        if slot == 0:
            fj, fi, kind = j, i, 0
        elif slot == 1:
            fj, fi, kind = j, i + 1, 1
        elif slot == 2:
            fj, fi, kind = j + 1, i, 0
        else:
            fj, fi, kind = j, i, 1
        m = np.arange(fbs)
        if kind == 0:
            base = fj * nc + fi
            d = m[None, :] * (nc + 1) * nc + base[:, None]
            bad = (fj == 0) | (fj == nc)
        else:
            base = fj * (nc + 1) + fi
            d = nH + m[None, :] * nc * (nc + 1) + base[:, None]
            bad = (fi == 0) | (fi == nc)
        d[bad] = -1
        return d

    def add_blocks(ca, cb, B):
        """B [len, nfd, nfd] (or [nfd, nfd] broadcast) added at the
        slot-dof products of cell arrays ca, cb."""
        if B.ndim == 2:
            B = np.broadcast_to(B, (len(ca),) + B.shape)
        for s1 in range(4):
            d1 = face_dofs_vec(ca, s1)
            for s2 in range(4):
                d2 = face_dofs_vec(cb, s2)
                ok = (d1[:, 0] >= 0) & (d2[:, 0] >= 0)
                if not ok.any():
                    continue
                np.add.at(A, (d1[ok][:, :, None], d2[ok][:, None, :]),
                          B[ok][:, s1 * fbs:(s1 + 1) * fbs,
                                s2 * fbs:(s2 + 1) * fbs])

    cells = np.arange(nc * nc)
    jj, ii = cells // nc, cells % nc
    for (dy, dx), B in const.items():
        ok = (jj + dy >= 0) & (jj + dy < nc) & (ii + dx >= 0) & \
            (ii + dx < nc)
        ca = cells[ok]
        add_blocks(ca, ca + dy * nc + dx, np.asarray(B))
    rows, cols, blocks = corr
    if len(np.asarray(rows)):
        add_blocks(np.asarray(rows), np.asarray(cols),
                   np.asarray(blocks))

    frozen = np.abs(A).sum(0) + np.abs(A).sum(1) == 0
    A[frozen, frozen] = 1.0
    return A


def _flatten(x):
    return jnp.concatenate([x.H.reshape(-1), x.V.reshape(-1)])


def _unflatten(v, shapes, layout="rm"):
    hshape, vshape = shapes
    n = int(np.prod(hshape))
    if layout == "cl":
        from ..methods.cells_last import GridVecCL
        return GridVecCL(v[:n].reshape(hshape), v[n:].reshape(vshape))
    return GridVec(v[:n].reshape(hshape), v[n:].reshape(vshape))


def _vcycle(mg: Multigrid, lvl: int, b):
    level = mg.levels[lvl]
    if lvl == len(mg.levels) - 1:
        # coarsest: dense Cholesky solve
        rhs = _flatten(b)
        x = _coarse_solve(mg.coarse_chol, rhs)
        return _unflatten(x, mg.coarse_shape, mg.layout)

    def sweep(x, b, steps):
        # x=None encodes the zero initial guess: the first residual is b
        # itself, saving one operator application per V-cycle per level
        for s in steps:
            if x is None:
                x = s(b)
            else:
                r = jax.tree.map(lambda bb, ss: bb - ss, b,
                                 level.apply_S(x))
                x = jax.tree.map(lambda xx, dd: xx + dd, x, s(r))
        return x

    def smooth(x, b, steps):
        for _ in range(mg.n_smooth):
            x = sweep(x, b, steps)
        return x

    x = smooth(None, b, level.smoothers)
    r = jax.tree.map(lambda bb, ss: bb - ss, b, level.apply_S(x))
    rc = level.restrict(r)
    ec = _vcycle(mg, lvl + 1, rc)
    if mg.gamma > 1 and lvl < mg.gamma_depth and \
            lvl + 1 < len(mg.levels) - 1:
        # W-style: re-visit the coarse problem on its residual
        coarse = mg.levels[lvl + 1]
        for _ in range(mg.gamma - 1):
            r2 = jax.tree.map(lambda bb, ss: bb - ss, rc,
                              coarse.apply_S(ec))
            e2 = _vcycle(mg, lvl + 1, r2)
            ec = jax.tree.map(lambda aa, bb: aa + bb, ec, e2)
    x = jax.tree.map(lambda xx, ee: xx + ee, x, level.prolong(ec))
    x = smooth(x, b, tuple(reversed(level.smoothers)))
    return x


def build_multigrid(N: int, fbs: int, S_per_level, hdi=None,
                    domain: float = 1.0, n_smooth: int = 2,
                    omega: float = 0.67, coarsest: int = 8,
                    smoother: str = "block_jacobi",
                    cut_ids_per_level=None, patch_sweeps: int = 1,
                    cheb_degree: int = 4, patch_colors: int = 1,
                    layout: str = "rm",
                    uniform_per_level=None,
                    cheb_ops: str = "exact",
                    rec_dev_per_level=None,
                    smooth_transfers: bool = False,
                    galerkin_per_level=None,
                    gamma: int = 1) -> Multigrid:
    """S_per_level: dict {n: S_n [C_n, nfd, nfd]} containing the condensed
    local Schur matrices for each mesh size n = N, N/2, ..., coarsest
    (rediscretized; the caller assembles them).

    With ``hdi`` (the HHODegreeInfo of the discretization) transfers are
    reconstruction-based — iteration counts stay roughly flat in N;
    ``domain`` is the domain side length (cell size = domain/n per
    level). Without hdi, falls back to the round-1 constant-injection
    transfers. ``smoother``: 'chebyshev' (Chebyshev(cheb_degree)
    polynomial over the block-Jacobi-preconditioned operator — the
    strongest and the TPU default), 'block_jacobi' (per-face fbs x fbs
    blocks) or 'jacobi' (pointwise), the latter two damped by
    ``omega``.

    ``cut_ids_per_level`` ({n: cut cell indices}) enables the
    interface-patch smoother (structured.make_cut_patch_smoother) on each
    level — required for N-independent iteration counts on cut (unfitted
    Nitsche) systems.

    ``layout``: 'rm' ([C, nfd, nfd] S blocks, structured.GridVec grids) or
    'cl' (cells-last [nfd*nfd, C] S, cells_last.GridVecCL grids — the TPU
    bench layout; see methods/cells_last.py)."""
    from ..methods import cells_last as cl
    from ..methods.structured import make_cut_patch_smoother

    if layout == "cl":
        op_fn = cl.make_structured_operator_cl
        bj_fn = cl.block_jacobi_preconditioner_cl
        diag_fn = cl.structured_diagonal_cl
        patch_fn = cl.make_cut_patch_smoother_cl
        rec_prol_fn = make_reconstruction_prolongation_cl

        def zeros_grid(nc):
            return cl.GridVecCL(jnp.zeros((fbs, nc + 1, nc), dtype),
                                jnp.zeros((fbs, nc, nc + 1), dtype))

        def coarse_shapes(nc):
            return (fbs, nc + 1, nc), (fbs, nc, nc + 1)
    else:
        op_fn = make_structured_operator
        bj_fn = block_jacobi_preconditioner
        diag_fn = structured_diagonal
        patch_fn = make_cut_patch_smoother
        rec_prol_fn = make_reconstruction_prolongation

        def zeros_grid(nc):
            return GridVec(jnp.zeros((nc + 1, nc, fbs), dtype),
                           jnp.zeros((nc, nc + 1, fbs), dtype))

        def coarse_shapes(nc):
            return (nc + 1, nc, fbs), (nc, nc + 1, fbs)

    sizes = []
    n = N
    while n >= coarsest:
        sizes.append(n)
        if n == coarsest:
            break
        n //= 2
    dtype = S_per_level[N].dtype

    levels = []
    systems = {n: make_structured_system(n, n, fbs) for n in sizes}
    for i, n in enumerate(sizes):
        sys_n = systems[n]
        S_u, irr = (None, None) if layout != "cl" else \
            _uniform_su(uniform_per_level, n)
        if S_u is not None:
            from ..methods import cells_last as _cl
            S_n = S_per_level[n]
            lean_in = S_n.shape[1] == len(irr) and len(irr) != n * n
            dS = S_n if lean_in else \
                _cl.uniform_deltas(S_n, S_u.astype(dtype), irr)
            apply_S = _cl.make_uniform_operator_cl(
                sys_n, S_u.astype(dtype), irr, dS)
        else:
            apply_S = op_fn(sys_n, S_per_level[n])
        gal = None if (galerkin_per_level is None or layout != "cl") \
            else galerkin_per_level.get(n)
        if gal is not None:
            apply_S = make_galerkin_operator_cl(sys_n, gal.kernel,
                                                gal.rows, gal.cols,
                                                gal.blocks)
        if S_u is not None and smoother in ("block_jacobi", "chebyshev"):
            from ..methods import cells_last as _cl
            hf, vf = _cl.uniform_face_block_deltas(sys_n, dS, irr)
            corrH, corrV = _cl.uniform_bj_from_deltas(sys_n, S_u, hf, vf,
                                                      dtype)
            iHu, iVu = _cl.uniform_block_jacobi_blocks(sys_n, S_u)
            base = _cl.make_uniform_block_jacobi_cl(
                sys_n, iHu.astype(dtype), iVu.astype(dtype), corrH, corrV)
        elif smoother in ("block_jacobi", "chebyshev"):
            base = bj_fn(sys_n, S_per_level[n])
        else:
            diag = diag_fn(sys_n, S_per_level[n])
            inv_diag = jax.tree.map(lambda d: 1.0 / d, diag)

            def base(r, _inv=inv_diag):
                return jax.tree.map(lambda rr, ii: rr * ii, r, _inv)

        if smoother == "chebyshev":
            from ..methods import cells_last as _cl
            like = zeros_grid(n)
            apply_sm, base_sm = _cheb_op_pair(
                _cl, sys_n, dtype, apply_S, base,
                S_u if layout == "cl" else None, cheb_ops)
            lam = estimate_lambda_max(apply_sm, base_sm, like)
            damped = make_chebyshev_smoother(apply_sm, base_sm, lam,
                                             degree=cheb_degree)
        else:
            def damped(r, _b=base, _w=omega):
                return jax.tree.map(lambda a: _w * a, _b(r))

        smoothers = (damped,)
        if cut_ids_per_level is not None and \
                len(cut_ids_per_level.get(n, ())) > 0:
            from ..methods import cells_last as _cl
            patches = []
            for g in _cl.patch_color_groups(cut_ids_per_level[n], n,
                                            patch_colors):
                if gal is not None:
                    pb = galerkin_patch_setup(sys_n, gal, g, dtype)

                    def patch(r, _sys=sys_n, _ids=g, _pb=pb):
                        return _cl.apply_cut_patch_cl(_sys, _ids, *_pb,
                                                      r)
                elif S_u is not None:
                    pb = _cl.uniform_patch_setup_lean(
                        sys_n, S_u, dS, irr, g, dtype)

                    def patch(r, _sys=sys_n, _ids=g, _pb=pb):
                        return _cl.apply_cut_patch_cl(_sys, _ids, *_pb,
                                                      r)
                else:
                    patch = patch_fn(sys_n, S_per_level[n], g)
                patches.append(patch)
            # error components local to the sliver-cut Nitsche cells are
            # invisible both to Jacobi and to the (differently cut)
            # coarse level; extra interface sweeps are cheap (the patch
            # batch is O(N) cells) and cut iteration counts hard
            smoothers = (damped,) + tuple(patches) * patch_sweeps
        if i + 1 < len(sizes):
            nc = sizes[i + 1]
            corr = None
            if layout == "cl" and rec_dev_per_level is not None and \
                    rec_dev_per_level.get(nc) is not None:
                _, irr_c = _uniform_su(uniform_per_level, nc)
                PHc, PVc = _transfer_face_projectors(hdi, domain / nc)
                corr = (irr_c, rec_dev_per_level[nc].astype(dtype),
                        PHc.astype(dtype), PVc.astype(dtype))
            if hdi is not None:
                if layout == "cl":
                    prol = rec_prol_fn(sys_n, systems[nc], hdi,
                                       domain / nc, dtype, corr=corr)
                else:
                    prol = rec_prol_fn(sys_n, systems[nc], hdi,
                                       domain / nc, dtype)
            elif layout == "cl":
                raise ValueError("layout='cl' requires hdi "
                                 "(reconstruction-based transfers)")
            else:
                prol = make_prolongation(sys_n, systems[nc], dtype)
            if layout == "cl" and hdi is not None:
                # explicit stencil adjoint: jax.linear_transpose turns
                # the interleaving into TPU scatters (~8 ns/element),
                # which dominated the V-cycle at 1024^2
                restrict = make_reconstruction_restriction_cl(
                    sys_n, systems[nc], hdi, domain / nc, dtype,
                    corr=corr)
            else:
                # restriction = exact adjoint of prolongation
                t = jax.linear_transpose(prol, zeros_grid(nc))

                def restrict(r, _t=t):
                    return _t(r)[0]
            if smooth_transfers and layout == "cl":
                lam_s = lam if smoother == "chebyshev" else \
                    estimate_lambda_max(apply_S, base, zeros_grid(n))
                prol, restrict = _smooth_transfer_pair(
                    prol, restrict, apply_S, base, lam_s)
        else:
            prol, restrict = None, None
        levels.append(MGLevel(sys_n, apply_S, smoothers, prol,
                              restrict))

    # prolong/restrict live on the FINE level towards the next-coarser one;
    # reorganize: level i uses its own prolong (to i+1). Already so.

    # densify the coarsest operator
    nco = sizes[-1]
    hshape, vshape = coarse_shapes(nco)
    gal_co = None if (galerkin_per_level is None or layout != "cl") \
        else galerkin_per_level.get(nco)
    if gal_co is not None and gal_co.coarse_Q is not None:
        chol = (gal_co.coarse_Q, gal_co.coarse_winv)
    else:
        ntot = int(np.prod(hshape) + np.prod(vshape))
        eye = jnp.eye(ntot, dtype=dtype)
        apply_c = levels[-1].apply_S

        def col(v):
            return _flatten(apply_c(_unflatten(v, (hshape, vshape),
                                               layout)))

        Ac = jax.vmap(col, in_axes=1, out_axes=1)(eye)
        chol = _coarse_factor(Ac)

    return Multigrid(levels, chol, (hshape, vshape), n_smooth, omega,
                     layout, gamma)
