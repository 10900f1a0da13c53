"""Elliptic interface problem driver: doubled unknowns on cut cells/faces
(replaces interface_assembler + run_cuthho_interface,
apps/cuthho/cuthho_square.cpp:1091-1443, 1625-1846).

DOF layout mirrors the reference: all cell blocks first (cut cells own two
consecutive cbs blocks, negative then positive; cell_table holds cumulative
offsets, :1144-1152), then non-Dirichlet face blocks (cut faces own two
consecutive fbs blocks, :1155-1182). Dirichlet faces on cut cells are
unsupported, as in the reference (:1305-1307).

The compress tables are prefix sums over "is cut" flags — data, not
control flow. NOTE: the reference's take_local_data reads faces at the
wrong base offset when cut cells exist (cbs*num_cells instead of
cbs*num_all_cells, :1423); we use the correct offset (SURVEY.md "known
bugs — do not reproduce").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..core import bases, quadrature
from ..core.geometry import cell_geometry
from ..core.mesh import BND_DIRICHLET
from ..core.ops import HHODegreeInfo, cell_rhs, spd_inverse
from ..methods import assembly, hho
from ..solvers import cg
from . import methods as cut_methods
from .classify import CutData, LOC_CUT, LOC_NEG, LOC_POS, cut_preprocess
from .levelset import LevelSet
from .methods import CutCellBatch, InterfaceParams, make_cut_batch
from .quadrature import side_cell_rule


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InterfaceDofMap:
    """Doubled-dof index maps.

    asm_uncut [Cun, d']  global dofs of each uncut cell's locals
                         (sentinel on Dirichlet face slots)
    asm_cut   [Cc, 2d']  global dofs of each cut cell's doubled locals,
                         local layout [cbs-, cbs+, nfd-, nfd+]
    uncut_ids [Cun], cut_ids [Cc]: cell indices of each class
    """

    asm_uncut: jax.Array
    asm_cut: jax.Array
    uncut_ids: jax.Array
    cut_ids: jax.Array
    dirichlet_uncut: jax.Array   # [Cun, d'] bool
    cell_table: jax.Array        # [C]
    face_table: jax.Array        # [F]
    face_is_cut: jax.Array       # [F] bool
    cbs: int = dataclasses.field(metadata=dict(static=True), default=0)
    fbs: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_all_cells: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_dofs: int = dataclasses.field(metadata=dict(static=True), default=0)


def build_interface_dofmap(mesh, cutdata: CutData,
                           hdi: HHODegreeInfo) -> InterfaceDofMap:
    """Host-side construction (interface_assembler ctor,
    cuthho_square.cpp:1137-1194)."""
    cbs = bases.cell_basis_size(hdi.cell_degree)
    fbs = bases.face_basis_size(hdi.face_degree)
    C, nF = np.asarray(mesh.cell_faces).shape
    F = mesh.num_faces

    cell_loc = np.asarray(cutdata.cell_loc)
    face_loc = np.asarray(cutdata.face_loc)
    face_bnd = np.asarray(mesh.face_bnd)
    is_dir = face_bnd == BND_DIRICHLET
    cell_is_cut = cell_loc == LOC_CUT
    face_is_cut = face_loc == LOC_CUT

    if (is_dir & face_is_cut).any():
        raise ValueError("Dirichlet boundary on cut cell not supported.")

    mult_c = np.where(cell_is_cut, 2, 1)
    cell_table = np.concatenate([[0], np.cumsum(mult_c)[:-1]])
    num_all_cells = int(mult_c.sum())

    mult_f = np.where(is_dir, 0, np.where(face_is_cut, 2, 1))
    face_table = np.concatenate([[0], np.cumsum(mult_f)[:-1]])
    num_other = int(mult_f.sum())
    n_dofs = cbs * num_all_cells + fbs * num_other
    face_base = cbs * num_all_cells

    cell_faces = np.asarray(mesh.cell_faces)
    edge_valid = (np.arange(nF)[None, :] <
                  np.asarray(mesh.cell_npts)[:, None])

    uncut_ids = np.nonzero(~cell_is_cut)[0]
    cut_ids = np.nonzero(cell_is_cut)[0]
    d = cbs + nF * fbs

    def face_block(f_ids, valid, copy):
        """global dof base per face slot; copy: 0=first, 1=second (cut)."""
        base = face_base + face_table[f_ids] * fbs + \
            copy * np.where(face_is_cut[f_ids], fbs, 0)
        dead = is_dir[f_ids] | ~valid
        idx = base[..., None] + np.arange(fbs)[None, None, :]
        return np.where(dead[..., None], n_dofs, idx)

    # uncut cells (assemble(), :1203-1272)
    au = np.empty((len(uncut_ids), d), dtype=np.int64)
    au[:, :cbs] = (cell_table[uncut_ids, None] * cbs + np.arange(cbs))
    fb = face_block(cell_faces[uncut_ids], edge_valid[uncut_ids], 0)
    au[:, cbs:] = fb.reshape(len(uncut_ids), nF * fbs)
    dir_u = np.zeros((len(uncut_ids), d), dtype=bool)
    dir_u[:, cbs:] = np.repeat(
        is_dir[cell_faces[uncut_ids]] & edge_valid[uncut_ids], fbs, axis=1)

    # cut cells (assemble_cut(), :1274-1354): [cbs-, cbs+, nfd-, nfd+]
    ac = np.empty((len(cut_ids), 2 * d), dtype=np.int64)
    base_c = cell_table[cut_ids, None] * cbs
    ac[:, :cbs] = base_c + np.arange(cbs)
    ac[:, cbs:2 * cbs] = base_c + cbs + np.arange(cbs)
    fb_n = face_block(cell_faces[cut_ids], edge_valid[cut_ids], 0)
    fb_p = face_block(cell_faces[cut_ids], edge_valid[cut_ids], 1)
    ac[:, 2 * cbs:2 * cbs + nF * fbs] = fb_n.reshape(len(cut_ids), -1)
    ac[:, 2 * cbs + nF * fbs:] = fb_p.reshape(len(cut_ids), -1)

    return InterfaceDofMap(
        asm_uncut=jnp.asarray(au.astype(np.int32)),
        asm_cut=jnp.asarray(ac.astype(np.int32)),
        uncut_ids=jnp.asarray(uncut_ids.astype(np.int32)),
        cut_ids=jnp.asarray(cut_ids.astype(np.int32)),
        dirichlet_uncut=jnp.asarray(dir_u),
        cell_table=jnp.asarray(cell_table.astype(np.int32)),
        face_table=jnp.asarray(face_table.astype(np.int32)),
        face_is_cut=jnp.asarray(face_is_cut),
        cbs=cbs, fbs=fbs, num_all_cells=num_all_cells, n_dofs=int(n_dofs),
    )


class InterfaceResult(NamedTuple):
    x: jnp.ndarray
    local_neg: jnp.ndarray     # [C, d'] per-cell dofs seen from NEG side
    local_pos: jnp.ndarray     # [C, d'] per-cell dofs seen from POS side
    h1_error: jnp.ndarray
    iterations: jnp.ndarray
    exit_reason: jnp.ndarray


def _interface_mg_precond(mesh, dm: InterfaceDofMap, n_face_dofs: int,
                          sys_c_S, idx_c, blocks_and_idx, N: int,
                          hdi: HHODegreeInfo, dtype, coarsest: int = 8):
    """Additive two-part preconditioner of the condensed doubled-dof
    interface system (the 'structured MG with doubled unknowns on the
    cut band' of the round-4 verdict):

      M^-1 = P MG_u^-1 P^T  +  sum_patches w B_cut^-1 w

    MG_u is the UNIFORM fitted structured V-cycle (the kappa_1 = kappa_2
    interface operator away from the interface IS the fitted Poisson
    stencil; multigrid.mg_setup_cl with empty irregular sets), P injects
    each structured face-grid value into BOTH copies of a doubled face
    (P^T sums them — the doubled system's continuous embedding), and the
    band term is exact-solve additive Schwarz over the cut cells' 2*nfd
    condensed blocks (sys_c.S), 1/sqrt(multiplicity)-weighted. Both
    parts are SPD, so the sum is a valid CG preconditioner."""
    from ..methods.cells_last import GridVecCL
    from ..solvers import multigrid
    from . import fictdom_structured as fs

    fbs = dm.fbs
    sent = n_face_dofs

    # ---- host maps: grid face -> condensed dof start (both copies) ----
    cf = np.asarray(mesh.cell_faces)
    cells = np.arange(N * N).reshape(N, N)
    fH = np.empty((N + 1, N), np.int64)
    fH[:N] = cf[cells, 0]
    fH[N] = cf[cells[N - 1], 2]
    fV = np.empty((N, N + 1), np.int64)
    fV[:, :N] = cf[cells, 3]
    fV[:, N] = cf[cells[:, N - 1], 1]
    face_start = np.asarray(dm.face_table) * fbs
    is_cut = np.asarray(dm.face_is_cut)
    is_dir = np.asarray(mesh.face_bnd) == BND_DIRICHLET

    def copy_idx(fgrid, cp):
        base = face_start[fgrid] + cp * fbs
        dead = is_dir[fgrid] if cp == 0 else \
            (is_dir[fgrid] | ~is_cut[fgrid])
        idx = base[..., None] + np.arange(fbs)
        return jnp.asarray(np.where(dead[..., None], sent,
                                    idx).astype(np.int32))

    iH0, iH1 = copy_idx(fH, 0), copy_idx(fH, 1)
    iV0, iV1 = copy_idx(fV, 0), copy_idx(fV, 1)

    # ---- uniform fitted MG hierarchy (no cut sets) ----
    nfd4 = 4 * fbs
    sizes = multigrid._mg_sizes(N, coarsest)
    uniform_per_level = {
        n: (fs._unit_cell_host(hdi, 1.0 / n)[0], np.zeros(0, np.int64))
        for n in sizes}
    S_per_level = {n: jnp.zeros((nfd4 * nfd4, 0), dtype) for n in sizes}
    data = multigrid.mg_setup_cl(N, fbs, S_per_level, hdi,
                                 coarsest=coarsest,
                                 uniform_per_level=uniform_per_level)
    mg_kw = dict(N=N, fbs=fbs, cut_ids_per_level=None, coarsest=coarsest,
                 hdi=hdi, uniform_per_level=uniform_per_level)

    # ---- cut-band additive Schwarz over DEDUPLICATED patch dofs ----
    # A cut cell's own condensed block sys_c.S is SINGULAR (local
    # constants; and uncut faces of a cut cell map both copies to the
    # SAME global dofs — duplicate slots). The patch block is built over
    # the cell's global face-dof set: scatter the cell couplings (dupes
    # merge exactly), then overwrite each face's diagonal block with the
    # fully ASSEMBLED one (_assembled_face_blocks) — that adds the
    # neighbor cells' contribution, which breaks the constant kernel
    # (same construction as the fictdom interface-patch smoother).
    Cc, d2 = sys_c_S.shape[:2]
    P = 8 * fbs                                   # 4 faces x max 2 copies
    cf_c = cf[np.asarray(dm.cut_ids)]             # [Cc, 4]
    wf = np.where(is_cut[cf_c], 2 * fbs, fbs)     # [Cc, 4] face widths
    offs = np.concatenate([np.zeros((Cc, 1), np.int64),
                           np.cumsum(wf, axis=1)], axis=1)  # [Cc, 5]
    idx_c_np = np.asarray(idx_c)                  # [Cc, 2nfd]
    # local slot s (s%4 = geometric face, s//4 = copy) -> patch position
    pos_map = np.empty((Cc, d2), np.int64)
    for s in range(8):
        cols = slice(s * fbs, (s + 1) * fbs)
        f = cf_c[:, s % 4]
        pos0 = offs[:, s % 4] + (idx_c_np[:, s * fbs] - face_start[f])
        pos_map[:, cols] = pos0[:, None] + np.arange(fbs)
    # global dof of each patch position (sentinel past the face width)
    gidx = np.full((Cc, P), sent, np.int64)
    for s in range(4):
        for off in range(2 * fbs):
            live = off < wf[:, s]
            col = offs[:, s] + off
            gidx[np.arange(Cc)[live], col[live]] = \
                face_start[cf_c[live, s]] + off
    gidx_p = jnp.asarray(gidx.astype(np.int32))

    # scatter the cell couplings into [Cc, P, P] (duplicates merge)
    flat = (np.arange(Cc)[:, None, None] * (P * P) +
            pos_map[:, :, None] * P + pos_map[:, None, :])
    B = jnp.zeros((Cc * P * P,), dtype).at[
        jnp.asarray(flat.reshape(-1))].add(sys_c_S.reshape(-1))
    B = B.reshape(Cc, P, P)
    # overwrite face-diagonal blocks with the assembled ones
    FB = _assembled_face_blocks(dm, n_face_dofs, blocks_and_idx)
    wmax = 2 * fbs
    for s in range(4):
        fb_s = FB[cf_c[:, s]]                     # [Cc, wmax, wmax]
        ii = offs[:, s, None] + np.arange(wmax)[None, :]
        live = (np.arange(wmax)[None, :] < wf[:, s, None])
        ii = np.where(live, ii, P)                # park dead at col P
        iis = jnp.asarray(ii)
        rows = iis[:, :, None] * (P + 1) + iis[:, None, :] + \
            jnp.arange(Cc)[:, None, None] * ((P + 1) * (P + 1))
        Bp = jnp.zeros((Cc * (P + 1) * (P + 1),), dtype)
        Bp = Bp.at[rows.reshape(-1)].add(fb_s.reshape(-1))
        Bp = Bp.reshape(Cc, P + 1, P + 1)[:, :P, :P]
        # zero the old diag block, then add the assembled one
        blkmask = jnp.zeros((Cc * (P + 1) * (P + 1),), dtype).at[
            rows.reshape(-1)].add(1.0).reshape(Cc, P + 1, P + 1)[:, :P, :P]
        B = B * (1.0 - jnp.minimum(blkmask, 1.0)) + Bp
    live_p = gidx_p < sent
    B = jnp.where(live_p[:, :, None] & live_p[:, None, :], B, 0.0) + \
        jnp.eye(P, dtype=dtype)[None] * (~live_p)[:, None, :]
    Binv = spd_inverse(B)    # TPU-f64 safe (no f64 LU on XLA:TPU)
    mult = jnp.zeros((sent + 1,), dtype).at[gidx_p.reshape(-1)].add(
        live_p.astype(dtype).reshape(-1))
    w_ext = jnp.where(mult > 0, 1.0 / jnp.sqrt(jnp.maximum(mult, 1.0)),
                      0.0)
    w_loc = w_ext[gidx_p] * live_p

    def precond(r):
        r_ext = jnp.concatenate([r, jnp.zeros((1,), r.dtype)])
        H = (r_ext[iH0] + r_ext[iH1]).transpose(2, 0, 1)  # [fbs, N+1, N]
        V = (r_ext[iV0] + r_ext[iV1]).transpose(2, 0, 1)
        z = multigrid.mg_precondition_cl(data, GridVecCL(H, V), **mg_kw)
        zH = z.H.transpose(1, 2, 0)
        zV = z.V.transpose(1, 2, 0)
        out = jnp.zeros((sent + 1,), r.dtype)
        for idx, val in ((iH0, zH), (iH1, zH), (iV0, zV), (iV1, zV)):
            out = out.at[idx.reshape(-1)].add(val.reshape(-1))
        rl = w_loc * r_ext[gidx_p]
        zl = _einsum("cij,cj->ci", Binv, rl)
        out = out.at[gidx_p.reshape(-1)].add((w_loc * zl).reshape(-1))
        return out[:sent]

    return precond


def _assembled_face_blocks(dm: InterfaceDofMap, n_face_dofs: int,
                           blocks_and_idx):
    """[F, 2*fbs, 2*fbs] fully ASSEMBLED per-face diagonal blocks of the
    condensed interface system (sum of both adjacent cells' slot
    contributions; single-copy faces fill the leading fbs x fbs corner).

    blocks_and_idx: [(S [Cx, m*fbs, m*fbs], fidx [Cx, m] rebased face
    dof starts with sentinel >= n_face_dofs, faces [Cx, m] face ids)].
    """
    fbs = dm.fbs
    w = 2 * fbs
    F = int(np.asarray(dm.face_table).shape[0])
    face_start = np.asarray(dm.face_table) * fbs
    face_start_j = jnp.asarray(face_start.astype(np.int32))
    FB = jnp.zeros((F + 1, w, w))
    for S, fidx, faces in blocks_and_idx:
        m = faces.shape[1]
        S = S.reshape(S.shape[0], m, fbs, m, fbs)
        dead = fidx >= n_face_dofs
        f_safe = jnp.where(dead, F, faces)
        pos = jnp.where(dead, 0,
                        fidx - face_start_j[jnp.minimum(faces, F - 1)])
        diag = jnp.einsum("csisj->csij", S)      # [Cx, m, fbs, fbs]
        # flat scatter into FB at (face, pos+i, pos+j)
        i = jnp.arange(fbs)
        flat = (f_safe[:, :, None, None] * (w * w) +
                (pos[:, :, None, None] + i[None, None, :, None]) * w +
                (pos[:, :, None, None] + i[None, None, None, :]))
        FB = FB.reshape(-1).at[flat.reshape(-1)].add(
            jnp.where(dead[:, :, None, None], 0.0, diag).reshape(-1)
        ).reshape(F + 1, w, w)
    return FB[:F]


def _face_block_jacobi(dm: InterfaceDofMap, n_face_dofs: int,
                       blocks_and_idx):
    """Per-face block-Jacobi preconditioner of the CONDENSED interface
    system. Every non-Dirichlet face owns a contiguous dof range of
    width fbs (single) or 2*fbs (doubled cut face, cuthho_square.cpp:
    1155-1182) starting at face_table[f]*fbs — the ranges partition the
    condensed space, so the preconditioner is gather / batched solve /
    scatter with zero overlap."""
    fbs = dm.fbs
    w = 2 * fbs
    F = int(np.asarray(dm.face_table).shape[0])
    face_start = np.asarray(dm.face_table) * fbs
    is_cut = np.asarray(dm.face_is_cut)
    width = np.where(is_cut, w, fbs)

    FB = _assembled_face_blocks(dm, n_face_dofs, blocks_and_idx)
    # identity on unused trailing positions of single-copy faces (and on
    # Dirichlet faces, whose blocks stayed zero)
    used = jnp.arange(w)[None, :] < jnp.asarray(width)[:, None]
    touched = jnp.abs(FB).sum((1, 2)) > 0
    used = used & touched[:, None]
    eye = jnp.eye(w)
    FB = jnp.where(used[:, :, None] & used[:, None, :], FB, 0.0) + \
        eye[None] * (~used[:, None, :])
    Binv = spd_inverse(FB)   # TPU-f64 safe (no f64 LU on XLA:TPU)

    # gather index [F, w] into the condensed vector (sentinel-padded)
    gidx = face_start[:, None] + np.arange(w)[None, :]
    gidx = np.where(np.arange(w)[None, :] < width[:, None], gidx,
                    n_face_dofs)
    gidx_j = jnp.asarray(gidx.astype(np.int32))

    def precond(r):
        r_ext = jnp.concatenate([r, jnp.zeros((1,), r.dtype)])
        rf = r_ext[gidx_j]                         # [F, w]
        zf = _einsum("fij,fj->fi", Binv.astype(r.dtype), rf)
        z = jnp.zeros((n_face_dofs + 1,), r.dtype)
        z = z.at[gidx_j.reshape(-1)].add(zf.reshape(-1))
        return z[:n_face_dofs]

    return precond


def take_local_data(mesh, dm: InterfaceDofMap, cutdata: CutData, solution,
                    dirichlet_data, side: int):
    """[C, d'] per-cell local vectors for one side (take_local_data,
    cuthho_square.cpp:1357-1429 — with the face offset bug fixed)."""
    C, nF = mesh.cell_faces.shape
    cbs, fbs = dm.cbs, dm.fbs
    cell_is_cut = cutdata.cell_loc == LOC_CUT
    copy = 1 if side == LOC_POS else 0

    cell_base = dm.cell_table * cbs + \
        jnp.where(cell_is_cut, copy * cbs, 0)
    cell_idx = cell_base[:, None] + jnp.arange(cbs)[None, :]

    face_base = dm.num_all_cells * cbs
    f_ids = mesh.cell_faces
    fbase = face_base + dm.face_table[f_ids] * fbs + \
        copy * jnp.where(dm.face_is_cut[f_ids], fbs, 0)
    is_dir = (mesh.face_bnd == BND_DIRICHLET)[f_ids]
    fidx = fbase[..., None] + jnp.arange(fbs)[None, None, :]
    fidx = jnp.where(is_dir[..., None], dm.n_dofs, fidx)

    idx = jnp.concatenate([cell_idx, fidx.reshape(C, nF * fbs)], axis=1)
    vals = assembly.gather_values(idx.astype(jnp.int32), solution)

    # re-insert Dirichlet projections
    g = dirichlet_data[f_ids]                       # [C, nF, fbs]
    g = jnp.where(is_dir[..., None], g, 0.0).reshape(C, nF * fbs)
    g_loc = jnp.concatenate([jnp.zeros((C, cbs), dtype=g.dtype), g], axis=1)
    return vals + g_loc


def solve_interface(mesh, cutdata: CutData, ls: LevelSet, degree: int,
                    rhs_fun: Callable, sol_fun: Callable,
                    sol_grad: Callable,
                    parms: InterfaceParams = InterfaceParams(),
                    cg_params: cg.CGParams = cg.CGParams(
                        convergence_threshold=1e-9,
                        divergence_threshold=1e8, max_iter=200000,
                        apply_preconditioner=True),
                    condensed: bool = True,
                    precond_kind: str = "auto") -> InterfaceResult:
    """Assemble and solve the kappa-weighted elliptic interface problem
    (run_cuthho_interface, cuthho_square.cpp:1625-1846); hdi =
    (degree+1, degree) (:1662). ``condensed`` (default) eliminates the
    cell blocks and solves the face-only Schur system, preconditioned by
    the uniform fitted structured MG + cut-band Schwarz
    (_interface_mg_precond; ``precond_kind`` 'auto'/'mg'/'bj') on
    generated meshes, else per-face block-Jacobi; ``condensed=False`` is
    the reference-parity full-system Jacobi PCG."""
    hdi = HHODegreeInfo(degree + 1, degree)
    geom = cell_geometry(mesh)
    dm = build_interface_dofmap(mesh, cutdata, hdi)
    C, nF = np.asarray(mesh.cell_faces).shape
    cbs, fbs = dm.cbs, dm.fbs
    nfd = nF * fbs

    batch = make_cut_batch(mesh, geom, cutdata, np.asarray(dm.cut_ids))

    # uncut cells: kappa-weighted fitted operator + naive stabilization
    # (:1668-1681)
    kappa = jnp.where(cutdata.cell_loc == LOC_NEG, parms.kappa_1,
                      parms.kappa_2)
    _, data_fit = hho.hho_laplacian(mesh, geom, hdi)
    stab_fit = hho.naive_stabilization(mesh, geom, hdi)
    lc_all = kappa[:, None, None] * data_fit + stab_fit
    lc_uncut = lc_all[dm.uncut_ids]
    f_std = cell_rhs(mesh, geom, hdi.cell_degree, rhs_fun)

    # cut cells: doubled operator + two side stabilizations mapped into the
    # doubled layout (:1690-1704)
    _, data_cut = cut_methods.interface_laplacian(batch, ls, hdi, parms)
    stab_n = parms.kappa_1 * cut_methods.cut_stabilization(batch, hdi,
                                                           LOC_NEG)
    stab_p = parms.kappa_2 * cut_methods.cut_stabilization(batch, hdi,
                                                           LOC_POS)
    Cc = len(np.asarray(dm.cut_ids))
    lc_cut = data_cut
    # negative-side stab: cells block (0,0), faces block (2cbs, 2cbs)
    lc_cut = lc_cut.at[:, :cbs, :cbs].add(stab_n[:, :cbs, :cbs])
    lc_cut = lc_cut.at[:, :cbs, 2 * cbs:2 * cbs + nfd].add(
        stab_n[:, :cbs, cbs:])
    lc_cut = lc_cut.at[:, 2 * cbs:2 * cbs + nfd, :cbs].add(
        stab_n[:, cbs:, :cbs])
    lc_cut = lc_cut.at[:, 2 * cbs:2 * cbs + nfd, 2 * cbs:2 * cbs + nfd].add(
        stab_n[:, cbs:, cbs:])
    # positive-side stab: cell block at cbs, faces at 2cbs+nfd
    lc_cut = lc_cut.at[:, cbs:2 * cbs, cbs:2 * cbs].add(stab_p[:, :cbs, :cbs])
    lc_cut = lc_cut.at[:, cbs:2 * cbs, 2 * cbs + nfd:].add(
        stab_p[:, :cbs, cbs:])
    lc_cut = lc_cut.at[:, 2 * cbs + nfd:, cbs:2 * cbs].add(
        stab_p[:, cbs:, :cbs])
    lc_cut = lc_cut.at[:, 2 * cbs + nfd:, 2 * cbs + nfd:].add(
        stab_p[:, cbs:, cbs:])

    # cut RHS: plain side sources, no Nitsche lifting (:1708-1710)
    poly_n = cut_methods.side_polygon(batch, LOC_NEG)
    rule_n, phi_n, _ = cut_methods._side_cell_evals(
        batch, poly_n, hdi.cell_degree, 2 * hdi.cell_degree,
        want_grads=False)
    f_neg = _einsum("cq,cqi,cq->ci", rule_n.w, phi_n, rhs_fun(rule_n.pts))
    poly_p = cut_methods.side_polygon(batch, LOC_POS)
    rule_p, phi_p, _ = cut_methods._side_cell_evals(
        batch, poly_p, hdi.cell_degree, 2 * hdi.cell_degree,
        want_grads=False)
    f_pos = _einsum("cq,cqi,cq->ci", rule_p.w, phi_p, rhs_fun(rule_p.pts))

    # Dirichlet data + RHS assembly
    fd = assembly.dirichlet_face_data(mesh, hdi, sol_fun)
    g_faces = fd[mesh.cell_faces[dm.uncut_ids]].reshape(
        len(np.asarray(dm.uncut_ids)), nfd)
    g_uncut = jnp.concatenate(
        [jnp.zeros((g_faces.shape[0], cbs), dtype=g_faces.dtype), g_faces],
        axis=1)
    g_uncut = jnp.where(dm.dirichlet_uncut, g_uncut, 0.0)

    loads_uncut = jnp.zeros_like(g_uncut)
    loads_uncut = loads_uncut.at[:, :cbs].set(f_std[dm.uncut_ids])
    loads_uncut = loads_uncut - _einsum("cij,cj->ci", lc_uncut, g_uncut)
    loads_cut = jnp.zeros((Cc, 2 * (cbs + nfd)), dtype=f_neg.dtype)
    loads_cut = loads_cut.at[:, :cbs].set(f_neg)
    loads_cut = loads_cut.at[:, cbs:2 * cbs].set(f_pos)

    if condensed:
        # STATIC CONDENSATION of the doubled-dof system (round-4 verdict
        # item 7: the full-system Jacobi PCG needed 5,439 iterations at
        # 64^2 k=1). Cell blocks are block-diagonal across cells — uncut
        # cells eliminate cbs dofs, cut cells their 2*cbs doubled block —
        # and the face-only Schur system gets a per-face BLOCK-Jacobi
        # preconditioner (parity bar: the reference's own solver is plain
        # Jacobi CG, cuthho_square.cpp:1737-1743).
        from ..core.ops import cho_solve_batched, robust_spd_solve
        from ..methods import condensation

        face_base = cbs * dm.num_all_cells
        n_face_dofs = dm.n_dofs - face_base

        def rebase(idx):
            return jnp.where(idx >= dm.n_dofs, n_face_dofs,
                             idx - face_base).astype(jnp.int32)

        idx_u = rebase(dm.asm_uncut[:, cbs:])
        idx_c = rebase(dm.asm_cut[:, 2 * cbs:])
        sys_u = condensation.condense(lc_uncut, f_std[dm.uncut_ids], cbs)
        # the cut Nitsche blocks are the ill-conditioned class — keep the
        # LU fallback on this O(interface) batch
        sys_c = condensation.condense(lc_cut, loads_cut[:, :2 * cbs],
                                      2 * cbs, robust=True)
        # Dirichlet folds through the CONDENSED operator (equivalent by
        # exactness of the elimination; condensation.condensed_rhs)
        gF_u = g_uncut[:, cbs:]
        bload_u = sys_u.bF - _einsum("cij,cj->ci", sys_u.S, gF_u)
        rhs_f = assembly.multi_assemble_rhs(n_face_dofs, [
            (idx_u, bload_u), (idx_c, sys_c.bF)])
        apply_Sf = assembly.make_multi_operator(n_face_dofs, [
            (idx_u, sys_u.S), (idx_c, sys_c.S)])
        faces_u = mesh.cell_faces[dm.uncut_ids]
        faces_c = jnp.tile(mesh.cell_faces[dm.cut_ids], (1, 2))
        # structured uniform MG + cut-band Schwarz when the mesh is the
        # generated N x N box and kappa is constant (the uniform-stencil
        # premise); per-face block-Jacobi otherwise
        Nside = int(round(np.sqrt(C)))
        structured = (Nside * Nside == C and
                      mesh.num_faces == 2 * Nside * (Nside + 1) and
                      float(parms.kappa_1) == float(parms.kappa_2) and
                      precond_kind in ("auto", "mg"))
        blocks_and_idx = [(sys_u.S, idx_u[:, ::fbs], faces_u),
                          (sys_c.S, idx_c[:, ::fbs], faces_c)]
        if structured:
            M = _interface_mg_precond(mesh, dm, n_face_dofs, sys_c.S,
                                      idx_c, blocks_and_idx, Nside, hdi,
                                      sys_u.S.dtype)
        else:
            M = _face_block_jacobi(dm, n_face_dofs, blocks_and_idx)
        res = cg.conjugated_gradient(apply_Sf, rhs_f, None, cg_params,
                                     precond=M)

        # back-substitute cell dofs and rebuild the full-layout vector so
        # take_local_data (and every consumer of .x) is unchanged
        xf_ext = jnp.concatenate([res.x, jnp.zeros((1,), res.x.dtype)])
        uF_u = xf_ext[idx_u] + gF_u
        uT_u = cho_solve_batched(
            sys_u.ATT, (sys_u.fT - _einsum("cij,cj->ci", sys_u.ATF,
                                           uF_u))[..., None])[..., 0]
        uF_c = xf_ext[idx_c]
        uT_c = robust_spd_solve(
            sys_c.ATT, (sys_c.fT - _einsum("cij,cj->ci", sys_c.ATF,
                                           uF_c))[..., None])[..., 0]
        x = jnp.zeros((dm.n_dofs + 1,), res.x.dtype)
        x = x.at[face_base + jnp.arange(n_face_dofs)].set(res.x)
        x = x.at[dm.asm_uncut[:, :cbs]].set(uT_u)
        x = x.at[dm.asm_cut[:, :2 * cbs]].set(uT_c)
        res = res._replace(x=x[:dm.n_dofs])
    else:
        rhs = assembly.multi_assemble_rhs(dm.n_dofs, [
            (dm.asm_uncut, loads_uncut), (dm.asm_cut, loads_cut)])
        blocks = [(dm.asm_uncut, lc_uncut), (dm.asm_cut, lc_cut)]
        apply_A = assembly.make_multi_operator(dm.n_dofs, blocks)
        diag = assembly.multi_operator_diagonal(dm.n_dofs, blocks)
        res = cg.conjugated_gradient(apply_A, rhs, diag, cg_params)

    local_neg = take_local_data(mesh, dm, cutdata, res.x, fd, LOC_NEG)
    local_pos = take_local_data(mesh, dm, cutdata, res.x, fd, LOC_POS)

    h1 = interface_h1_error(mesh, geom, batch, cutdata, hdi, local_neg,
                            local_pos, sol_grad)
    return InterfaceResult(res.x, local_neg, local_pos, h1,
                           res.iterations, res.exit_reason)


def interface_h1_error(mesh, geom, batch: CutCellBatch, cutdata: CutData,
                       hdi: HHODegreeInfo, local_neg, local_pos, sol_grad):
    """H1 error over both sides (cuthho_square.cpp:1763-1834): cell-degree
    gradient, side rules on cut cells, standard rule elsewhere."""
    celdeg = hdi.cell_degree
    cbs = bases.cell_basis_size(celdeg)
    is_cut = cutdata.cell_loc == LOC_CUT

    # uncut cells (either side's local data is identical there)
    rule = quadrature.cell_rule(mesh, geom, 2 * celdeg)
    dphi = bases.eval_cell_gradients(rule.pts, geom.bar[:, None, :],
                                     geom.diam[:, None], celdeg)
    gh = _einsum("cqix,ci->cqx", dphi[:, :, 1:, :], local_pos[:, 1:cbs])
    ge = sol_grad(rule.pts)
    per_cell = jnp.sum(rule.w * jnp.sum((ge - gh) ** 2, axis=-1), axis=1)
    err = jnp.sum(jnp.where(~is_cut, per_cell, 0.0))

    # cut cells, each side with its own cell dofs
    for side, local in ((LOC_NEG, local_neg), (LOC_POS, local_pos)):
        poly = cut_methods.side_polygon(batch, side)
        crule = side_cell_rule(poly, 2 * celdeg)
        g = batch.geom
        cdphi = bases.eval_cell_gradients(crule.pts, g.bar[:, None, :],
                                          g.diam[:, None], celdeg)
        cdofs = local[batch.ids][:, 1:cbs]
        cgh = _einsum("cqix,ci->cqx", cdphi[:, :, 1:, :], cdofs)
        cge = sol_grad(crule.pts)
        err = err + jnp.sum(crule.w * jnp.sum((cge - cgh) ** 2, axis=-1))
    return jnp.sqrt(err)


def run_interface(N: int, degree: int, radius: float = 0.35,
                  center=(0.5, 0.5), int_refsteps: int = 4,
                  parms: InterfaceParams = InterfaceParams(), **kw):
    """End-to-end `cuthho_square -i` (cuthho_square.cpp:2064-2065):
    continuous manufactured solution sin(pi x) sin(pi y) with kappa_1 =
    kappa_2 = 1 by default."""
    from ..core.mesh import make_poly_mesh
    from .levelset import circle_level_set

    mesh = make_poly_mesh(Nx=N, Ny=N)
    ls = circle_level_set(radius, *center)
    mesh, cutdata = cut_preprocess(mesh, ls, levels=int_refsteps)

    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
    sol_grad = lambda p: jnp.stack(
        [pi * jnp.cos(pi * p[..., 0]) * jnp.sin(pi * p[..., 1]),
         pi * jnp.sin(pi * p[..., 0]) * jnp.cos(pi * p[..., 1])], axis=-1)

    return solve_interface(mesh, cutdata, ls, degree, rhs_fun, sol_fun,
                           sol_grad, parms, **kw)
