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
from ..core.ops import HHODegreeInfo, cell_rhs
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
                        apply_preconditioner=True)) -> InterfaceResult:
    """Assemble and solve the kappa-weighted elliptic interface problem
    (run_cuthho_interface, cuthho_square.cpp:1625-1846); hdi =
    (degree+1, degree) (:1662)."""
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
