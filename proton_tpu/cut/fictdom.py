"""Fictitious-domain cutHHO Poisson driver
(replaces run_cuthho_fictdom, apps/cuthho/cuthho_square.cpp:806-1080).

Assembly strategy (element-class batching): the fitted HHO kernels run over
*all* cells in one batch — exactly what the reference does for uncut cells,
including positive-side ones (make_hho_laplacian falls back to the fitted
operator there, cuthho_square.cpp:316-317, and the cut stabilization falls
back to the naive one, :572-573) — and the Nitsche cut kernels run over the
compact cut-cell batch; the cut results overwrite the cut rows. The global
system uses the *same* DOF layout and Dirichlet condensation as the fitted
assembler (the reference reuses `assembler`, :882).

The solve is jitted PCG (the reference's own alternative path,
:921-929; its default is SparseLU). The system is SPD: the Nitsche
penalty eta = 5 keeps the cut blocks coercive (check_eigs).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..core import bases, quadrature
from ..core.geometry import cell_geometry
from ..core.ops import HHODegreeInfo, cell_rhs
from ..methods import assembly, hho
from ..solvers import cg
from . import methods as cut_methods
from .classify import CutData, LOC_CUT, LOC_NEG, LOC_POS, cut_preprocess
from .levelset import LevelSet
from .quadrature import side_cell_rule
from .methods import CutCellBatch, make_cut_batch


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


class FictdomResult(NamedTuple):
    x: jnp.ndarray
    local: jnp.ndarray          # [C, d]
    h1_error: jnp.ndarray
    iterations: jnp.ndarray
    exit_reason: jnp.ndarray
    min_eigs: Optional[jnp.ndarray]   # [Cc] coercivity diagnostic
    oper_cut: Optional[jnp.ndarray] = None  # [Cc, rbs, d] cut reconstruction


def assemble_fictdom_local(mesh, geom, batch: CutCellBatch, ls: LevelSet,
                           hdi: HHODegreeInfo, rhs_fun, bcs_fun,
                           side: int = LOC_NEG):
    """(lc [C, d, d], f [C, cbs], oper_cut [Cc, rbs, d]) for the
    fictitious-domain problem (assembly loop, cuthho_square.cpp:882-900)."""
    cell_loc = None  # provided by caller via masks below
    # fitted operators everywhere (uncut fallback)
    _, data_fit = hho.hho_laplacian(mesh, geom, hdi)
    stab_fit = hho.naive_stabilization(mesh, geom, hdi)
    lc = data_fit + stab_fit

    # cut operators on the cut class
    oper_cut, data_cut = cut_methods.cut_hho_laplacian(batch, ls, hdi, side)
    stab_cut = cut_methods.cut_stabilization(batch, hdi, side)
    lc = lc.at[batch.ids].set(data_cut + stab_cut)
    return lc, oper_cut


def assemble_fictdom_rhs(mesh, geom, batch: CutCellBatch, ls: LevelSet,
                         hdi: HHODegreeInfo, rhs_fun, bcs_fun, cell_loc,
                         side: int = LOC_NEG):
    """f [C, cbs]: standard source on side cells, zero on off-side cells,
    side source + Nitsche lifting on cut cells (make_rhs cut overload,
    cuthho_square.cpp:623-666)."""
    f_std = cell_rhs(mesh, geom, hdi.cell_degree, rhs_fun)
    f = jnp.where((cell_loc == side)[:, None], f_std, 0.0)
    f_cut = cut_methods.cut_rhs(batch, hdi.cell_degree, rhs_fun, ls,
                                bcs_fun, side)
    return f.at[batch.ids].set(f_cut)


def solve_fictdom(mesh, cutdata: CutData, ls: LevelSet, degree: int,
                  rhs_fun: Callable, sol_fun: Callable,
                  sol_grad: Callable,
                  cg_params: cg.CGParams = cg.CGParams(
                      convergence_threshold=1e-12,
                      divergence_threshold=1e8, max_iter=200000,
                      apply_preconditioner=True),
                  check_coercivity: bool = False) -> FictdomResult:
    """Full fictitious-domain pipeline: assemble, PCG solve, H1 error on
    the physical (negative) side (run_cuthho_fictdom,
    cuthho_square.cpp:806-1080). hdi = (degree+1, degree) as at :871."""
    hdi = HHODegreeInfo(degree + 1, degree)
    side = LOC_NEG
    geom = cell_geometry(mesh)

    cut_ids = np.nonzero(np.asarray(cutdata.cell_loc) == LOC_CUT)[0]
    batch = make_cut_batch(mesh, geom, cutdata, cut_ids)

    lc, oper_cut = assemble_fictdom_local(mesh, geom, batch, ls, hdi,
                                          rhs_fun, sol_fun, side)
    f = assemble_fictdom_rhs(mesh, geom, batch, ls, hdi, rhs_fun, sol_fun,
                             cutdata.cell_loc, side)

    dofmap = assembly.build_dofmap(mesh, hdi)
    fd = assembly.dirichlet_face_data(mesh, hdi, sol_fun)
    g_loc = assembly.local_dirichlet_data(dofmap, mesh, fd)
    rhs = assembly.assemble_rhs(dofmap, f, lc, g_loc)
    apply_A = assembly.make_operator(dofmap, lc)
    diag = assembly.operator_diagonal(dofmap, lc)
    res = cg.conjugated_gradient(apply_A, rhs, diag, cg_params)
    local = assembly.take_local_data(dofmap, res.x, g_loc)

    h1 = fictdom_h1_error(mesh, geom, batch, cutdata, hdi, local, sol_grad,
                          side)

    eigs = None
    if check_coercivity:
        eigs = jnp.min(cut_methods.check_eigs(batch, ls, hdi, side), axis=1)

    return FictdomResult(res.x, local, h1, res.iterations, res.exit_reason,
                         eigs, oper_cut)


def fictdom_h1_error(mesh, geom, batch: CutCellBatch, cutdata: CutData,
                     hdi: HHODegreeInfo, local, sol_grad,
                     side: int = LOC_NEG):
    """H1 error of the cell polynomial over the physical side
    (cuthho_square.cpp:1031-1050): standard rule on side cells, side rule
    on cut cells; gradient of the cell unknown (celdeg basis, constant
    skipped)."""
    celdeg = hdi.cell_degree
    cbs = bases.cell_basis_size(celdeg)
    cdofs = local[:, :cbs]

    # side (uncut) cells
    rule = quadrature.cell_rule(mesh, geom, 2 * celdeg)
    dphi = bases.eval_cell_gradients(rule.pts, geom.bar[:, None, :],
                                     geom.diam[:, None], celdeg)
    gh = _einsum("cqix,ci->cqx", dphi[:, :, 1:, :], cdofs[:, 1:])
    ge = sol_grad(rule.pts)
    per_cell = jnp.sum(rule.w * jnp.sum((ge - gh) ** 2, axis=-1), axis=1)
    err = jnp.sum(jnp.where(cutdata.cell_loc == side, per_cell, 0.0))

    # cut cells on their side quadrature
    poly = cut_methods.side_polygon(batch, side)
    crule = side_cell_rule(poly, 2 * celdeg)
    g = batch.geom
    cdphi = bases.eval_cell_gradients(crule.pts, g.bar[:, None, :],
                                      g.diam[:, None], celdeg)
    cgh = _einsum("cqix,ci->cqx", cdphi[:, :, 1:, :],
                  cdofs[batch.ids][:, 1:])
    cge = sol_grad(crule.pts)
    err = err + jnp.sum(crule.w * jnp.sum((cge - cgh) ** 2, axis=-1))
    return jnp.sqrt(err)


def fictdom_fields(mesh, cutdata: CutData, ls: LevelSet, degree: int,
                   result: FictdomResult, sol_fun,
                   plot_degree: int = 5):
    """Point-cloud fields of the fictdom postprocess
    (cuthho_square.cpp:1010-1029): uT (cell polynomial), Ru (potential
    reconstruction) and the relative difference vs the exact solution, at
    a degree-``plot_degree`` quadrature rule of every cell.

    Returns (pts [C, Q, 2], uT [C, Q], Ru [C, Q], diff [C, Q]).
    """
    hdi = HHODegreeInfo(degree + 1, degree)
    geom = cell_geometry(mesh)
    cbs = bases.cell_basis_size(hdi.cell_degree)
    rbs = bases.cell_basis_size(hdi.reconstruction_degree)
    side = LOC_NEG

    rule = quadrature.cell_rule(mesh, geom, plot_degree)
    rphi = bases.eval_cell_basis(rule.pts, geom.bar[:, None, :],
                                 geom.diam[:, None],
                                 hdi.reconstruction_degree)
    cphi = rphi[..., :cbs]
    uT = _einsum("cqi,ci->cq", cphi, result.local[:, :cbs])

    # reconstruction dofs: fitted (rbs-1, constant from cell dof 0) for
    # uncut cells, full-rbs Nitsche operator for cut cells
    # (cuthho_square.cpp:970-976, 1019-1024)
    oper_fit, _ = hho.hho_laplacian(mesh, geom, hdi)
    rec_fit = _einsum("crd,cd->cr", oper_fit, result.local)
    Ru = _einsum("cqr,cr->cq", rphi[..., 1:], rec_fit) + \
        result.local[:, :1]

    cut_ids = np.nonzero(np.asarray(cutdata.cell_loc) == LOC_CUT)[0]
    if len(cut_ids) and result.oper_cut is not None:
        rec_cut = _einsum("crd,cd->cr", result.oper_cut,
                          result.local[cut_ids])
        Ru_cut = _einsum("cqr,cr->cq", rphi[cut_ids], rec_cut)
        Ru = Ru.at[cut_ids].set(Ru_cut)

    exact = sol_fun(rule.pts)
    diff = jnp.abs(Ru - exact) * 100.0 / jnp.where(exact == 0, 1.0, exact)
    return rule.pts, uT, Ru, diff


def run_fictdom(N: int, degree: int, radius: float = 0.35,
                center=(0.5, 0.5), int_refsteps: int = 4,
                agglomeration: bool = False, **kw):
    """Convenience end-to-end run mirroring `cuthho_square -f` defaults
    (cuthho_square.cpp:1940-2068): N x N poly mesh, circle level set
    r=0.35 at (0.5, 0.5), manufactured solution sin(pi x) sin(pi y)."""
    from ..core.mesh import make_poly_mesh
    from .levelset import circle_level_set

    mesh = make_poly_mesh(Nx=N, Ny=N)
    ls = circle_level_set(radius, *center)
    mesh, cutdata = cut_preprocess(mesh, ls, levels=int_refsteps,
                                   agglomeration=agglomeration)

    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
    sol_grad = lambda p: jnp.stack(
        [pi * jnp.cos(pi * p[..., 0]) * jnp.sin(pi * p[..., 1]),
         pi * jnp.sin(pi * p[..., 0]) * jnp.cos(pi * p[..., 1])], axis=-1)

    return solve_fictdom(mesh, cutdata, ls, degree, rhs_fun, sol_fun,
                         sol_grad, **kw)
