"""End-to-end uncut HHO Poisson driver: batched assembly + jitted PCG +
batched error evaluation.

This is the library-level equivalent of the assembly/solve/postprocess
phases of the reference apps (apps/convergence_test/convergence_test.cpp:
200-306, apps/cuthho/cuthho_square.cpp:882-931). The whole pipeline is one
jit-compiled function of the mesh pytree; no per-cell work happens in
Python.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..core import bases, quadrature
from ..core.geometry import cell_geometry
from ..core.ops import HHODegreeInfo, cell_rhs, cell_mass_matrices, \
    cho_solve_batched
from . import assembly, hho
from ..solvers import cg


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


class PoissonSolution(NamedTuple):
    x: jnp.ndarray            # condensed global solution [n_dofs]
    local: jnp.ndarray        # per-cell dofs [C, d] incl. Dirichlet data
    oper: jnp.ndarray         # reconstruction operators [C, rbs-1, d]
    iterations: jnp.ndarray
    exit_reason: jnp.ndarray
    rel_residual: jnp.ndarray
    history: Optional[jnp.ndarray]


def assemble_local(mesh, geom, hdi: HHODegreeInfo, stab: str = "hho"):
    """(oper, lc): reconstruction operator and local bilinear forms
    lc = a_T + s_T for every cell (convergence_test.cpp:204-212)."""
    oper, data = hho.hho_laplacian(mesh, geom, hdi)
    if stab == "hho":
        s = hho.fancy_stabilization(mesh, geom, hdi, oper)
    elif stab == "naive":
        s = hho.naive_stabilization(mesh, geom, hdi)
    else:
        raise ValueError(f"unknown stabilization '{stab}'")
    return oper, data + s


def assemble_local_chunked(mesh, geom, hdi: HHODegreeInfo,
                           stab: str = "hho", chunk: int = 8192):
    """Chunked variant of :func:`assemble_local` via ``lax.map`` over cell
    blocks. The batched kernels materialize [C, Q, B, ...] temporaries
    whose TPU tile padding (last dims ~10-16 padded to (8,128)) inflates
    memory ~10x; chunking bounds the padded temp footprint while keeping
    each block large enough to saturate the MXU."""
    import dataclasses as _dc

    C = mesh.num_cells
    if C <= chunk:
        return assemble_local(mesh, geom, hdi, stab)
    n_chunks = -(-C // chunk)
    Cpad = n_chunks * chunk

    def pad(a):
        if Cpad == C:
            return a
        reps = jnp.repeat(a[-1:], Cpad - C, axis=0)
        return jnp.concatenate([a, reps], axis=0)

    stacked = (
        pad(mesh.cell_ptids).reshape(n_chunks, chunk, -1),
        pad(mesh.cell_npts).reshape(n_chunks, chunk),
        pad(mesh.cell_faces).reshape(n_chunks, chunk, -1),
        jax.tree.map(lambda a: pad(a).reshape((n_chunks, chunk)
                                              + a.shape[1:]), geom),
    )

    def body(xs):
        cp, cn, cf, g = xs
        sub = _dc.replace(mesh, cell_ptids=cp, cell_npts=cn, cell_faces=cf)
        return assemble_local(sub, g, hdi, stab)

    oper, lc = jax.lax.map(body, stacked)
    oper = oper.reshape((Cpad,) + oper.shape[2:])[:C]
    lc = lc.reshape((Cpad,) + lc.shape[2:])[:C]
    return oper, lc


def solve_poisson(mesh, dofmap: assembly.DofMap, hdi: HHODegreeInfo,
                  rhs_fun: Callable, bc_fun: Callable, stab: str = "hho",
                  cg_params: cg.CGParams = cg.CGParams(
                      convergence_threshold=1e-12,
                      divergence_threshold=1e8, max_iter=200000,
                      apply_preconditioner=True)) -> PoissonSolution:
    """Assemble and solve -lap(u) = f, u = g on the boundary.

    Fully jittable: trace it with ``jax.jit(partial(solve_poisson,
    hdi=..., rhs_fun=..., bc_fun=..., stab=...))`` over (mesh, dofmap).
    """
    geom = cell_geometry(mesh)
    oper, lc = assemble_local(mesh, geom, hdi, stab)
    f = cell_rhs(mesh, geom, hdi.cell_degree, rhs_fun)
    fd = assembly.dirichlet_face_data(mesh, hdi, bc_fun)
    g_loc = assembly.local_dirichlet_data(dofmap, mesh, fd)
    rhs = assembly.assemble_rhs(dofmap, f, lc, g_loc)
    apply_A = assembly.make_operator(dofmap, lc)
    diag = assembly.operator_diagonal(dofmap, lc)
    res = cg.conjugated_gradient(apply_A, rhs, diag, cg_params)
    local = assembly.take_local_data(dofmap, res.x, g_loc)
    return PoissonSolution(res.x, local, oper, res.iterations,
                           res.exit_reason, res.rel_residual, res.history)


class PoissonErrors(NamedTuple):
    l2: jnp.ndarray       # sqrt(sum_T int (u - u_T)^2), vs quadrature
    l2_proj: jnp.ndarray  # sqrt(sum_T (pi u - u_T)' M (pi u - u_T))
    energy: jnp.ndarray   # sqrt(sum_T int |grad u - grad r(u_T)|^2)


def compute_errors(mesh, hdi: HHODegreeInfo, sol: PoissonSolution,
                   exact_fun: Callable, exact_grad: Callable
                   ) -> PoissonErrors:
    """The three error measures of convergence_test.cpp:254-306, computed
    in one batched pass.

    Deviation from the reference (documented): convergence_test.cpp:262-274
    re-accumulates the projection error and re-factorizes the mass matrix
    *inside* the quadrature-point loop, inflating errors_mm by the number of
    quadrature points; we accumulate each cell term once. Orders (the
    published quantity) are unaffected. The energy error uses the
    reconstruction-degree rule (the reference computes rule qps2 at
    :288 but then iterates the lower-order rule — an apparent slip).
    """
    geom = cell_geometry(mesh)
    celdeg = hdi.cell_degree
    recdeg = hdi.reconstruction_degree
    cbs = bases.cell_basis_size(celdeg)

    rule = quadrature.cell_rule(mesh, geom, 2 * celdeg)
    phi = bases.eval_cell_basis(rule.pts, geom.bar[:, None, :],
                                geom.diam[:, None], celdeg)
    cdofs = sol.local[:, :cbs]
    uh = _einsum("cqi,ci->cq", phi, cdofs)
    l2_sq = jnp.sum(rule.w * (exact_fun(rule.pts) - uh) ** 2)

    mass = cell_mass_matrices(mesh, geom, celdeg)
    rhs = cell_rhs(mesh, geom, celdeg, exact_fun)
    pdofs = cho_solve_batched(mass, rhs[..., None])[..., 0]
    diff = pdofs - cdofs
    mm_sq = jnp.sum(diff * _einsum("cij,cj->ci", mass, diff))

    rrule = quadrature.cell_rule(mesh, geom, 2 * recdeg)
    dphi = bases.eval_cell_gradients(rrule.pts, geom.bar[:, None, :],
                                     geom.diam[:, None], recdeg)
    recdofs = _einsum("crd,cd->cr", sol.oper, sol.local)
    gh = _einsum("cqrx,cr->cqx", dphi[:, :, 1:, :], recdofs)
    ge = exact_grad(rrule.pts)
    en_sq = jnp.sum(rrule.w * jnp.sum((ge - gh) ** 2, axis=-1))

    return PoissonErrors(jnp.sqrt(l2_sq), jnp.sqrt(mm_sq), jnp.sqrt(en_sq))


def make_jitted_pipeline(hdi: HHODegreeInfo, rhs_fun, bc_fun, exact_grad,
                         stab: str = "hho",
                         cg_params: cg.CGParams = cg.CGParams(
                             convergence_threshold=1e-12,
                      divergence_threshold=1e8, max_iter=200000,
                             apply_preconditioner=True)):
    """One jit-compiled (mesh, dofmap) -> (solution, errors) pipeline.
    bc_fun doubles as the exact solution for the error computation, as in
    convergence_test.cpp:214,266."""

    @partial(jax.jit, static_argnames=())
    def pipeline(mesh, dofmap):
        sol = solve_poisson(mesh, dofmap, hdi, rhs_fun, bc_fun, stab,
                            cg_params)
        errs = compute_errors(mesh, hdi, sol, bc_fun, exact_grad)
        return sol, errs

    return pipeline
