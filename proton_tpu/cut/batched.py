"""Batched geometry families: solve the fictdom problem for MANY level-set
geometries in one vmapped computation (the BASELINE.md stretch config —
the reference loops `cuthho_square` invocations one geometry at a time,
cuthho_square.cpp:2030-2031; on TPU the whole pipeline is a single
compiled program with the geometry batch in the leading axis).

The round-1 blocker was the host-side ``np.nonzero(cell_loc == LOC_CUT)``
gather that gave the cut-cell class its static shape. Here the cut class
has a *fixed capacity* instead (:func:`padded_cut_ids`): cut cells are
compacted to the front of a ``capacity``-sized id vector by argsort and
the tail is padded with the out-of-range sentinel ``C``. Gathers clamp
the sentinel (computing garbage rows that never matter) and the
scatter-splice of the cut operators into the fitted system drops them
(JAX out-of-bounds scatter semantics), so no host sync and no
data-dependent shape remains — the whole solve vmaps over level-set
parameters.

Capacity ~ O(N): a curve of length L cuts ~ 1.5 * L * N cells of an
N x N mesh; the default 6N covers any circle inside the unit square
with 2x headroom. Overflow is reported per geometry (``n_cut_overflow``),
not raised.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core import bases
from ..core.geometry import cell_geometry
from ..core.mesh import make_poly_mesh
from ..core.ops import HHODegreeInfo, cell_rhs
from ..methods import assembly, structured
from ..solvers import cg
from . import methods as cut_methods
from .classify import LOC_CUT, LOC_NEG, _preprocess_core
from .fictdom_structured import (FictdomProblem, default_problem,
                                 fictdom_h1_error_chunked, nitsche_eta)


class FamilyResult(NamedTuple):
    """Per-geometry results, leading axis = geometry batch."""

    h1_error: jnp.ndarray       # [B]
    iterations: jnp.ndarray     # [B]
    exit_reason: jnp.ndarray    # [B]
    rel_residual: jnp.ndarray   # [B]
    n_cut: jnp.ndarray          # [B] number of cut cells
    n_cut_overflow: jnp.ndarray  # [B] cut cells beyond capacity (0 = ok)
    n_bad_cuts: jnp.ndarray     # [B] cells with an invalid cut count
    concave: jnp.ndarray        # [B] node displacement produced a concave


def padded_cut_ids(cell_loc, capacity: int):
    """Fixed-capacity cut-cell id vector: indices of cells with
    ``cell_loc == LOC_CUT`` compacted to the front (ascending, matching
    the host np.nonzero order), padded with the sentinel C. Returns
    (ids [capacity] int32, valid [capacity] bool, n_cut, n_overflow)."""
    C = cell_loc.shape[0]
    is_cut = cell_loc == LOC_CUT
    # stable compaction: cut cells keep ascending order at the front
    key = jnp.where(is_cut, 0, 1).astype(jnp.int32)
    order = jnp.argsort(key, stable=True)
    ids = order[:capacity].astype(jnp.int32)
    valid = is_cut[ids]
    ids = jnp.where(valid, ids, C)
    n_cut = jnp.sum(is_cut)
    return ids, valid, n_cut, jnp.maximum(n_cut - capacity, 0)


def circle_family(params) -> FictdomProblem:
    """params = (radius, cx, cy) -> the reference's circle fictdom
    problem (works on tracers, so it vmaps)."""
    radius, cx, cy = params
    return default_problem(radius, (cx, cy))


def _solve_one_geometry(mesh, dofmap, sys_f, params, *,
                        family, hdi: HHODegreeInfo,
                        eta: float, capacity: int, int_refsteps: int,
                        chunk: int, cg_params: cg.CGParams,
                        side: int = LOC_NEG):
    """One geometry of the family, fully traced (no host syncs): the
    fictdom pipeline of cut/fictdom_structured.py with the padded cut
    class. ``family(params) -> FictdomProblem`` is any traced-parameter
    level-set family (circles, ellipses, flowers, ... — the pipeline is
    shape-generic). Returns the FamilyResult row."""
    from ..methods import poisson

    problem = family(params)
    C = mesh.num_cells
    cbs = bases.cell_basis_size(hdi.cell_degree)

    pts, cutdata, concave, n_bad = _preprocess_core(
        mesh, problem.ls, int_refsteps, agglomeration=False,
        displacement=True)
    mesh2 = mesh.with_points(pts)
    geom = cell_geometry(mesh2)
    ids, valid, n_cut, n_over = padded_cut_ids(cutdata.cell_loc, capacity)
    idsc = jnp.minimum(ids, C - 1)   # clamped gather (garbage rows ok)
    batch = cut_methods.make_cut_batch(mesh2, geom, cutdata, idsc)

    # fitted operators everywhere, cut kernels spliced over the cut class;
    # sentinel rows (ids == C) are DROPPED by the scatter
    _, lc = poisson.assemble_local_chunked(mesh2, geom, hdi, "naive",
                                           chunk)
    f_std = cell_rhs(mesh2, geom, hdi.cell_degree, problem.rhs_fun)
    f = jnp.where((cutdata.cell_loc == side)[:, None], f_std, 0.0)

    _, data_cut = cut_methods.cut_hho_laplacian(batch, problem.ls, hdi,
                                                side, eta=eta)
    stab_cut = cut_methods.cut_stabilization(batch, hdi, side)
    lc_cut = data_cut + stab_cut
    f_cut = cut_methods.cut_rhs(batch, hdi.cell_degree, problem.rhs_fun,
                                problem.ls, problem.sol_fun, side, eta=eta)
    lc = lc.at[ids].set(lc_cut)
    f = f.at[ids].set(f_cut)

    fd = assembly.dirichlet_face_data(mesh2, hdi, problem.sol_fun)
    g_loc = assembly.local_dirichlet_data(dofmap, mesh2, fd)
    local, res = structured.solve_condensed_structured(
        sys_f, lc, f, dofmap.cbs, g_loc, cg_params)

    h1 = fictdom_h1_error_chunked(mesh2, geom, batch,
                                  cutdata.cell_loc, hdi,
                                  local, problem.sol_grad, side,
                                  chunk=chunk, cut_valid=valid)
    # a geometry whose cut class overflowed the fixed capacity solved a
    # WRONG system (overflowed cut cells keep the fitted operator with a
    # zeroed rhs): poison its error so it can't be mistaken for a result
    h1 = jnp.where(n_over > 0, jnp.nan, h1)
    return FamilyResult(h1, res.iterations, res.exit_reason,
                        res.rel_residual, n_cut, n_over, n_bad, concave)


def solve_fictdom_family_params(N: int, degree: int, params, family,
                                capacity: Optional[int] = None,
                                int_refsteps: int = 4,
                                chunk: int = 16384,
                                geom_chunk: Optional[int] = None,
                                cg_params: Optional[cg.CGParams] = None
                                ) -> FamilyResult:
    """Solve the fictdom Poisson problem for a FAMILY of level-set
    geometries on the shared N x N mesh in one compiled program:
    ``params`` is any pytree with the geometry batch on the leading
    axis of every leaf, ``family(one_param_row) -> FictdomProblem``
    builds the problem from traced parameters (see circle_family).
    ``vmap`` over geometries, optionally tiled by ``geom_chunk`` via
    lax.map so only that many geometries' assembly intermediates are
    live at once.

    The per-geometry solve is the same discretization as
    solve_fictdom_structured(mixed=False) with Jacobi-PCG (the
    reference's preconditioner); results match the unbatched path
    geometry-by-geometry (tests assert it)."""
    params = jax.tree.map(jnp.asarray, params)
    B = jax.tree.leaves(params)[0].shape[0]
    if capacity is None:
        capacity = 6 * N
    if cg_params is None:
        cg_params = cg.CGParams(convergence_threshold=1e-6,
                                divergence_threshold=1e8,
                                max_iter=50000,
                                apply_preconditioner=True)
    hdi = HHODegreeInfo(degree + 1, degree)
    eta = nitsche_eta(degree)
    mesh = make_poly_mesh(Nx=N, Ny=N)
    dofmap = assembly.build_dofmap(mesh, hdi)

    one = functools.partial(_solve_one_geometry, family=family, hdi=hdi,
                            eta=eta,
                            capacity=capacity, int_refsteps=int_refsteps,
                            chunk=chunk, cg_params=cg_params)

    # mesh/dofmap are jit ARGUMENTS, not closure constants: big
    # closed-over arrays are inlined into the compile request and break
    # the axon remote compile (HTTP 413) at bench-scale N. sys_f is
    # rebuilt inside (its Nx/Ny/fbs ints must stay static; the freeH/freeV
    # masks are cheap iota arithmetic).
    @jax.jit
    def run(mesh, dofmap, params):
        sys_f = structured.make_structured_system(N, N, dofmap.fbs)
        fn = jax.vmap(lambda pr: one(mesh, dofmap, sys_f, pr))
        if geom_chunk is None or geom_chunk >= B:
            return fn(params)
        nb = -(-B // geom_chunk)
        pad = nb * geom_chunk - B

        def tile(a):
            ap = jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)])
            return ap.reshape(nb, geom_chunk, *a.shape[1:])

        out = jax.lax.map(fn, jax.tree.map(tile, params))
        return jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:])[:B],
                            out)

    return run(mesh, dofmap, params)


def solve_fictdom_family(N: int, degree: int, radii, centers,
                         **kw) -> FamilyResult:
    """Circle-family convenience wrapper over
    solve_fictdom_family_params (the reference's geometry,
    cuthho_square.cpp:2030-2031)."""
    radii = jnp.asarray(radii)
    centers = jnp.asarray(centers)
    return solve_fictdom_family_params(
        N, degree, (radii, centers[:, 0], centers[:, 1]),
        circle_family, **kw)


def ellipse_family(params) -> FictdomProblem:
    """params = (a, b, cx, cy) -> fictdom problem on an ellipse level
    set with the reference's manufactured solution."""
    from .levelset import ellipse_level_set

    a, b, cx, cy = params
    base = default_problem()
    return FictdomProblem(ellipse_level_set(a, b, cx, cy),
                          base.rhs_fun, base.sol_fun, base.sol_grad)


def flower_family(petals: int):
    """Family constructor for k-petaled flowers (petal count is a
    static shape-free int; the remaining params vmap): returns
    ``family((r0, amp, cx, cy)) -> FictdomProblem`` on the non-convex
    flower level set with the reference's manufactured solution."""
    from .levelset import flower_level_set

    def family(params) -> FictdomProblem:
        r0, amp, cx, cy = params
        base = default_problem()
        return FictdomProblem(flower_level_set(r0, amp, petals, cx, cy),
                              base.rhs_fun, base.sol_fun, base.sol_grad)

    return family
