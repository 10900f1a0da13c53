"""Jitted preconditioned conjugate-gradient solver
(replaces conjugated_gradient, src/core/core_bits/solver_cg.hpp:44-144).

Semantics mirrored from the reference:
- optional Jacobi (diagonal) preconditioner (solver_cg.hpp:78-84,106)
- relative-residual convergence test nr/nr0 < tol (":113-116")
- divergence test nr/nr0 > divergence_threshold (":123-126")
- iteration cap `iter > max_iter` (":118-121")
- exit reason enum {CONVERGED, DIVERGED, MAX_ITER_REACHED} (":37-42")
- optional residual history (the reference writes a histfile per iteration,
  ":102-103"; here a fixed-size device array is returned and the app layer
  writes the file)

The operator is matrix-free: any callable x -> A @ x works, including the
segment-sum operator of :mod:`proton_tpu.methods.assembly` and its sharded
variant in :mod:`proton_tpu.parallel`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

CONVERGED = 0
DIVERGED = 1
MAX_ITER_REACHED = 2


@dataclasses.dataclass(frozen=True)
class CGParams:
    """cg_params defaults mirrored from solver_cg.hpp:54-60."""

    convergence_threshold: float = 1e-9
    divergence_threshold: float = 100.0
    max_iter: int = 1000
    apply_preconditioner: bool = False
    record_history: bool = False
    verbose: bool = False   # progress line every 100 iterations
    #                         (solver_cg.hpp:96-100), via jax.debug.print
    recompute_every: int = 0
    # residual replacement (van der Vorst/Ye): every m iterations the
    # recurred residual is replaced by the true residual b - A x (one
    # extra operator application). In float32 the recurred r drifts from
    # the true residual on ill-conditioned systems and CG stagnates
    # (measured: 682 MG-PCG iters at 1024^2 f32 where ~150 suffice);
    # replacement restores convergence without any f64 arithmetic in the
    # loop (large emulated-f64 ops fault the TPU at this scale).


class CGResult(NamedTuple):
    x: jnp.ndarray
    exit_reason: jnp.ndarray      # int32 scalar, one of the codes above
    iterations: jnp.ndarray       # int32 scalar
    rel_residual: jnp.ndarray     # nr/nr0 at exit
    history: Optional[jnp.ndarray]  # [max_iter+2] of nr/nr0, NaN-padded


def _tree_vdot(a, b):
    parts = jax.tree.leaves(jax.tree.map(
        lambda x, y: jnp.vdot(x, y), a, b))
    return sum(parts[1:], parts[0])


def _tree_axpy(alpha, x, y):
    """alpha * x + y over pytrees."""
    return jax.tree.map(lambda xa, ya: alpha * xa + ya, x, y)


def conjugated_gradient(apply_A: Callable, b, diag=None,
                        params: CGParams = CGParams(),
                        precond: Optional[Callable] = None,
                        x0=None, nr0=None) -> CGResult:
    """PCG with x0 = 0 (solver_cg.hpp:63-144). ``diag`` is the operator
    diagonal, required when apply_preconditioner is set; alternatively pass
    an explicit SPD ``precond`` callable r -> M^-1 r (e.g. the per-face
    block-Jacobi of methods/structured.py).

    ``b`` (and the operator's domain) may be any pytree of arrays — e.g.
    the structured-grid face layout of methods/structured.py — not just a
    flat vector; inner products reduce over all leaves.

    ``x0``/``nr0`` support *segmented* restarts: with a warm start the
    initial residual is the TRUE residual b - A x0 (an implicit residual
    replacement against f32 recurrence drift), and the convergence test
    uses the caller's global ``nr0`` instead of the segment's."""
    leaves = jax.tree.leaves(b)
    dtype = leaves[0].dtype
    if precond is not None:
        pass
    elif params.apply_preconditioner:
        if diag is None:
            raise ValueError("Jacobi preconditioning requires diag(A)")
        inv_diag = jax.tree.map(lambda dd: 1.0 / dd, diag)

        def precond(r):
            return jax.tree.map(lambda rr, ii: rr * ii, r, inv_diag)
    else:
        def precond(r):
            return r

    if x0 is None:
        x0 = jax.tree.map(jnp.zeros_like, b)
        r0 = b  # r = b - A*0
    else:
        r0 = jax.tree.map(lambda bb, aa: bb - aa, b, apply_A(x0))
    z0 = precond(r0)
    d0 = z0
    rho0 = _tree_vdot(r0, z0)
    nr_init = jnp.sqrt(_tree_vdot(r0, r0))
    nr0 = nr_init if nr0 is None else nr0
    hist_len = params.max_iter + 2 if params.record_history else 1
    hist0 = jnp.full((hist_len,), jnp.nan, dtype=dtype)

    def cond(state):
        _, _, _, _, _, _, exit_code, _ = state
        return exit_code < 0

    def body(state):
        # Standard PCG carrying z = M^-1 r and rho = <r, z> through the
        # loop: the preconditioner is applied exactly ONCE per iteration
        # (matters when M^-1 is a multigrid V-cycle, not just Jacobi).
        x, r, d, rho, nr, it, _, hist = state
        if params.record_history:
            hist = hist.at[jnp.minimum(it, hist_len - 1)].set(nr / nr0)
        if params.verbose:
            jax.lax.cond(
                it % 100 == 0,
                lambda: jax.debug.print(" -> Iteration {i}, rr = {rr}",
                                        i=it, rr=nr / nr0),
                lambda: None)
        y = apply_A(d)
        alpha = rho / _tree_vdot(d, y)
        x = _tree_axpy(alpha, d, x)
        r = _tree_axpy(-alpha, y, r)
        if params.recompute_every:
            r = jax.lax.cond(
                (it + 1) % params.recompute_every == 0,
                lambda x: jax.tree.map(lambda bb, aa: bb - aa, b,
                                       apply_A(x)),
                lambda _: r, x)
        nr = jnp.sqrt(_tree_vdot(r, r))
        rel = nr / nr0
        exit_code = jnp.where(
            rel < params.convergence_threshold, CONVERGED,
            jnp.where(it > params.max_iter, MAX_ITER_REACHED,
                      jnp.where(rel > params.divergence_threshold,
                                DIVERGED, -1))).astype(jnp.int32)
        z = precond(r)
        rho_new = _tree_vdot(r, z)
        beta = rho_new / rho
        d = _tree_axpy(beta, d, z)
        return (x, r, d, rho_new, nr, it + 1, exit_code, hist)

    state0 = (x0, r0, d0, rho0, nr_init, jnp.int32(0), jnp.int32(-1),
              hist0)
    x, r, d, rho, nr, it, exit_code, hist = jax.lax.while_loop(
        cond, body, state0)
    if params.record_history:
        hist = hist.at[jnp.minimum(it, hist_len - 1)].set(nr / nr0)
    return CGResult(x, exit_code, it, nr / nr0,
                    hist if params.record_history else None)


def solve_spd_dense(A_dense, b):
    """Small dense SPD direct solve — the stand-in for the reference's
    Eigen::SparseLU path (e.g. cuthho_square.cpp:915-919) on problems small
    enough to densify. Cholesky-based."""
    c = jnp.linalg.cholesky(A_dense)
    return jax.scipy.linalg.cho_solve((c, True), b)
