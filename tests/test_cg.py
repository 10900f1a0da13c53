"""Jitted PCG semantics vs the reference solver (solver_cg.hpp:44-144)."""

import numpy as np
import jax.numpy as jnp

from proton_tpu.solvers import cg


def _random_spd(n, seed=0, cond=100.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.geomspace(1.0, cond, n)
    return jnp.asarray(Q @ np.diag(vals) @ Q.T)


def test_cg_solves_spd():
    A = _random_spd(64)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(64))
    res = cg.conjugated_gradient(
        lambda x: A @ x, b,
        params=cg.CGParams(convergence_threshold=1e-13, max_iter=5000))
    assert int(res.exit_reason) == cg.CONVERGED
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert np.allclose(np.asarray(res.x), x_ref, atol=1e-9)


def test_jacobi_preconditioner_reduces_iterations():
    n = 96
    rng = np.random.default_rng(2)
    # strongly diagonal-scaled SPD system: Jacobi should shine
    D = np.diag(np.geomspace(1, 1e4, n))
    M = rng.standard_normal((n, n)) * 0.1
    A = jnp.asarray(D + M @ M.T)
    b = jnp.asarray(rng.standard_normal(n))
    diag = jnp.diagonal(A)
    p = cg.CGParams(convergence_threshold=1e-12, max_iter=100000)
    res_plain = cg.conjugated_gradient(lambda x: A @ x, b, params=p)
    import dataclasses
    res_pc = cg.conjugated_gradient(
        lambda x: A @ x, b, diag,
        dataclasses.replace(p, apply_preconditioner=True))
    assert int(res_pc.iterations) < int(res_plain.iterations)
    assert int(res_pc.exit_reason) == cg.CONVERGED


def test_max_iter_exit():
    A = _random_spd(64, cond=1e6)
    b = jnp.ones(64)
    res = cg.conjugated_gradient(
        lambda x: A @ x, b,
        params=cg.CGParams(convergence_threshold=1e-14, max_iter=2))
    assert int(res.exit_reason) == cg.MAX_ITER_REACHED


def test_history_recorded():
    A = _random_spd(32)
    b = jnp.ones(32)
    res = cg.conjugated_gradient(
        lambda x: A @ x, b,
        params=cg.CGParams(convergence_threshold=1e-12, max_iter=500,
                           record_history=True))
    h = np.asarray(res.history)
    it = int(res.iterations)
    assert np.isfinite(h[:it + 1]).all()
    assert h[0] == 1.0
    assert h[it] < 1e-12


def test_precond_applied_once_per_iteration():
    """The loop body must contain exactly ONE preconditioner application
    (VERDICT r1: the old loop applied it twice, doubling the cost of any
    multigrid preconditioner). Counted at trace time: lax.while_loop
    traces the body once, so trace-time call count == per-iteration
    application count (+1 for the z0 = M^-1 r0 initialization)."""
    A = _random_spd(48)
    b = jnp.ones(48)
    calls = []

    def counting_precond(r):
        calls.append(1)
        return 0.5 * r

    res = cg.conjugated_gradient(
        lambda x: A @ x, b,
        params=cg.CGParams(convergence_threshold=1e-12, max_iter=5000),
        precond=counting_precond)
    assert int(res.exit_reason) == cg.CONVERGED
    assert len(calls) == 2  # one init + one in the (once-traced) body


def test_pcg_iterates_match_textbook():
    """Iterate-for-iterate parity with a plain-numpy textbook PCG."""
    n = 80
    rng = np.random.default_rng(7)
    A = np.asarray(_random_spd(n, seed=5, cond=1e4))
    b = rng.standard_normal(n)
    Minv = 1.0 / np.diagonal(A)

    # numpy reference
    x = np.zeros(n)
    r = b.copy()
    z = Minv * r
    d = z.copy()
    rho = r @ z
    nr0 = np.linalg.norm(b)
    iters = 0
    while np.linalg.norm(r) / nr0 >= 1e-11:
        y = A @ d
        alpha = rho / (d @ y)
        x += alpha * d
        r -= alpha * y
        z = Minv * r
        rho_new = r @ z
        d = z + (rho_new / rho) * d
        rho = rho_new
        iters += 1

    res = cg.conjugated_gradient(
        jnp.asarray(A).__matmul__, jnp.asarray(b), jnp.asarray(np.diag(A)),
        cg.CGParams(convergence_threshold=1e-11, max_iter=100000,
                    apply_preconditioner=True))
    # reduction order differs between numpy and XLA, so allow a few
    # iterations of slack near the tolerance; the algorithm is the same.
    assert abs(int(res.iterations) - iters) <= max(3, iters // 50)
    assert np.allclose(np.asarray(res.x), x, atol=1e-9)
