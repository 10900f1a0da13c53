"""cutHHO operators: coercivity, projection consistency, and the golden
convergence runs of the two cuthho_square problems (-f and -i)."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.cut import classify, fictdom, interface_problem, levelset
from proton_tpu.cut import methods as cm


def _batch(N=8, k=1):
    m = pt.make_poly_mesh(Nx=N, Ny=N)
    ls = levelset.circle_level_set(0.35, 0.5, 0.5)
    m, cd = classify.cut_preprocess(m, ls, levels=4)
    geom = cell_geometry(m)
    ids = np.nonzero(np.asarray(cd.cell_loc) == classify.LOC_CUT)[0]
    batch = cm.make_cut_batch(m, geom, cd, ids)
    return m, ls, cd, geom, batch, HHODegreeInfo(k + 1, k)


def test_nitsche_coercivity():
    """check_eigs equivalent: all eigenvalues of the Nitsche side stiffness
    positive with eta = 5 (cuthho_square.cpp:504-560)."""
    m, ls, cd, geom, batch, hdi = _batch(8, 1)
    eigs = cm.check_eigs(batch, ls, hdi, classify.LOC_NEG)
    assert float(jnp.min(eigs)) > 0


def test_cut_operators_symmetric_psd():
    m, ls, cd, geom, batch, hdi = _batch(8, 1)
    _, data = cm.cut_hho_laplacian(batch, ls, hdi, classify.LOC_NEG)
    D = np.asarray(data)
    assert np.allclose(D, np.swapaxes(D, 1, 2), atol=1e-10)
    S = np.asarray(cm.cut_stabilization(batch, hdi, classify.LOC_NEG))
    assert np.allclose(S, np.swapaxes(S, 1, 2), atol=1e-10)
    for M in (D[0], S[0]):
        assert np.linalg.eigvalsh(M).min() > -1e-9


def test_cut_projection_reproduces_polynomials():
    m, ls, cd, geom, batch, hdi = _batch(8, 1)

    def f(p):
        return 1.0 + p[..., 0] - 2 * p[..., 1]

    proj = cm.cut_project_function(batch, hdi, classify.LOC_NEG, f)
    # evaluate the cell part on negative-side quadrature points: must be f
    from proton_tpu.cut.quadrature import side_cell_rule
    from proton_tpu.core import bases
    poly = cm.side_polygon(batch, classify.LOC_NEG)
    rule = side_cell_rule(poly, 4)
    cbs = bases.cell_basis_size(hdi.cell_degree)
    phi = bases.eval_cell_basis(rule.pts, batch.geom.bar[:, None, :],
                                batch.geom.diam[:, None], hdi.cell_degree)
    vals = jnp.einsum("cqi,ci->cq", phi, proj[:, :cbs])
    err = jnp.abs(vals - f(rule.pts)) * (rule.w > 0)
    assert float(jnp.max(err)) < 1e-9


def test_interface_reconstruction_consistency():
    """The doubled reconstruction reproduces a globally smooth polynomial:
    project x+y on both sides, reconstruct, compare on side quadrature."""
    m, ls, cd, geom, batch, hdi = _batch(8, 1)

    def f(p):
        return p[..., 0] + p[..., 1]

    from proton_tpu.core import bases
    from proton_tpu.cut.quadrature import side_cell_rule
    cbs = bases.cell_basis_size(hdi.cell_degree)
    rbs = bases.cell_basis_size(hdi.reconstruction_degree)
    nfd = batch.face_loc.shape[1] * bases.face_basis_size(hdi.face_degree)

    proj_n = cm.cut_project_function(batch, hdi, classify.LOC_NEG, f)
    proj_p = cm.cut_project_function(batch, hdi, classify.LOC_POS, f)
    proj = jnp.concatenate([proj_n[:, :cbs], proj_p[:, :cbs],
                            proj_n[:, cbs:], proj_p[:, cbs:]], axis=1)

    oper, _ = cm.interface_laplacian(batch, ls, hdi)
    rec = jnp.einsum("crd,cd->cr", oper, proj)     # [Cc, 2*rbs]

    poly = cm.side_polygon(batch, classify.LOC_NEG)
    rule = side_cell_rule(poly, 4)
    phi = bases.eval_cell_basis(rule.pts, batch.geom.bar[:, None, :],
                                batch.geom.diam[:, None],
                                hdi.reconstruction_degree)
    vals = jnp.einsum("cqi,ci->cq", phi, rec[:, :rbs])
    # reconstruction may differ by the (regularized) constant mode shared
    # between sides; compare gradients instead: d/dx should be 1
    dphi = bases.eval_cell_gradients(rule.pts, batch.geom.bar[:, None, :],
                                     batch.geom.diam[:, None],
                                     hdi.reconstruction_degree)
    g = jnp.einsum("cqix,ci->cqx", dphi, rec[:, :rbs])
    err = jnp.abs(g - jnp.ones_like(g)) * (rule.w > 0)[..., None]
    assert float(jnp.max(err)) < 1e-8


@pytest.mark.parametrize("k", [0, 1])
def test_fictdom_convergence(k):
    """`cuthho_square -f`: H1 order k+1 on the negative side."""
    errs = []
    for N in [8, 16]:
        res = fictdom.run_fictdom(N, k)
        assert int(res.exit_reason) == 0
        errs.append(float(res.h1_error))
    order = np.log2(errs[0] / errs[1])
    assert order > k + 1 - 0.35, f"k={k} order={order}"


@pytest.mark.parametrize("k", [0, 1])
def test_interface_convergence(k):
    """`cuthho_square -i`: H1 order k+1 over both sides."""
    errs = []
    for N in [8, 16]:
        res = interface_problem.run_interface(N, k)
        assert int(res.exit_reason) == 0
        errs.append(float(res.h1_error))
    order = np.log2(errs[0] / errs[1])
    assert order > k + 1 - 0.35, f"k={k} order={order}"


def test_interface_k2_convergence():
    """`cuthho_square -i -k 2`: H1 order 3 over both sides (f64; the
    doubled cut blocks need the same precision care as fictdom k=2)."""
    errs = []
    for N in [8, 16]:
        res = interface_problem.run_interface(N, 2)
        assert int(res.exit_reason) == 0
        errs.append(float(res.h1_error))
    order = np.log2(errs[0] / errs[1])
    assert order > 3 - 0.35, f"k=2 order={order}"


def test_interface_kappa_contrast_runs():
    """kappa_1 != kappa_2 assembles and solves (continuous manufactured
    solution no longer matches the jump conditions, so no order check —
    just SPD solve health)."""
    res = interface_problem.run_interface(
        8, 0, parms=cm.InterfaceParams(kappa_1=1.0, kappa_2=3.0))
    assert int(res.exit_reason) == 0
    assert np.isfinite(float(res.h1_error))


def test_fictdom_k2_convergence_f64():
    """k=2 fictdom: H1 order k+1 = 3 (f64; in float32 the sliver-cut local
    blocks round to indefinite — see robust_spd_solve and CLAUDE.md)."""
    errs = []
    for N in [8, 16]:
        res = fictdom.run_fictdom(N, 2)
        assert int(res.exit_reason) == 0
        errs.append(float(res.h1_error))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.6, f"k=2 order={order}"


def test_interface_condensed_matches_full():
    """Static condensation of the doubled-dof interface system is EXACT:
    the condensed face solve + back-substitution reproduces the full
    system's solution, at a fraction of the iterations (round-4 verdict
    item 7 — the full-system Jacobi PCG needed 5,439 iterations at 64^2;
    the per-face block-Jacobi condensed solve is the production path)."""
    from proton_tpu.solvers import cg as cg_m

    p = cg_m.CGParams(convergence_threshold=1e-10,
                      divergence_threshold=1e8, max_iter=100000,
                      apply_preconditioner=True)
    r_full = interface_problem.run_interface(8, 1, cg_params=p,
                                             condensed=False)
    r_cond = interface_problem.run_interface(8, 1, cg_params=p,
                                             condensed=True)
    assert int(r_full.exit_reason) == 0
    assert int(r_cond.exit_reason) == 0
    dev = np.max(np.abs(np.asarray(r_cond.x) - np.asarray(r_full.x)))
    dev /= np.max(np.abs(np.asarray(r_full.x)))
    assert dev < 1e-7, f"condensed deviates from full: {dev:.2e}"
    assert int(r_cond.iterations) < int(r_full.iterations) / 2, (
        int(r_cond.iterations), int(r_full.iterations))
