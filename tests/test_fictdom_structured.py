"""Structured fictdom driver (cut/fictdom_structured.py): equivalence vs
the generic path, mixed precision, MG iteration reduction, chunked H1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proton_tpu.cut import fictdom, fictdom_structured as fs
from proton_tpu.solvers import cg


def _cgp(tol=1e-12):
    return cg.CGParams(convergence_threshold=tol, divergence_threshold=1e8,
                       max_iter=30000, apply_preconditioner=True)


def test_structured_matches_generic():
    ref = fictdom.run_fictdom(16, 1)
    r = fs.solve_fictdom_structured(16, 1, mixed=False, use_pallas=False,
                                    cg_params=_cgp())
    assert int(r.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r.local - ref.local))) < 1e-8
    assert np.isclose(float(r.h1_error), float(ref.h1_error), rtol=1e-6)


def test_h1_chunked_matches_full():
    """The blockwise H1 evaluation equals the direct one (including an
    uneven final block)."""
    from proton_tpu.core.geometry import cell_geometry
    from proton_tpu.core.ops import HHODegreeInfo
    from proton_tpu.cut import methods as cut_methods

    N, k = 12, 1
    problem = fs.default_problem()
    hdi = HHODegreeInfo(k + 1, k)
    r = fs.solve_fictdom_structured(N, k, problem, mixed=False,
                                    use_pallas=False, cg_params=_cgp())
    mesh, cutdata, cut_ids = fs.classify_level(N, problem, 4, False)
    geom = cell_geometry(mesh)
    batch = cut_methods.make_cut_batch(mesh, geom, cutdata, cut_ids)
    full = fictdom.fictdom_h1_error(mesh, geom, batch, cutdata, hdi,
                                    r.local, problem.sol_grad)
    chunked = fs.fictdom_h1_error_chunked(mesh, geom, batch,
                                          cutdata.cell_loc, hdi,
                                          r.local, problem.sol_grad,
                                          chunk=100)   # 144 cells -> 2 blocks
    assert np.isclose(float(chunked), float(full), rtol=1e-10)


@pytest.mark.parametrize("k", [1, 2])
def test_fictdom_mixed_precision(k):
    """Mixed precision (f64 cut class spliced into the f32 system) keeps
    the f32 system SPD and convergent at every degree (at k >= 2 the
    pure-f32 cut blocks round indefinite). Accuracy stays at the f32
    fitted-assembly noise floor — discretization-level accuracy is the
    f64+f32-MG accurate mode's job (test below)."""
    N = 16
    ref = fictdom.run_fictdom(N, k)          # f64 end to end
    r = fs.solve_fictdom_structured(N, k, mixed=True, use_pallas=False,
                                    cg_params=_cgp(1e-7))
    assert int(r.exit_reason) == cg.CONVERGED
    assert float(r.rel_residual) < 1e-6
    # k=1: the discretization error dominates the f32 noise at N=16
    if k == 1:
        assert float(r.h1_error) < 1.3 * float(ref.h1_error)
    else:
        assert float(r.h1_error) < 5e-3   # measured f32 noise floor


@pytest.mark.slow
def test_fictdom_accurate_mode_f32_mg():
    """Accurate mode: f64 system + CG with the float32 V-cycle as
    preconditioner reproduces the f64 discretization error at k=2 (where
    f32 assembly noise is 15x the discretization error)."""
    N, k = 16, 2
    ref = fictdom.run_fictdom(N, k)
    r = fs.solve_fictdom_structured(N, k, mixed=False, use_pallas=False,
                                    cg_params=_cgp(1e-11), precond="mg",
                                    n_smooth=2, patch_ring=1, mg_f32=True)
    assert int(r.exit_reason) == cg.CONVERGED
    assert r.local.dtype == jnp.float64
    # 1.2% above the generic run: the structured driver uses the
    # k-scaled Nitsche penalty eta = 5 (k+1)^2 = 45 (nitsche_eta) vs the
    # generic default 5 — a method constant, not a precision loss
    # (full-f64 structured at eta=45 gives the same 1.8041e-4).
    assert float(r.h1_error) < 1.05 * float(ref.h1_error)


@pytest.mark.slow
def test_mg_reduces_iterations_vs_jacobi():
    """The round-2 multigrid gate (VERDICT item 3): MG-PCG iterations
    < Jacobi-PCG / 10 on the cut fictdom system at 128^2."""
    N = 128
    cgp = cg.CGParams(convergence_threshold=1e-8, divergence_threshold=1e8,
                      max_iter=30000, apply_preconditioner=True)
    r_j = fs.solve_fictdom_structured(N, 1, precond="jacobi", mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      compute_h1=False)
    # cg_segment routes through the split setup/apply jits — same math,
    # three smaller programs (the fused one-jit solve at 128^2
    # intermittently segfaults the XLA:CPU compiler under the full
    # suite's load)
    r_m = fs.solve_fictdom_structured(N, 1, precond="mg", mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      cg_segment=30000,
                                      compute_h1=False)
    assert int(r_m.exit_reason) == cg.CONVERGED
    assert int(r_m.iterations) * 10 < int(r_j.iterations)
    # same solution
    assert float(jnp.max(jnp.abs(r_m.local - r_j.local))) < 1e-6


def test_expand_ring():
    ids = np.array([0, 5])         # corner + center of a 3x3 grid
    out = fs.expand_ring(ids, 3, 1)
    # cell 0 -> {0,1,3,4}; cell 5 (row 1, col 2) -> {1,2,4,5,7,8}
    assert set(out) == {0, 1, 2, 3, 4, 5, 7, 8}
    assert fs.expand_ring(ids, 3, 0).tolist() == [0, 5]


def test_debug_dumps(tmp_path, monkeypatch):
    """plot_basis_functions / plot_quadrature_points / test_mass_matrices
    parity dumps (cuthho_square.cpp:130-273): formats + projection
    accuracy."""
    import proton_tpu as pt
    from proton_tpu.io import debug_plots as dp

    monkeypatch.chdir(tmp_path)
    mesh = pt.make_quad_mesh(Nx=8, Ny=8)

    cf, ff = dp.plot_basis_functions(mesh)
    cell = np.loadtxt(cf)
    assert cell.shape == (64 * 121, 2 + 10)   # deg 3 -> 10 basis fns
    # first basis function is the constant 1 everywhere
    assert np.allclose(cell[:, 2], 1.0)
    face = np.loadtxt(ff)
    assert face.shape == (144 * 11, 2 + 3)    # deg 2 -> 3 basis fns

    cf, ff = dp.plot_quadrature_points(mesh, 4)
    cell = np.loadtxt(cf)
    # weights of each cell sum to the cell area
    assert np.isclose(cell[:, 2].sum(), 1.0, atol=1e-12)
    face = np.loadtxt(ff)
    assert np.isclose(face[:, 2].sum(), 144 * (1.0 / 8), atol=1e-12)

    cf, ff = dp.test_mass_matrices(mesh, 2)
    cell = np.loadtxt(cf)
    exact = np.sin(np.pi * cell[:, 0]) * np.sin(np.pi * cell[:, 1])
    assert np.max(np.abs(cell[:, 2] - exact)) < 5e-3   # deg-2 L2 proj, h=1/8
    face = np.loadtxt(ff)
    fexact = np.sin(np.pi * face[:, 0]) * np.sin(np.pi * face[:, 1])
    assert np.max(np.abs(face[:, 2] - fexact)) < 5e-3


def test_assemble_f64_chunked_matches_upcast():
    """The accurate-mode block-upcast assembly equals assembling from a
    fully upcast f64 mesh (same f32-classified geometry), including the
    cut-class splice and an uneven final block."""
    import jax
    from proton_tpu.core.geometry import cell_geometry
    from proton_tpu.core.ops import HHODegreeInfo
    from proton_tpu.cut import methods as cut_methods
    from proton_tpu.methods import cells_last

    N, k = 12, 1
    problem = fs.default_problem()
    hdi = HHODegreeInfo(k + 1, k)
    eta = fs.nitsche_eta(k)
    mesh, cutdata, cut_ids = fs.classify_level(N, problem, 4, False,
                                               classify_f32=True)
    geom = cell_geometry(mesh)
    batch = cut_methods.make_cut_batch(mesh, geom, cutdata, cut_ids)

    got = fs._assemble_level_cl_f64(mesh, geom, cutdata.cell_loc,
                                    batch, hdi,
                                    problem, eta, with_rhs=True,
                                    chunk=100)     # 144 cells -> 2 blocks
    assert got.S.dtype == jnp.float64

    mesh64 = fs._cast64(mesh)
    geom64 = cell_geometry(mesh64)
    batch64 = cut_methods.make_cut_batch(mesh64, geom64,
                                         fs._cast64(cutdata), cut_ids)
    ref = fs._assemble_level_cl(mesh64, geom64, cutdata.cell_loc,
                                batch64, hdi, problem, eta,
                                use_pallas=False, with_rhs=True)
    sub = fs._cut64_impl(batch, hdi=hdi, problem=problem, eta=eta,
                         with_rhs=True, keep_f64=True)
    ref = cells_last.set_cells(ref, cut_ids, sub)
    for a, b in zip(got, ref):
        scale = float(jnp.max(jnp.abs(b))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) < 1e-11 * scale


def test_segmented_solve_matches_plain():
    """cg_segment: warm-started segments with true-residual restarts
    converge to the same solution as the single while_loop solve."""
    cgp = cg.CGParams(convergence_threshold=1e-10, divergence_threshold=1e8,
                      max_iter=10000, apply_preconditioner=True)
    r1 = fs.solve_fictdom_structured(16, 1, mixed=False, use_pallas=False,
                                     cg_params=cgp)
    r2 = fs.solve_fictdom_structured(16, 1, mixed=False, use_pallas=False,
                                     cg_params=cgp, cg_segment=4)
    assert int(r2.exit_reason) == cg.CONVERGED
    assert float(r2.rel_residual) < 1e-10
    assert np.isclose(float(r1.h1_error), float(r2.h1_error), rtol=1e-9)


@pytest.mark.parametrize("k", [1, 2])
def test_uniform_assembly_matches_full(k):
    """The unit-cell broadcast assembly (fitted='uniform') reproduces the
    full per-cell assembly to machine precision on the generated mesh:
    congruent square cells + translation-invariant scaled-monomial bases
    share ONE local operator; distorted + cut cells are spliced exactly."""
    from proton_tpu.core.ops import HHODegreeInfo

    hdi = HHODegreeInfo(k + 1, k)
    eta = fs.nitsche_eta(k)
    problem = fs.default_problem()
    N = 24
    a = fs.build_level(N, hdi, problem, eta, 4, mixed=False,
                       use_pallas=False, with_rhs=True)
    b = fs.build_level(N, hdi, problem, eta, 4, mixed=False,
                       use_pallas=False, with_rhs=True, fitted="uniform")
    assert np.array_equal(a.cut_ids, b.cut_ids)
    for name in ("S", "bF", "X", "y"):
        da, db = getattr(a.cond, name), getattr(b.cond, name)
        scale = float(jnp.max(jnp.abs(da))) + 1e-300
        rel = float(jnp.max(jnp.abs(da - db))) / scale
        assert rel < 5e-13, (name, rel)


def test_uniform_split_operator_matches_structured():
    """The constant-stencil split operator (uniform S_u broadcast + dS on
    the irregular columns) and its block-Jacobi twin reproduce the full
    cells-last operator EXACTLY on a cut fictdom level."""
    from proton_tpu.core.ops import HHODegreeInfo
    from proton_tpu.methods import cells_last, structured

    N, k = 24, 1
    hdi = HHODegreeInfo(k + 1, k)
    lev = fs.build_level(N, hdi, fs.default_problem(), fs.nitsche_eta(k),
                         4, mixed=False, use_pallas=False, with_rhs=True,
                         fitted="uniform")
    assert lev.S_u is not None
    sys_f = structured.make_structured_system(N, N, 2)
    S = lev.cond.S
    dS = cells_last.uniform_deltas(S, lev.S_u.astype(S.dtype),
                                   lev.irr_ids)
    apply_u = cells_last.make_uniform_operator_cl(
        sys_f, lev.S_u.astype(S.dtype), lev.irr_ids, dS)
    apply_f = cells_last.make_structured_operator_cl(sys_f, S)
    rng = np.random.default_rng(3)
    x = cells_last.GridVecCL(
        jnp.asarray(rng.standard_normal((2, N + 1, N))),
        jnp.asarray(rng.standard_normal((2, N, N + 1))))
    yu, yf = apply_u(x), apply_f(x)
    assert float(jnp.max(jnp.abs(yu.H - yf.H))) < 1e-12
    assert float(jnp.max(jnp.abs(yu.V - yf.V))) < 1e-12

    # block-Jacobi: constant interior inverses + sparse corrections
    iH, iV = cells_last.block_jacobi_setup_cl(sys_f, S)
    iHu, iVu = cells_last.uniform_block_jacobi_blocks(sys_f, lev.S_u)
    corrH, corrV = cells_last.uniform_bj_corrections(
        sys_f, iH, iV, iHu.astype(S.dtype), iVu.astype(S.dtype),
        lev.irr_ids)
    bj_u = cells_last.make_uniform_block_jacobi_cl(
        sys_f, iHu.astype(S.dtype), iVu.astype(S.dtype), corrH, corrV)
    from functools import partial
    bj_f = partial(cells_last.apply_block_jacobi_cl, iH, iV)
    r = cells_last.GridVecCL(x.H * sys_f.freeH[None],
                             x.V * sys_f.freeV[None])
    zu, zf = bj_u(r), bj_f(r)
    assert float(jnp.max(jnp.abs(zu.H - zf.H))) < 1e-12
    assert float(jnp.max(jnp.abs(zu.V - zf.V))) < 1e-12


@pytest.mark.slow
def test_uniform_solve_matches_full():
    """End-to-end: the uniform fitted mode (split operator through MG
    setup, V-cycle and CG) converges to the same solution as the full
    assembly path."""
    cgp = _cgp(1e-10)
    r_f = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="full")
    r_u = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="uniform")
    assert int(r_u.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r_u.local - r_f.local))) < 1e-8
    assert np.isclose(float(r_u.h1_error), float(r_f.h1_error),
                      rtol=1e-8)


@pytest.mark.slow
def test_uniform_segmented_solve_matches():
    """The segmented path (_mg_setup_jit/_cg_seg_jit) with the uniform
    decomposition matches the full-path solution."""
    cgp = _cgp(1e-10)
    r_f = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="full")
    r_u = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      cg_segment=25, fitted="uniform")
    assert int(r_u.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r_u.local - r_f.local))) < 1e-8


@pytest.mark.slow
def test_uniform64_matches_chunked_f64():
    """The f64 uniform-mode assembly (exact f64 unit blocks + chunked
    f64 rhs + f64 splices) equals the accurate-mode chunked per-cell
    f64 assembly to roundoff."""
    from proton_tpu.core.geometry import cell_geometry
    from proton_tpu.core.ops import HHODegreeInfo
    from proton_tpu.cut import methods as cut_methods

    N, k = 16, 1
    problem = fs.default_problem()
    hdi = HHODegreeInfo(k + 1, k)
    eta = fs.nitsche_eta(k)
    mesh, cutdata, cut_ids = fs.classify_level(N, problem, 4, False,
                                               classify_f32=True)
    geom = cell_geometry(mesh)
    batch = cut_methods.make_cut_batch(mesh, geom, cutdata, cut_ids)
    dist = np.nonzero(np.asarray(cutdata.distorted))[0]
    unit_host = fs._unit_cell_host(hdi, 1.0 / N)
    unit = tuple(jnp.asarray(a, jnp.float64) for a in unit_host)
    got = fs._assemble_level_uniform64(
        mesh, cutdata.cell_loc, batch, jnp.asarray(dist, jnp.int32),
        unit, hdi, problem, eta, with_rhs=True)
    ref = fs._assemble_level_cl_f64(mesh, geom, cutdata.cell_loc, batch,
                                    hdi, problem, eta, with_rhs=True)
    assert got.S.dtype == jnp.float64
    for a, b in zip(got, ref):
        scale = float(jnp.max(jnp.abs(b))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) < 1e-11 * scale


def test_lean_uniform_assembly_matches_dense():
    """The lean uniform system (UniformCondCL: dS + moments + irregular
    blocks) carries exactly the dense uniform build's content."""
    from proton_tpu.core.ops import HHODegreeInfo
    from proton_tpu.methods import cells_last

    N, k = 24, 1
    hdi = HHODegreeInfo(k + 1, k)
    problem, eta = fs.default_problem(), fs.nitsche_eta(k)
    a = fs.build_level(N, hdi, problem, eta, 4, mixed=False,
                       use_pallas=False, with_rhs=True, fitted="uniform")
    b = fs.build_level(N, hdi, problem, eta, 4, mixed=False,
                       use_pallas=False, with_rhs=True, fitted="lean")
    assert isinstance(b.cond, cells_last.UniformCondCL)
    assert np.array_equal(a.irr_ids, b.irr_ids)
    irr = np.asarray(a.irr_ids)
    Su = a.S_u.reshape(-1, 1)
    for da, db, name in (
            (np.asarray(a.cond.S)[:, irr] - Su, b.cond.dS, "dS"),
            (a.cond.bF, b.cond.bF, "bF"),
            (np.asarray(a.cond.X)[:, irr], b.cond.X_i, "X_i"),
            (np.asarray(a.cond.y)[:, irr], b.cond.y_i, "y_i")):
        da, db = np.asarray(da), np.asarray(db)
        scale = np.abs(da).max() + 1e-30
        assert np.abs(da - db).max() < 1e-12 * scale, name


def test_lean_solve_matches_generic_fast():
    """Fast UNMARKED end-to-end accuracy gate on the flagship (lean +
    MG) solve path: `pytest -m 'not slow'` must still cover it (the
    fuller dense/segment equivalences below are @slow)."""
    r_ref = fictdom.run_fictdom(16, 1)
    r_l = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False,
                                      cg_params=_cgp(1e-10),
                                      fitted="lean")
    assert int(r_l.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r_l.local - r_ref.local))) < 1e-8
    assert np.isclose(float(r_l.h1_error), float(r_ref.h1_error),
                      rtol=1e-6)


@pytest.mark.slow
def test_lean_solve_matches_dense():
    """End-to-end lean solve (uniform rhs fold, dS-only MG setup,
    patch-from-deltas, lean recovery) == the dense uniform solve."""
    cgp = _cgp(1e-10)
    r_d = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="uniform")
    r_l = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="lean")
    assert int(r_l.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r_l.local - r_d.local))) < 1e-9
    assert np.isclose(float(r_l.h1_error), float(r_d.h1_error),
                      rtol=1e-9)
    # and through the segmented path (mg_setup_jit / cg_seg_jit)
    r_s = fs.solve_fictdom_structured(16, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      cg_segment=25, fitted="lean")
    assert int(r_s.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r_s.local - r_d.local))) < 1e-8


@pytest.mark.slow
def test_lean_mixed_matches_dense_mixed():
    """Lean + mixed precision (f64 cut splice) == dense uniform mixed,
    and BOTH match the pure-f64 discretization error: with the X/y
    back-substitution stored from the f64 condensation, recovery adds
    no sliver-Cholesky noise (k=2 at 16^2 measured 4.3e-3 with the old
    f32 recovery vs 1.809e-4 truth). The two paths' regular cells use
    different-but-equivalent f32 formulas (in-jit cho_solve vs host-f64
    constants), so they agree to f32 rounding, not bit-exactly."""
    cgp = _cgp(1e-9)
    r_d = fs.solve_fictdom_structured(16, 2, mixed=True,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="uniform")
    r_l = fs.solve_fictdom_structured(16, 2, mixed=True,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="lean")
    r_64 = fs.solve_fictdom_structured(16, 2, mixed=False,
                                       use_pallas=False, cg_params=cgp,
                                       fitted="lean")
    assert int(r_l.exit_reason) == cg.CONVERGED
    assert np.isclose(float(r_l.h1_error), float(r_d.h1_error),
                      rtol=1e-4)
    assert np.isclose(float(r_l.h1_error), float(r_64.h1_error),
                      rtol=2e-2)
    assert np.isclose(float(r_d.h1_error), float(r_64.h1_error),
                      rtol=2e-2)


@pytest.mark.slow
def test_patch_colors_multiplicative():
    """patch_colors=2 (checkerboard multiplicative patch sweeps) solves
    the same system to the same solution, in no more iterations than
    the additive smoother, on both the uniform and lean paths."""
    cgp = _cgp(1e-10)
    r_a = fs.solve_fictdom_structured(32, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="uniform")
    r_m = fs.solve_fictdom_structured(32, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      fitted="uniform", patch_colors=2)
    assert int(r_m.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r_m.local - r_a.local))) < 1e-8
    # at this tiny N both converge in ~15 iterations; the multiplicative
    # win shows at scale (scripts/mg_scale_exp.py) — here just guard
    # against a broken smoother
    assert int(r_m.iterations) <= int(r_a.iterations) + 3
    # lean + segmented path (mg_setup_cl / mg_precondition_cl wiring)
    r_s = fs.solve_fictdom_structured(32, 1, mixed=False,
                                      use_pallas=False, cg_params=cgp,
                                      cg_segment=25, fitted="lean",
                                      patch_colors=2)
    assert int(r_s.exit_reason) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(r_s.local - r_a.local))) < 1e-8


def test_setup_cache_roundtrip(tmp_path, monkeypatch):
    """The on-disk setup cache (PROTON_SETUP_CACHE=force on CPU)
    reproduces the live classification bit-exactly: points, cell_loc,
    cut/distorted ids and every cut-batch leaf."""
    from proton_tpu.core.ops import HHODegreeInfo

    hdi = HHODegreeInfo(2, 1)
    problem = fs.default_problem()
    assert problem.cache_key is not None
    monkeypatch.setenv("PROTON_SETUP_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("PROTON_SETUP_CACHE", "0")
    live = fs._classify_host(16, hdi, problem, 4, False)
    monkeypatch.setenv("PROTON_SETUP_CACHE", "force")
    cold = fs._classify_host(16, hdi, problem, 4, False)  # writes
    assert len(list(tmp_path.iterdir())) == 1
    warm = fs._classify_host(16, hdi, problem, 4, False)  # reads
    assert warm[1] is None  # cutdata not reconstructed on a hit

    def same(a, b, name):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and a.dtype == b.dtype, name
        assert (a == b).all(), name

    for got in (cold, warm):
        same(live[0].points, got[0].points, "points")
        same(live[0].cell_ptids, got[0].cell_ptids, "cell_ptids")
        same(live[0].face_bnd, got[0].face_bnd, "face_bnd")
        same(live[3], got[3], "cell_loc")
        same(live[2], got[2], "cut_ids")
        same(live[5], got[5], "dist_ids")
        for f in live[4]._fields:
            if f == "geom":
                for g in live[4].geom._fields:
                    same(getattr(live[4].geom, g), getattr(got[4].geom, g),
                         f"geom.{g}")
            else:
                same(getattr(live[4], f), getattr(got[4], f), f)


def test_build_coarse_level_cache_roundtrip(tmp_path, monkeypatch):
    """build_coarse_level's disk cache reproduces the live lean build
    exactly (dS, S_u, irr_ids, cut_ids) on a cold + warm pair."""
    from proton_tpu.core.ops import HHODegreeInfo
    from proton_tpu.methods import cells_last

    monkeypatch.setenv("PROTON_SETUP_CACHE", "force")
    monkeypatch.setenv("PROTON_SETUP_CACHE_DIR", str(tmp_path))
    n, k = 16, 1
    hdi = HHODegreeInfo(k + 1, k)
    problem, eta = fs.default_problem(), fs.nitsche_eta(k)
    cold = fs.build_coarse_level(n, hdi, problem, eta, 4, mixed=False)
    assert any(f.name.startswith("mglevel_") for f in tmp_path.iterdir())
    warm = fs.build_coarse_level(n, hdi, problem, eta, 4, mixed=False)
    assert warm.mesh is None          # the cache-hit light LevelData
    ref = fs.build_level(n, hdi, problem, eta, 4, mixed=False,
                         use_pallas=False, with_rhs=False, fitted="lean")
    for lev in (cold, warm):
        assert isinstance(lev.cond, cells_last.UniformCondCL)
        assert np.array_equal(np.asarray(lev.cut_ids),
                              np.asarray(ref.cut_ids))
        assert np.array_equal(np.asarray(lev.irr_ids),
                              np.asarray(ref.irr_ids))
        assert np.allclose(np.asarray(lev.S_u), np.asarray(ref.S_u),
                           rtol=0, atol=0)
        assert np.allclose(np.asarray(lev.cond.dS),
                           np.asarray(ref.cond.dS), rtol=0, atol=1e-7 *
                           (abs(np.asarray(ref.cond.dS)).max() + 1e-30))


@pytest.mark.slow
def test_solve_segments_pre_matches_inline():
    """solve_segments with a precomputed (mgdata, rhs, gF) triple ==
    letting it build its own setup (the bench mg_setup/solve split)."""
    from proton_tpu.core.geometry import cell_geometry
    from proton_tpu.core.ops import HHODegreeInfo
    from proton_tpu.methods import assembly

    N, k = 16, 1
    cgp = _cgp(1e-10)
    r_ref = fs.solve_fictdom_structured(N, k, mixed=False,
                                        use_pallas=False, cg_params=cgp,
                                        cg_segment=25, fitted="lean")
    hdi = HHODegreeInfo(k + 1, k)
    problem, eta = fs.default_problem(), fs.nitsche_eta(k)
    fine = fs.build_level(N, hdi, problem, eta, 4, mixed=False,
                          use_pallas=False, with_rhs=True, fitted="lean")
    levels = {N: fine}
    S_levels, cut_levels = {N: fine.cond.dS}, {N: fine.cut_ids}
    for n in fs._mg_sizes(N, 8)[1:]:
        lev = fs.build_coarse_level(n, hdi, problem, eta, 4, mixed=False)
        levels[n] = lev
        S_levels[n] = lev.cond.dS
        cut_levels[n] = lev.cut_ids
    sizes = tuple(sorted(S_levels))
    S_list = tuple(S_levels[n] for n in sizes)
    kw = dict(sizes=sizes, hdi=hdi, problem=problem, precond="mg",
              cut_levels=tuple(
                  (n, tuple(int(i) for i in
                            fs.expand_ring(cut_levels[n], n, 1)))
                  for n in sizes),
              mg_coarsest=8, n_smooth=1, mg_f32=False,
              mg_smoother="chebyshev", cheb_degree=4, patch_colors=1,
              uniform_levels=fs.uniform_static(levels), cg_f64=False)
    assert fs.segments_can_reuse(kw)
    stat = fs.segments_static(kw)
    dofmap = assembly.build_dofmap_structured(N, hdi)
    mgdata = fs._mg_setup_jit(S_list, **stat)
    rhs, gF_cl = fs._rhs_jit(fine.mesh, dofmap, fine.cond, sizes=sizes,
                             hdi=hdi, problem=problem,
                             uniform_levels=stat["uniform_levels"])
    local, iters, ex, rel = fs.solve_segments(
        fine.mesh, dofmap, fine.cond, S_list, cgp, 25, kw,
        pre=(mgdata, rhs, gF_cl))
    assert int(ex) == cg.CONVERGED
    assert float(jnp.max(jnp.abs(local - r_ref.local))) < 1e-8
