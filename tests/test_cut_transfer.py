"""Cut-aware MG transfer corrections (multigrid corr= path +
fictdom_structured._level_recdev): factorization identity, exact
adjointness of the corrected prolongation/restriction pair, and
iteration-count sanity of the corrected V-cycle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proton_tpu.core import bases
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.methods import cells_last as cl
from proton_tpu.methods.structured import make_structured_system
from proton_tpu.solvers import multigrid


@pytest.mark.parametrize("k", [1, 2])
def test_transfer_factorization_matches(k):
    """M_slot == P_slot @ recmap_u — the P/recmap factorization
    reproduces the original fused transfer stencils."""
    hdi = HHODegreeInfo(k + 1, k)
    h = 1.0 / 8
    MH, MV = multigrid._transfer_slot_matrices(hdi, h, jnp.float64)
    PH, PV = multigrid._transfer_face_projectors(hdi, h)
    rec = multigrid._unit_recmap(hdi, h)
    assert np.allclose(MH, jnp.einsum("rcfb,bn->rcfn", PH, rec),
                       atol=1e-12)
    assert np.allclose(MV, jnp.einsum("rcfb,bn->rcfn", PV, rec),
                       atol=1e-12)


def _rand_grid(key, sys, fbs):
    k1, k2 = jax.random.split(key)
    return cl.GridVecCL(
        jax.random.normal(k1, (fbs, sys.Ny + 1, sys.Nx)),
        jax.random.normal(k2, (fbs, sys.Ny, sys.Nx + 1)))


@pytest.mark.parametrize("k", [1])
def test_corrected_transfer_pair_is_adjoint(k):
    """<P x_c, y_f> == <x_c, R y_f> with a random cut-aware correction
    (the corrected restriction must stay the EXACT transpose of the
    corrected prolongation or the V-cycle loses symmetry as a CG
    preconditioner)."""
    hdi = HHODegreeInfo(k + 1, k)
    fbs = bases.face_basis_size(k)
    nc, nf = 8, 16
    sys_c = make_structured_system(nc, nc, fbs)
    sys_f = make_structured_system(nf, nf, fbs)
    rbs = bases.cell_basis_size(k + 1)
    nfd = 4 * fbs
    ids = np.array([9, 10, 18, 27, 36, 37], dtype=np.int64)
    key = jax.random.PRNGKey(3)
    kd, kx, ky = jax.random.split(key, 3)
    drec = 0.3 * jax.random.normal(kd, (rbs * nfd, len(ids)))
    PH, PV = multigrid._transfer_face_projectors(hdi, 1.0 / nc)
    corr = (ids, drec, PH, PV)
    prol = multigrid.make_reconstruction_prolongation_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float64, corr=corr)
    restrict = multigrid.make_reconstruction_restriction_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float64, corr=corr)
    xc = _rand_grid(kx, sys_c, fbs)
    yf = _rand_grid(ky, sys_f, fbs)
    px = prol(xc)
    ry = restrict(yf)
    lhs = float(jnp.vdot(px.H, yf.H) + jnp.vdot(px.V, yf.V))
    rhs = float(jnp.vdot(xc.H, ry.H) + jnp.vdot(xc.V, ry.V))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_zero_deviation_correction_is_identity():
    """corr with drec == 0 must reproduce the uniform transfers."""
    k = 1
    hdi = HHODegreeInfo(k + 1, k)
    fbs = bases.face_basis_size(k)
    nc, nf = 8, 16
    sys_c = make_structured_system(nc, nc, fbs)
    sys_f = make_structured_system(nf, nf, fbs)
    rbs = bases.cell_basis_size(k + 1)
    ids = np.array([12, 21], dtype=np.int64)
    drec = jnp.zeros((rbs * 4 * fbs, len(ids)))
    PH, PV = multigrid._transfer_face_projectors(hdi, 1.0 / nc)
    p0 = multigrid.make_reconstruction_prolongation_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float64)
    p1 = multigrid.make_reconstruction_prolongation_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float64,
        corr=(ids, drec, PH, PV))
    xc = _rand_grid(jax.random.PRNGKey(0), sys_c, fbs)
    a, b = p0(xc), p1(xc)
    assert np.allclose(a.H, b.H, atol=1e-14)
    assert np.allclose(a.V, b.V, atol=1e-14)


def test_galerkin_engine_matches_dense_rap():
    """The pair-op Galerkin coarsening engine must reproduce the dense
    R A_f P exactly (free block) on the cut problem at 32 -> 16,
    including the domain-boundary masking and phantom-pair
    cancellations."""
    N, k = 32, 1
    nc = N // 2
    hdi = HHODegreeInfo(k + 1, k)
    problem = fs.default_problem()
    eta = fs.nitsche_eta(k)
    fine = fs.build_level(N, hdi, problem, eta, 4, False, False, True,
                          fitted="lean")
    coar = fs.build_coarse_level(nc, hdi, problem, eta, 4, mixed=False)
    fbs = bases.face_basis_size(k)
    sys_f = make_structured_system(N, N, fbs)
    sys_c = make_structured_system(nc, nc, fbs)
    uni = fs._uniform_unpack(fs.uniform_static({N: fine, nc: coar}))
    S_uf, irrf = uni[N]
    A_f = cl.make_uniform_operator_cl(sys_f, S_uf.astype(jnp.float64),
                                      irrf, fine.cond.dS)
    gal = fs.band_galerkin_levels({N: fine, nc: coar}, hdi, problem,
                                  eta, dtype=jnp.float64)
    g = gal[nc]
    A_c = multigrid.make_galerkin_operator_cl(sys_c, g.kernel, g.rows,
                                              g.cols, g.blocks)
    prol = multigrid.make_reconstruction_prolongation_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float64)
    restr = multigrid.make_reconstruction_restriction_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float64)
    hs, vs = (fbs, nc + 1, nc), (fbs, nc, nc + 1)
    nH = int(np.prod(hs))
    ntot = nH + int(np.prod(vs))

    def unflat(v):
        return cl.GridVecCL(v[:nH].reshape(hs), v[nH:].reshape(vs))

    def flat(gd):
        return jnp.concatenate([gd.H.reshape(-1), gd.V.reshape(-1)])

    f1 = jax.jit(lambda v: flat(restr(A_f(prol(unflat(v))))))
    f2 = jax.jit(lambda v: flat(A_c(unflat(v))))
    eye = np.eye(ntot)
    RAP = np.stack([np.asarray(f1(jnp.asarray(eye[:, j])))
                    for j in range(ntot)], axis=1)
    ENG = np.stack([np.asarray(f2(jnp.asarray(eye[:, j])))
                    for j in range(ntot)], axis=1)
    frozen = (np.abs(np.diag(ENG) - 1) < 1e-13) & \
             ((np.abs(ENG) > 1e-13).sum(0) == 1)
    free = ~frozen
    D = (ENG - RAP)[np.ix_(free, free)]
    assert np.abs(D).max() < 1e-9 * max(1.0, np.abs(RAP).max())


def test_galerkin_patch_blocks_are_exact_restrictions():
    """galerkin_patch_setup's blocks must equal the dense Galerkin
    operator restricted to each patch cell's 4 faces (interior patch
    cells; the approximate assembly missed the neighbor-pair couplings
    and diverged at 256^2)."""
    N, k = 32, 1
    nc = 16
    hdi = HHODegreeInfo(k + 1, k)
    problem = fs.default_problem()
    eta = fs.nitsche_eta(k)
    fine = fs.build_level(N, hdi, problem, eta, 4, False, False, True,
                          fitted="lean")
    coar = fs.build_coarse_level(nc, hdi, problem, eta, 4, mixed=False)
    fbs = bases.face_basis_size(k)
    nfd = 4 * fbs
    sys_c = make_structured_system(nc, nc, fbs)
    gal = fs.band_galerkin_levels({N: fine, nc: coar}, hdi, problem,
                                  eta, dtype=jnp.float64)
    g = gal[nc]
    A_c = multigrid.make_galerkin_operator_cl(sys_c, g.kernel, g.rows,
                                              g.cols, g.blocks)
    hs, vs = (fbs, nc + 1, nc), (fbs, nc, nc + 1)
    nH = int(np.prod(hs))
    ntot = nH + int(np.prod(vs))

    def unflat(v):
        return cl.GridVecCL(v[:nH].reshape(hs), v[nH:].reshape(vs))

    def flat(gd):
        return jnp.concatenate([gd.H.reshape(-1), gd.V.reshape(-1)])

    f = jax.jit(lambda v: flat(A_c(unflat(v))))
    eye = np.eye(ntot)
    Ad = np.stack([np.asarray(f(jnp.asarray(eye[:, j])))
                   for j in range(ntot)], axis=1)
    pids = fs.expand_ring(coar.cut_ids, nc, 1)
    Binv, _, _ = multigrid.galerkin_patch_setup(sys_c, g, pids,
                                                jnp.float64)
    B = np.linalg.inv(np.asarray(Binv))

    def face_dof(kind, m, j, i):
        if kind == "H":
            return m * (nc + 1) * nc + j * nc + i
        return nH + m * nc * (nc + 1) + j * (nc + 1) + i

    err = 0.0
    for c, pid in enumerate(np.asarray(pids)):
        jj, ii = pid // nc, pid % nc
        dofs = []
        for kind, j, i in [("H", jj, ii), ("V", jj, ii + 1),
                           ("H", jj + 1, ii), ("V", jj, ii)]:
            for m in range(fbs):
                dofs.append(face_dof(kind, m, j, i))
        T = Ad[np.ix_(np.array(dofs), np.array(dofs))]
        err = max(err, np.abs(B[c] - T).max())
    assert err < 1e-9 * max(1.0, np.abs(B).max())


@pytest.mark.slow
def test_transfer_modes_solve_correctly():
    """Every transfer mode must converge to the same solution (h1
    agreement at the CG-tolerance level); 'smoothed' must not take more
    iterations than 'uniform' (measured on CPU f64 at 64^2: uniform 17,
    cut 44 — the raw Nitsche harmonic extension is a wild extrapolator
    on slivers, which is why 'cut' only gets a correctness gate)."""
    N, k = 64, 1
    r = {m: fs.solve_fictdom_structured(N, k, mg_coarsest=8,
                                        mg_transfer=m)
         for m in ("uniform", "smoothed", "cut")}
    h1_uni = float(r["uniform"].h1_error)
    for m, res in r.items():
        assert int(res.exit_reason) == 0, m
        assert np.isfinite(float(res.h1_error)), m
        assert abs(float(res.h1_error) - h1_uni) < 1e-2 * h1_uni, m
    assert int(r["smoothed"].iterations) <= int(r["uniform"].iterations)
