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
