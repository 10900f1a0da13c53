"""Batched geometry families (cut/batched.py): the vmapped fixed-capacity
pipeline matches the unbatched fictdom solve geometry-by-geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from proton_tpu.cut import batched, fictdom_structured as fs
from proton_tpu.cut.classify import LOC_CUT, cut_preprocess
from proton_tpu.core.mesh import make_poly_mesh
from proton_tpu.solvers import cg


def test_padded_cut_ids():
    loc = jnp.asarray(np.array([0, LOC_CUT, 0, LOC_CUT, LOC_CUT],
                               dtype=np.int8))
    ids, valid, n_cut, n_over = batched.padded_cut_ids(loc, 4)
    assert ids.tolist() == [1, 3, 4, 5]      # sentinel C=5 in the tail
    assert valid.tolist() == [True, True, True, False]
    assert int(n_cut) == 3 and int(n_over) == 0
    ids2, valid2, n2, over2 = batched.padded_cut_ids(loc, 2)
    assert ids2.tolist() == [1, 3]
    assert int(over2) == 1


def test_family_matches_unbatched():
    """Each geometry of a 3-circle family reproduces the unbatched
    structured fictdom solve (same discretization, same Jacobi-PCG)."""
    N, k = 16, 1
    radii = np.array([0.30, 0.35, 0.41])
    centers = np.array([[0.5, 0.5], [0.5, 0.5], [0.48, 0.52]])
    cgp = cg.CGParams(convergence_threshold=1e-10, divergence_threshold=1e8,
                      max_iter=20000, apply_preconditioner=True)
    fam = batched.solve_fictdom_family(N, k, radii, centers, cg_params=cgp)
    assert np.all(np.asarray(fam.exit_reason) == cg.CONVERGED)
    assert np.all(np.asarray(fam.n_cut_overflow) == 0)
    assert np.all(np.asarray(fam.n_bad_cuts) == 0)

    for b in range(3):
        problem = fs.default_problem(float(radii[b]),
                                     tuple(map(float, centers[b])))
        r = fs.solve_fictdom_structured(N, k, problem, mixed=False,
                                        use_pallas=False, cg_params=cgp,
                                        precond="jacobi")
        # same number of cut cells as the host np.nonzero path
        mesh = make_poly_mesh(Nx=N, Ny=N)
        _, cutdata = cut_preprocess(mesh, problem.ls, levels=4)
        assert int(fam.n_cut[b]) == int(
            np.sum(np.asarray(cutdata.cell_loc) == LOC_CUT))
        assert np.isclose(float(fam.h1_error[b]), float(r.h1_error),
                          rtol=1e-8), (b, float(fam.h1_error[b]),
                                       float(r.h1_error))


def test_family_geom_chunked_matches():
    """lax.map tiling over the geometry batch (geom_chunk) returns the
    same results as the full vmap, including the uneven final tile."""
    N, k = 12, 1
    radii = np.array([0.30, 0.33, 0.36])
    centers = np.tile(np.array([[0.5, 0.5]]), (3, 1))
    cgp = cg.CGParams(convergence_threshold=1e-9, divergence_threshold=1e8,
                      max_iter=20000, apply_preconditioner=True)
    full = batched.solve_fictdom_family(N, k, radii, centers,
                                        cg_params=cgp)
    tiled = batched.solve_fictdom_family(N, k, radii, centers,
                                         geom_chunk=2, cg_params=cgp)
    assert np.allclose(np.asarray(full.h1_error),
                       np.asarray(tiled.h1_error), rtol=1e-12)
    assert np.array_equal(np.asarray(full.iterations),
                          np.asarray(tiled.iterations))


def test_family_beyond_circles():
    """Arbitrary level-set families: an ellipse family solves through
    the same vmapped pipeline; a degenerate ellipse (a == b == r)
    reproduces the circle-family row exactly."""
    import jax.numpy as jnp
    from proton_tpu.cut import batched

    N, k = 16, 1
    r = 0.33
    circ = batched.solve_fictdom_family(
        N, k, jnp.asarray([r]), jnp.asarray([[0.5, 0.5]]))
    ell = batched.solve_fictdom_family_params(
        N, k,
        (jnp.asarray([r, 0.30]), jnp.asarray([r, 0.22]),
         jnp.asarray([0.5, 0.48]), jnp.asarray([0.5, 0.52])),
        batched.ellipse_family)
    assert int(ell.n_cut_overflow[0]) == 0
    assert int(ell.n_cut_overflow[1]) == 0
    assert int(ell.exit_reason[1]) == 0        # true ellipse converges
    assert float(ell.h1_error[1]) < 0.05
    # degenerate ellipse == circle
    assert int(ell.n_cut[0]) == int(circ.n_cut[0])
    assert np.isclose(float(ell.h1_error[0]), float(circ.h1_error[0]),
                      rtol=1e-10)

    # non-convex family: 5-petaled flowers (autodiff level-set normals);
    # a zero-amplitude flower degenerates to the circle
    flw = batched.solve_fictdom_family_params(
        N, k,
        (jnp.asarray([r, 0.32]), jnp.asarray([0.0, 0.04]),
         jnp.asarray([0.5, 0.49]), jnp.asarray([0.5, 0.51])),
        batched.flower_family(5))
    assert int(flw.n_cut_overflow[0]) == 0
    assert int(flw.n_cut_overflow[1]) == 0
    assert int(flw.exit_reason[1]) == 0
    assert float(flw.h1_error[1]) < 0.05
    assert int(flw.n_cut[0]) == int(circ.n_cut[0])
    assert np.isclose(float(flw.h1_error[0]), float(circ.h1_error[0]),
                      rtol=1e-10)
