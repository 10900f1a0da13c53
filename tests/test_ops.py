"""Mass/RHS/projection operator checks (reference utils.hpp:62-235)."""

import numpy as np
import jax.numpy as jnp
import pytest
import warnings

import proton_tpu as pt
from proton_tpu.core import bases, ops, quadrature


def test_degree_info_rules():
    """hho_degree_info validity rules (utils.hpp:75-95)."""
    hdi = pt.HHODegreeInfo(2, 1)
    assert (hdi.cell_degree, hdi.face_degree,
            hdi.reconstruction_degree) == (2, 1, 2)
    hdi = pt.HHODegreeInfo(0, 1)
    assert hdi.cell_degree == 0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        hdi = pt.HHODegreeInfo(3, 1)  # invalid -> equal order
    assert (hdi.cell_degree, hdi.face_degree) == (1, 1)
    hdi = pt.HHODegreeInfo(1, 0)
    assert hdi.cell_degree == 1
    assert pt.HHODegreeInfo.equal_order(2).reconstruction_degree == 3


def test_mass_matrix_spd_and_constant():
    m = pt.make_quad_mesh(Nx=3, Ny=3)
    g = pt.cell_geometry(m)
    M = np.asarray(ops.cell_mass_matrices(m, g, 2))
    assert np.allclose(M, np.swapaxes(M, 1, 2))
    for Mc in M:
        assert np.linalg.eigvalsh(Mc).min() > 0
    # (1,1)_T = cell area
    assert np.allclose(M[:, 0, 0], np.asarray(g.meas))


@pytest.mark.parametrize("kind", ["quad", "poly"])
def test_projection_reproduces_polynomials(kind):
    mk = pt.make_quad_mesh if kind == "quad" else pt.make_poly_mesh
    m = mk(Nx=3, Ny=3)
    g = pt.cell_geometry(m)
    hdi = pt.HHODegreeInfo(2, 2)

    def f(p):
        return 1.0 + 2 * p[..., 0] - p[..., 1] + 0.5 * p[..., 0] * p[..., 1]

    proj = ops.project_function(m, g, hdi, f)
    cbs = bases.cell_basis_size(2)
    # evaluate the cell part at random points inside each cell: must equal f
    rule = quadrature.cell_rule(m, g, 3)
    phi = bases.eval_cell_basis(rule.pts, g.bar[:, None, :],
                                g.diam[:, None], 2)
    vals = jnp.einsum("cqi,ci->cq", phi, proj[:, :cbs])
    assert np.allclose(np.asarray(vals), np.asarray(f(rule.pts)), atol=1e-12)

    # face parts: evaluate on face quadrature points
    fbar = jnp.mean(g.face_pts, axis=2)
    base = fbar - g.face_pts[:, :, 0, :]
    fh = jnp.linalg.norm(g.face_pts[:, :, 1] - g.face_pts[:, :, 0], axis=-1)
    frule = quadrature.face_rule(g.face_pts[..., 0, :],
                                 g.face_pts[..., 1, :], 3)
    fphi = bases.eval_face_basis(frule.pts, fbar[..., None, :],
                                 base[..., None, :], fh[..., None], 2)
    fbs = bases.face_basis_size(2)
    fdofs = proj[:, cbs:].reshape(m.num_cells, m.max_pts, fbs)
    fvals = jnp.einsum("cfqi,cfi->cfq", fphi, fdofs)
    assert np.allclose(np.asarray(fvals), np.asarray(f(frule.pts)),
                       atol=1e-12)


def test_condition_number():
    A = jnp.diag(jnp.array([4.0, 2.0, 1.0]))
    assert np.isclose(float(ops.condition_number(A)), 4.0)
