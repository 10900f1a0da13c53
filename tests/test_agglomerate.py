"""Cell agglomeration (completes the reference's dead-code merge path):
merged meshes have no badly-cut cells, conserve area, and the fictdom
solver converges on them."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.cut import agglomerate, classify, fictdom, levelset

LS = levelset.circle_level_set(0.35, 0.5, 0.5)


def test_agglomeration_removes_bad_cuts():
    mesh = pt.make_poly_mesh(Nx=16, Ny=16)
    m2, merged = agglomerate.agglomerate(mesh, LS)
    assert merged > 0
    assert m2.num_cells == mesh.num_cells - merged
    assert m2.max_pts > 4  # real polygons appeared

    # area conservation
    geom = cell_geometry(m2)
    assert np.isclose(float(jnp.sum(geom.meas)), 1.0, atol=1e-12)

    # every remaining cut cell has both side fractions above the threshold
    neg, pos, loc, *_ = agglomerate._side_measures(m2, LS)
    meas = np.asarray(geom.meas)
    cut = loc == classify.LOC_CUT
    frac = np.minimum(neg, pos)[cut] / meas[cut]
    assert frac.min() > 0.09


def test_fictdom_on_agglomerated_mesh():
    pi = np.pi
    rhs_fun = lambda p: 2 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
    sol_grad = lambda p: jnp.stack(
        [pi * jnp.cos(pi * p[..., 0]) * jnp.sin(pi * p[..., 1]),
         pi * jnp.sin(pi * p[..., 0]) * jnp.cos(pi * p[..., 1])], axis=-1)

    errs = []
    for N in (8, 16):
        mesh = pt.make_poly_mesh(Nx=N, Ny=N)
        m2, _ = agglomerate.agglomerate(mesh, LS)
        m3, cd = classify.cut_preprocess(m2, LS, levels=3,
                                         displacement=False)
        res = fictdom.solve_fictdom(m3, cd, LS, 1, rhs_fun, sol_fun,
                                    sol_grad)
        assert int(res.exit_reason) == 0
        errs.append(float(res.h1_error))
    assert np.log2(errs[0] / errs[1]) > 1.6  # ~k+1 = 2
