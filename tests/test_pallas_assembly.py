"""Fused Pallas local-assembly kernel vs the XLA reference path
(interpret mode on the CPU backend; the TPU-compiled kernel is exercised
by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.methods import pallas_assembly, poisson


@pytest.mark.parametrize("k", [0, 1])
def test_fused_matches_xla(k):
    mesh = pt.make_poly_mesh(Nx=8, Ny=8)
    hdi = HHODegreeInfo(k + 1, k)
    geom = cell_geometry(mesh)
    _, lc_ref = poisson.assemble_local(mesh, geom, hdi, "naive")
    lc_pal = pallas_assembly.fitted_local_operator(mesh, geom, hdi,
                                                   interpret=True)
    scale = float(jnp.max(jnp.abs(lc_ref)))
    assert float(jnp.max(jnp.abs(lc_ref - lc_pal))) / scale < 1e-12


def test_fused_equal_order_and_padding():
    """Non-BLK-multiple cell count (padding path) + equal-order hdi."""
    mesh = pt.make_quad_mesh(Nx=5, Ny=3)   # 15 cells << BLK
    hdi = HHODegreeInfo(1, 1)
    geom = cell_geometry(mesh)
    _, lc_ref = poisson.assemble_local(mesh, geom, hdi, "naive")
    lc_pal = pallas_assembly.fitted_local_operator(mesh, geom, hdi,
                                                   interpret=True)
    assert np.allclose(np.asarray(lc_pal), np.asarray(lc_ref), atol=1e-11)


def test_fused_rejects_general_polygons():
    import dataclasses
    mesh = dataclasses.replace(pt.make_poly_mesh(Nx=3, Ny=3),
                               all_quads=False)
    geom = cell_geometry(mesh)
    with pytest.raises(ValueError):
        pallas_assembly.fitted_local_operator(mesh, geom,
                                              HHODegreeInfo(1, 1))
