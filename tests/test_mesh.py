"""Mesh construction + geometry vs. closed forms (reference:
basic_mesh.hpp structured generator, basic_geom.hpp queries)."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core import geometry


def test_quad_mesh_counts():
    m = pt.make_quad_mesh(Nx=4, Ny=3)
    assert m.num_points == 5 * 4
    assert m.num_cells == 12
    # structured grid faces: Nx*(Ny+1) horizontal + (Nx+1)*Ny vertical
    assert m.num_faces == 4 * 4 + 5 * 3
    nb = int((np.asarray(m.face_bnd) == pt.BND_DIRICHLET).sum())
    assert nb == 2 * (4 + 3)


def test_faces_sorted_and_unique():
    m = pt.make_quad_mesh(Nx=5, Ny=5)
    fp = np.asarray(m.face_ptids)
    assert (fp[:, 0] < fp[:, 1]).all()
    order = np.lexsort((fp[:, 1], fp[:, 0]))
    assert (order == np.arange(len(fp))).all()
    assert len(np.unique(fp, axis=0)) == len(fp)


def test_cell_faces_consistent():
    m = pt.make_quad_mesh(Nx=3, Ny=3)
    cp = np.asarray(m.cell_ptids)
    cf = np.asarray(m.cell_faces)
    fp = np.asarray(m.face_ptids)
    for c in range(m.num_cells):
        for k in range(4):
            a, b = cp[c, k], cp[c, (k + 1) % 4]
            assert set(fp[cf[c, k]]) == {a, b}


def test_geometry_closed_forms():
    m = pt.make_quad_mesh(Nx=4, Ny=4)
    g = pt.cell_geometry(m)
    h = 0.25
    assert np.allclose(np.asarray(g.meas), h * h)
    assert np.allclose(np.asarray(g.diam), h * np.sqrt(2.0))
    # first cell centered at (h/2, h/2)
    assert np.allclose(np.asarray(g.bar)[0], [h / 2, h / 2])
    # outward normals in cell-local CCW order: bottom, right, top, left
    expect = np.array([[0, -1], [1, 0], [0, 1], [-1, 0]], dtype=float)
    assert np.allclose(np.asarray(g.normals)[0], expect)
    # total area
    assert np.isclose(float(jnp.sum(g.meas)), 1.0)


def test_poly_mesh_matches_quad_geometry():
    mq = pt.make_quad_mesh(Nx=3, Ny=3)
    mp = pt.make_poly_mesh(Nx=3, Ny=3)
    gq, gp = pt.cell_geometry(mq), pt.cell_geometry(mp)
    assert np.allclose(np.asarray(gq.bar), np.asarray(gp.bar))
    assert np.allclose(np.asarray(gq.meas), np.asarray(gp.meas))


def test_poly_loader(tmp_path):
    # two triangles + padding exercise (unit square split along diagonal);
    # text format of basic_mesh.hpp:405-475
    content = """4
0.0 0.0
1.0 0.0
1.0 1.0
0.0 1.0
2
3 1 0 1 2
3 1 0 2 3
4
1 0 1
1 1 2
1 2 3
1 0 3
"""
    fn = tmp_path / "tri.txt"
    fn.write_text(content)
    m = pt.load_poly_mesh(str(fn))
    assert m.num_cells == 2
    assert m.num_faces == 5
    g = pt.cell_geometry(m)
    assert np.allclose(np.asarray(g.meas), [0.5, 0.5])
    assert np.isclose(float(g.diam[0]), np.sqrt(2.0))
    nb = int((np.asarray(m.face_bnd) == pt.BND_DIRICHLET).sum())
    assert nb == 4


@pytest.mark.parametrize("name", ["mesh1.txt", "mesh2.txt", "mesh-dn.txt"])
def test_loader_on_reference_meshes(name):
    """Load the reference's shipped polygonal meshes (data files,
    apps/polymesh/)."""
    import os
    path = f"/root/reference/apps/polymesh/{name}"
    if not os.path.exists(path):
        pytest.skip("reference mesh data not available")
    m = pt.load_poly_mesh(path)
    assert m.num_cells > 0 and m.num_faces > 0
    g = pt.cell_geometry(m)
    meas = np.asarray(g.meas)
    assert (meas > 0).all()
    assert int((np.asarray(m.face_bnd) == pt.BND_DIRICHLET).sum()) > 0
    # every cell's faces index into the face table consistently
    cf = np.asarray(m.cell_faces)
    assert cf.min() >= 0 and cf.max() < m.num_faces


def test_with_points_moves_geometry():
    m = pt.make_quad_mesh(Nx=2, Ny=2)
    m2 = m.with_points(m.points * 2.0)
    g2 = pt.cell_geometry(m2)
    assert np.allclose(np.asarray(g2.meas), 1.0)


def test_structured_topology_matches_sort_based_builder():
    """The closed-form face numbering of the generated grids is
    byte-identical to the sort+dedup builder (the reference semantics,
    basic_mesh.hpp:289-291), including non-square and shifted boxes."""
    import numpy as np
    from proton_tpu.core import mesh as M

    for Nx, Ny in [(1, 1), (4, 4), (5, 3), (16, 16), (33, 7)]:
        p = M.MeshInitParams(Nx=Nx, Ny=Ny, min_x=-0.2, max_x=1.3,
                             min_y=0.1, max_y=0.9)
        new = M._structured_topology(p, "poly")
        pts, cp, raw_bnd = M._structured_arrays(p)
        old = M._build_topology(pts, cp, np.full(len(cp), 4, np.int64),
                                raw_bnd, "poly")
        for f in ("points", "cell_ptids", "cell_npts", "cell_faces",
                  "face_ptids", "face_bnd"):
            assert np.array_equal(np.asarray(getattr(new, f)),
                                  np.asarray(getattr(old, f))), (Nx, Ny, f)


def test_structured_topology_device_matches_host():
    """The device-side iota topology equals the host closed-form builder
    array-for-array."""
    import numpy as np
    from proton_tpu.core.mesh import (make_poly_mesh,
                                      structured_topology_device)

    for N in (1, 3, 8):
        m = make_poly_mesh(Nx=N, Ny=N)
        cp, cn, cf, fp, fb = structured_topology_device(N, N)
        assert np.array_equal(np.asarray(cp), np.asarray(m.cell_ptids))
        assert np.array_equal(np.asarray(cn), np.asarray(m.cell_npts))
        assert np.array_equal(np.asarray(cf), np.asarray(m.cell_faces))
        assert np.array_equal(np.asarray(fp), np.asarray(m.face_ptids))
        assert np.array_equal(np.asarray(fb), np.asarray(m.face_bnd))
