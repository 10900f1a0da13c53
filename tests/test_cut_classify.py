"""Cut classification pipeline: analytic integral checks (pi r^2 / 2 pi r,
the reference's own test_integration, cuthho_square.cpp:2081-2090) and
classification invariants (SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry, cell_points
from proton_tpu.cut import classify, levelset
from proton_tpu.cut import quadrature as cq

R = 0.35


def _setup(N, levels=4, agglomeration=False):
    m = pt.make_poly_mesh(Nx=N, Ny=N)
    ls = levelset.circle_level_set(R, 0.5, 0.5)
    m, cd = classify.cut_preprocess(m, ls, levels=levels,
                                    agglomeration=agglomeration)
    return m, ls, cd


def test_node_and_face_classification():
    m, ls, cd = _setup(8)
    # nodes: sign of phi
    nl = np.asarray(cd.node_loc)
    phi = np.asarray(ls(m.points))
    assert ((phi < 0) == (nl == classify.LOC_NEG)).all()
    # cut faces have endpoints on opposite sides and isect on the zero set
    fl = np.asarray(cd.face_loc)
    cut = fl == classify.LOC_CUT
    fp_loc = nl[np.asarray(m.face_ptids)]
    assert (fp_loc[cut, 0] != fp_loc[cut, 1]).all()
    vals = np.asarray(ls(cd.face_isect))[cut]
    assert np.abs(vals).max() < 1e-8


def test_cut_cell_count_invariant():
    m, ls, cd = _setup(16)
    cc = classify.detect_cut_cells(m, ls, classify.detect_cut_faces(m, ls))
    counts = np.asarray(cc.cut_count)
    assert set(np.unique(counts)) <= {0, 2}


def test_interface_orientation():
    """detect_cut_cells orients p0 -> p1 so the left side of the stored
    segment is the negative side: the probe pn = p0 + rot90(p1 - p0) that
    triggered the swap lands at phi < 0 afterwards
    (cuthho_geom.hpp:316-329)."""
    m, ls, cd = _setup(8)
    loc = np.asarray(cd.cell_loc)
    ids = np.nonzero(loc == classify.LOC_CUT)[0]
    p0 = np.asarray(cd.interface[ids, 0])
    p1 = np.asarray(cd.interface[ids, -1])
    t = p1 - p0
    probe = p0 + np.stack([-t[:, 1], t[:, 0]], axis=1)
    assert (np.asarray(ls(jnp.asarray(probe))) < 0).all()


def test_side_areas_and_interface_length():
    exact_area = np.pi * R * R
    exact_len = 2 * np.pi * R
    errs_a, errs_l = [], []
    for N in [8, 16, 32]:
        m, ls, cd = _setup(N)
        loc = np.asarray(cd.cell_loc)
        ids = np.nonzero(loc == classify.LOC_CUT)[0]
        geom = cell_geometry(m)
        neg = loc == classify.LOC_NEG
        cp = cell_points(m)[ids]
        nl = cd.node_loc[m.cell_ptids[ids]]
        poly = cq.triangulation_points(cp, m.cell_npts[ids], nl,
                                       cd.interface[ids], classify.LOC_NEG)
        area = float(jnp.sum(geom.meas[neg])) + \
            float(jnp.sum(cq.side_measure(poly)))
        irule = cq.interface_rule(cd.interface[ids], poly.bar, 1)
        length = float(jnp.sum(irule.w))
        errs_a.append(abs(area - exact_area) / exact_area)
        errs_l.append(abs(length - exact_len) / exact_len)

        # side areas of cut cells sum to the full cell area
        polyp = cq.triangulation_points(cp, m.cell_npts[ids], nl,
                                        cd.interface[ids], classify.LOC_POS)
        both = cq.side_measure(poly) + cq.side_measure(polyp)
        assert np.allclose(np.asarray(both), np.asarray(geom.meas[ids]),
                           atol=1e-12)

    assert errs_a[-1] < 1e-5
    assert errs_l[-1] < 1e-5
    # ~second order in h
    assert errs_a[0] / errs_a[-1] > 8
    assert errs_l[0] / errs_l[-1] > 8


def test_move_nodes_improves_close_cuts():
    """Node displacement pushes intersection points away from face
    endpoints (move_nodes, cuthho_geom.hpp:466-543). A single pass halves
    the violation rather than eliminating it (same as the reference), so
    assert material improvement of the worst closeness."""

    def worst_closeness(mesh, cutdata):
        fl = np.asarray(cutdata.face_loc)
        cut = fl == classify.LOC_CUT
        fp = np.asarray(mesh.points)[np.asarray(mesh.face_ptids)]
        lf = np.linalg.norm(fp[:, 1] - fp[:, 0], axis=1)
        dp = np.linalg.norm(np.asarray(cutdata.face_isect) - fp[:, 0],
                            axis=1)
        c = (dp / lf)[cut]
        return min(c.min(), (1 - c).min())

    m0 = pt.make_poly_mesh(Nx=16, Ny=16)
    ls = levelset.circle_level_set(R, 0.5, 0.5)
    fc0 = classify.detect_cut_faces(m0, ls)
    cd0_like = type("X", (), {"face_loc": fc0.loc, "face_isect": fc0.isect})
    before = worst_closeness(m0, cd0_like)

    m1, cd1 = classify.cut_preprocess(m0, ls, levels=1)
    after = worst_closeness(m1, cd1)
    assert after > before
    assert after > 0.25


def test_move_nodes_marks_distorted():
    m0 = pt.make_poly_mesh(Nx=16, Ny=16)
    ls = levelset.circle_level_set(R, 0.5, 0.5)
    fc = classify.detect_cut_faces(m0, ls)
    mv = classify.move_nodes(m0, fc)
    assert not bool(jnp.any(mv.concave))
    displaced = np.asarray(mv.displaced)
    distorted = np.asarray(mv.distorted)
    cp = np.asarray(m0.cell_ptids)
    assert (distorted == displaced[cp].any(axis=1)).all()
    # displaced points actually moved, others did not
    moved = np.linalg.norm(np.asarray(mv.points) - np.asarray(m0.points),
                           axis=1) > 0
    assert (moved == displaced).all()


def test_agglomeration_detection_path():
    m, ls, cd = _setup(16, agglomeration=True)
    ag = np.asarray(cd.agglo_set)
    loc = np.asarray(cd.cell_loc)
    cut = loc == classify.LOC_CUT
    # every cut cell is classified; uncut cells stay UNDEF
    assert (ag[cut] != classify.AGGLO_UNDEF).all()
    assert (ag[~cut] == classify.AGGLO_UNDEF).all()


def test_neighbors_info():
    m = pt.make_quad_mesh(Nx=4, Ny=4)
    nb = np.asarray(classify.make_neighbors_info(m))
    # interior cell 5 (row 1, col 1) touches 8 neighbors
    assert sorted(n for n in nb[5] if n >= 0) == [0, 1, 2, 4, 6, 8, 9, 10]
    # corner cell 0 touches 3
    assert sorted(n for n in nb[0] if n >= 0) == [1, 4, 5]


def test_line_level_set_split():
    """Straight-line cut at a generic height: the negative-side area is
    exact (a line is resolved exactly by the linear interface polyline)."""
    y0 = 0.37
    m = pt.make_poly_mesh(Nx=4, Ny=4)
    ls = levelset.line_level_set(y0)
    m, cd = classify.cut_preprocess(m, ls, levels=2)
    loc = np.asarray(cd.cell_loc)
    assert (loc == classify.LOC_CUT).sum() == 4
    geom = cell_geometry(m)
    ids = np.nonzero(loc == classify.LOC_CUT)[0]
    cp = cell_points(m)[ids]
    nl = cd.node_loc[m.cell_ptids[ids]]
    poly = cq.triangulation_points(cp, m.cell_npts[ids], nl,
                                   cd.interface[ids], classify.LOC_NEG)
    neg = float(jnp.sum(geom.meas[loc == classify.LOC_NEG])) + \
        float(jnp.sum(cq.side_measure(poly)))
    assert np.isclose(neg, y0, atol=1e-9)


@pytest.mark.parametrize("ls_kind", ["circle", "line", "none"])
def test_band_preprocess_matches_full(ls_kind):
    """cut_preprocess_band reproduces the full pipeline EXACTLY on every
    meaningful entry: points, node/face/cell locations, distorted flags,
    and the cut faces'/cells' intersection + interface tables."""
    import proton_tpu as pt
    from proton_tpu.cut import levelset

    N = 32
    mesh = pt.make_poly_mesh(Nx=N, Ny=N)
    if ls_kind == "circle":
        phi = levelset.circle_level_set(0.35, 0.5, 0.5)
    elif ls_kind == "line":
        phi = levelset.line_level_set(0.5321)
    else:
        phi = levelset.circle_level_set(0.1, 5.0, 5.0)   # fully outside
    m_f, cd_f = classify.cut_preprocess(mesh, phi, levels=4)
    m_b, cd_b = classify.cut_preprocess_band(mesh, phi, levels=4)

    assert np.array_equal(np.asarray(m_f.points), np.asarray(m_b.points))
    for name in ("node_loc", "face_loc", "face_node_inside", "cell_loc",
                 "distorted", "agglo_set"):
        assert np.array_equal(np.asarray(getattr(cd_f, name)),
                              np.asarray(getattr(cd_b, name))), name
    cut_f = np.asarray(cd_f.face_loc) == classify.LOC_CUT
    assert np.array_equal(np.asarray(cd_f.face_isect)[cut_f],
                          np.asarray(cd_b.face_isect)[cut_f])
    cut_c = np.asarray(cd_f.cell_loc) == classify.LOC_CUT
    assert cd_f.interface.shape == cd_b.interface.shape
    assert np.array_equal(np.asarray(cd_f.interface)[cut_c],
                          np.asarray(cd_b.interface)[cut_c])
