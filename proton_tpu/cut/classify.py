"""Level-set cut classification pipeline, fully vectorized
(replaces src/methods/cuthho_bits/cuthho_geom.hpp:68-545).

The reference stores classification state in per-element UserData structs
and loops over elements; here each stage is one batched jnp computation
producing parallel arrays (extra SoA columns of the mesh). Location and
agglomeration codes match the numeric encodings the reference exports to
SILO (output_mesh_info, cuthho_square.cpp:1489-1516).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.geometry import cell_points

# element_location (cuthho_mesh.hpp:31-36)
LOC_NEG = 0
LOC_POS = 1
LOC_CUT = 2
LOC_UNDEF = 3

# cell_agglo_set (cuthho_mesh.hpp:38-43), encoded as in output_mesh_info
AGGLO_UNDEF = 0
AGGLO_OK = 1
AGGLO_KO_NEG = 2
AGGLO_KO_POS = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CutData:
    """Parallel classification arrays (the SoA form of cell/face/node
    cuthho UserData, cuthho_mesh.hpp:45-90).

    node_loc   [P]        LOC_NEG / LOC_POS
    face_loc   [F]        LOC_NEG / LOC_POS / LOC_CUT
    face_isect [F, 2]     zero-crossing point (junk for uncut faces)
    face_node_inside [F]  0/1: which endpoint is on the negative side
    cell_loc   [C]
    interface  [C, R+1, 2] oriented refined interface polyline (junk for
                           uncut cells); [*, 0] == p0, [*, R] == p1
    agglo_set  [C]        AGGLO_* (only set on the -A path)
    distorted  [C]        cells touched by node displacement
    """

    node_loc: jax.Array
    face_loc: jax.Array
    face_isect: jax.Array
    face_node_inside: jax.Array
    cell_loc: jax.Array
    interface: jax.Array
    agglo_set: jax.Array
    distorted: jax.Array

    @property
    def n_interface_points(self) -> int:
        return self.interface.shape[1]


def find_zero_crossings(pa, pb, phi, iters: int = 30):
    """Batched bisection for the zero of phi on segments [pa, pb]
    (find_zero_crossing, cuthho_geom.hpp:68-116). The reference stops when
    the midpoint moves less than diameter/1e4 (<= 30 iters); a fixed 30
    iterations is at least as accurate (error ~ |pb-pa| * 2^-30) and
    branch-free. pa/pb: [..., 2]."""

    def body(_, carry):
        a, b = carry
        m = 0.5 * (a + b)
        lb = phi(b)
        lm = phi(m)
        same = ((lb >= 0) & (lm >= 0)) | ((lb < 0) & (lm < 0))
        # same sign as b => crossing in [a, m]
        new_b = jnp.where(same[..., None], m, b)
        new_a = jnp.where(same[..., None], a, m)
        return new_a, new_b

    a, b = jax.lax.fori_loop(0, iters, body, (pa, pb))
    return 0.5 * (a + b)


def detect_node_position(mesh, phi):
    """[P] node side: phi < 0 -> NEG else POS (cuthho_geom.hpp:118-130)."""
    return jnp.where(phi(mesh.points) < 0, LOC_NEG, LOC_POS).astype(jnp.int8)


class FaceCuts(NamedTuple):
    loc: jnp.ndarray           # [F]
    isect: jnp.ndarray         # [F, 2]
    node_inside: jnp.ndarray   # [F]


def detect_cut_faces(mesh, phi) -> FaceCuts:
    """Per-face sign analysis + zero crossing (cuthho_geom.hpp:132-161).
    The bisection runs on every face unconditionally (branch-free); the
    result is only meaningful where loc == LOC_CUT."""
    fp = mesh.points[mesh.face_ptids]  # [F, 2, 2]
    l0 = phi(fp[:, 0])
    l1 = phi(fp[:, 1])
    loc = jnp.where((l0 >= 0) & (l1 >= 0), LOC_POS,
                    jnp.where((l0 < 0) & (l1 < 0), LOC_NEG,
                              LOC_CUT)).astype(jnp.int8)
    isect = find_zero_crossings(fp[:, 0], fp[:, 1], phi)
    node_inside = jnp.where(l0 < 0, 0, 1).astype(jnp.int8)
    return FaceCuts(loc, isect, node_inside)


class CellCuts(NamedTuple):
    loc: jnp.ndarray        # [C]
    p0: jnp.ndarray         # [C, 2] oriented interface start (junk uncut)
    p1: jnp.ndarray         # [C, 2]
    cut_count: jnp.ndarray  # [C] number of cut faces (must be 0 or 2)


def detect_cut_cells(mesh, phi, fc: FaceCuts) -> CellCuts:
    """Classify cells and orient the interface segment so the negative side
    is consistent (detect_cut_cells, cuthho_geom.hpp:275-340).

    The probe: pn = p0 + rot90(p1 - p0); if phi(pn) >= 0, swap p0/p1.
    Any cell with a cut count other than 0 or 2 is an error — check
    ``cut_count`` on the host (the reference throws,
    cuthho_geom.hpp:335-336).
    """
    floc = fc.loc[mesh.cell_faces]                  # [C, nF]
    k = jnp.arange(mesh.max_pts)[None, :]
    valid = k < mesh.cell_npts[:, None]
    is_cut_f = (floc == LOC_CUT) & valid
    count = jnp.sum(is_cut_f, axis=1)

    # first and second cut face (by local index), as in the fill order of
    # cuthho_geom.hpp:289-293
    big = mesh.max_pts + 1
    order = jnp.where(is_cut_f, k, big)
    first = jnp.argmin(order, axis=1)
    order2 = order.at[jnp.arange(mesh.num_cells), first].set(big)
    second = jnp.argmin(order2, axis=1)

    isect_cell = fc.isect[mesh.cell_faces]          # [C, nF, 2]
    p0 = jnp.take_along_axis(isect_cell, first[:, None, None].astype(jnp.int32)
                             .repeat(2, -1), axis=1)[:, 0]
    p1 = jnp.take_along_axis(isect_cell, second[:, None, None].astype(jnp.int32)
                             .repeat(2, -1), axis=1)[:, 0]

    pt = p1 - p0
    pn = p0 + jnp.stack([-pt[..., 1], pt[..., 0]], axis=-1)
    swap = phi(pn) >= 0
    p0o = jnp.where(swap[:, None], p1, p0)
    p1o = jnp.where(swap[:, None], p0, p1)

    # uncut: POS iff all cell points strictly positive (note: > 0, not the
    # >= 0 of the node test — mirrored from cuthho_geom.hpp:301-309)
    all_pos = jnp.all((phi(cell_points(mesh)) > 0) |
                      (k >= mesh.cell_npts[:, None]), axis=1)
    loc = jnp.where(count >= 2, LOC_CUT,
                    jnp.where(all_pos, LOC_POS, LOC_NEG)).astype(jnp.int8)
    return CellCuts(loc, p0o, p1o, count)


def detect_cell_agglo_set(mesh, phi, fc: FaceCuts, node_loc, cell_loc):
    """Classify bad cuts against the 6 quad cut configurations with
    cut-fraction threshold 0.3 (detect_cell_agglo_set,
    cuthho_geom.hpp:163-273). Quad-only like the reference."""
    if mesh.max_pts != 4:
        raise ValueError("agglomeration sets work only on quads for now")
    threshold = 0.3
    C = mesh.num_cells
    pts = cell_points(mesh)                             # [C, 4, 2]
    floc = fc.loc[mesh.cell_faces]                      # [C, 4]
    fisect = fc.isect[mesh.cell_faces]                  # [C, 4, 2]
    fmeas = jnp.linalg.norm(
        mesh.points[mesh.face_ptids[mesh.cell_faces]][:, :, 1]
        - mesh.points[mesh.face_ptids[mesh.cell_faces]][:, :, 0], axis=-1)
    nloc = node_loc[mesh.cell_ptids]                    # [C, 4]
    cut_f = floc == LOC_CUT

    # distance fractions d[c, n, f] for node n against face f
    def frac(n, f):
        return jnp.linalg.norm(pts[:, n] - fisect[:, f], axis=-1) / fmeas[:, f]

    agglo = jnp.full((C,), AGGLO_UNDEF, dtype=jnp.int8)

    # single-node cases: faces (i, i+1) both cut -> corner node n = i+1
    # (cuthho_geom.hpp:184-251)
    for i in range(4):
        n = (i + 1) % 4
        f1, f2 = i, (i + 1) % 4
        fire = cut_f[:, f1] & cut_f[:, f2]
        da = frac(n, f1)
        db = frac(n, f2)
        ok = jnp.minimum(da, db) > threshold
        ko = jnp.where(nloc[:, n] == LOC_NEG, AGGLO_KO_NEG, AGGLO_KO_POS)
        res = jnp.where(ok, AGGLO_OK, ko).astype(jnp.int8)
        agglo = jnp.where(fire, res, agglo)

    # double-node cases: opposite faces (0,2) and (1,3) both cut
    # (cuthho_geom.hpp:212-240,253-257)
    for f1, f2 in ((0, 2), (1, 3)):
        n1 = f1
        n2 = (f2 + 1) % 4
        fire = cut_f[:, f1] & cut_f[:, f2]
        da = frac(n1, f1)
        db = frac(n2, f2)
        m1 = jnp.maximum(da, db)
        m2 = jnp.maximum(1 - da, 1 - db)
        ok = jnp.minimum(m1, m2) > threshold
        ko_n1neg = jnp.where(m1 <= threshold, AGGLO_KO_NEG, AGGLO_KO_POS)
        ko_else = jnp.where(m2 <= threshold, AGGLO_KO_NEG, AGGLO_KO_POS)
        ko = jnp.where(nloc[:, n1] == LOC_NEG, ko_n1neg, ko_else)
        res = jnp.where(ok, AGGLO_OK, ko).astype(jnp.int8)
        agglo = jnp.where(fire, res, agglo)

    return agglo


def make_neighbors_info(mesh, max_neighbors: int = 8):
    """Point-sharing cell neighbor lists [C, max_neighbors], -1 padded
    (make_neighbors_info, cuthho_geom.hpp:343-380 — but via a vectorized
    point->cell incidence transpose instead of the reference's O(C^2)
    pair scan; no per-cell host loop, so it runs at 1024^2+)."""
    import numpy as np

    cp = np.asarray(mesh.cell_ptids)
    npts = np.asarray(mesh.cell_npts)
    C, Pmax = cp.shape
    valid = np.arange(Pmax)[None, :] < npts[:, None]
    p_flat = cp[valid].astype(np.int64)
    c_flat = np.broadcast_to(np.arange(C)[:, None], (C, Pmax))[valid]

    # point -> cells padded table [P, M] via grouped ranks
    order = np.argsort(p_flat, kind="stable")
    ps, cs = p_flat[order], c_flat[order]
    first = np.concatenate([[True], ps[1:] != ps[:-1]])
    gstart = np.maximum.accumulate(np.where(first, np.arange(len(ps)), 0))
    rank = np.arange(len(ps)) - gstart
    M = int(rank.max()) + 1 if len(ps) else 1
    P = mesh.num_points
    p2c = -np.ones((P, M), dtype=np.int64)
    p2c[ps, rank] = cs

    # candidates per cell: cells of each of its points
    cand = p2c[cp].reshape(C, Pmax * M)          # padding dups are fine
    cand = np.where(cand == np.arange(C)[:, None], -1, cand)  # drop self
    cand.sort(axis=1)                             # -1s first
    dup = np.concatenate([np.zeros((C, 1), bool),
                          cand[:, 1:] == cand[:, :-1]], axis=1)
    cand = np.where(dup | (cand < 0), np.iinfo(np.int64).max, cand)
    cand.sort(axis=1)                             # uniques first, asc
    out = cand[:, :max_neighbors]
    out = np.where(out == np.iinfo(np.int64).max, -1, out)
    return jnp.asarray(out.astype(np.int32))


class MoveNodesResult(NamedTuple):
    points: jnp.ndarray      # displaced point coordinates [P, 2]
    displaced: jnp.ndarray   # [P] bool
    distorted: jnp.ndarray   # [C] bool
    concave: jnp.ndarray     # [C] bool — must be all-False (the reference
    #                          throws "concave poly", cuthho_geom.hpp:538-540)


def move_nodes(mesh, fc: FaceCuts) -> MoveNodesResult:
    """Bad-cut fix #1: displace nodes whose face intersection point is
    within closeness 0.4 of them by (face midpoint - intersection)/2,
    accumulating displacements (move_nodes, cuthho_geom.hpp:466-543)."""
    closeness_thresh = 0.4
    fp = mesh.points[mesh.face_ptids]      # [F, 2, 2]
    bar = 0.5 * (fp[:, 0] + fp[:, 1])
    lf = jnp.linalg.norm(fp[:, 1] - fp[:, 0], axis=-1)
    dp = jnp.linalg.norm(fc.isect - fp[:, 0], axis=-1)
    closeness = dp / lf

    on_iface = fc.loc == LOC_CUT
    move0 = on_iface & (closeness < closeness_thresh)
    move1 = on_iface & (closeness > 1.0 - closeness_thresh)
    delta = 0.5 * (bar - fc.isect)         # [F, 2]

    P = mesh.num_points
    disp = jnp.zeros((P, 2), dtype=mesh.points.dtype)
    target0 = jnp.where(move0, mesh.face_ptids[:, 0], P)
    target1 = jnp.where(move1, mesh.face_ptids[:, 1], P)
    disp = disp - jax.ops.segment_sum(
        jnp.where(move0[:, None], delta, 0.0), target0,
        num_segments=P + 1)[:P]
    disp = disp - jax.ops.segment_sum(
        jnp.where(move1[:, None], delta, 0.0), target1,
        num_segments=P + 1)[:P]
    displaced = (jax.ops.segment_sum(
        (move0 | move1).astype(jnp.int32),
        jnp.where(move0 | move1,
                  jnp.where(move0, mesh.face_ptids[:, 0],
                            mesh.face_ptids[:, 1]), P),
        num_segments=P + 1)[:P]) > 0

    new_points = mesh.points + disp
    distorted = jnp.any(displaced[mesh.cell_ptids], axis=1)

    # concavity check on distorted cells (cuthho_geom.hpp:517-542)
    pts = new_points[mesh.cell_ptids]
    k = jnp.arange(mesh.max_pts)[None, :]
    npts = mesh.cell_npts[:, None]
    idx = lambda d: jnp.where(k + d < npts, k + d,
                              k + d - npts).astype(jnp.int32)
    pa = pts
    pb = jnp.take_along_axis(pts, idx(1)[..., None], axis=1)
    pc = jnp.take_along_axis(pts, idx(2)[..., None], axis=1)
    v1 = pb - pa
    v2 = pc - pb
    cross = v1[..., 0] * v2[..., 1] - v2[..., 0] * v1[..., 1]
    concave = distorted & jnp.any((cross < 0) & (k < npts), axis=1)

    return MoveNodesResult(new_points, displaced, distorted, concave)


def refine_interface(mesh, phi, cells: CellCuts, levels: int):
    """Bisect the interface polyline to 2^levels segments, projecting each
    midpoint back onto the zero level set along the (unnormalized!) span
    normal (refine_interface, cuthho_geom.hpp:609-673).

    Returns interface [C, 2^levels + 1, 2] (junk for uncut cells).
    """
    R = 2 ** levels
    C = mesh.num_cells
    # polyline grown by INTERLEAVING (stack + reshape + concat): the
    # scatter formulation (iface.at[:, mids].set) overflows the TPU's
    # 16M scoped vmem once the geometry axis is vmapped (cut/batched.py)
    pts = jnp.stack([cells.p0, cells.p1], axis=1)       # [C, 2, 2]
    if levels == 0:
        # degenerate: single segment p0-p1 (reference requires levels >= 1
        # for an actual polyline; detect_cut_cells already stored p0, p1)
        return pts

    for d in range(levels):
        p0 = pts[:, :-1]                    # [C, S, 2]
        p1 = pts[:, 1:]
        pm = 0.5 * (p0 + p1)
        pt = p1 - p0
        pn = jnp.stack([-pt[..., 1], pt[..., 0]], axis=-1)
        ps1 = pm + pn
        ps2 = pm - pn
        lm = phi(pm)
        ls1 = phi(ps1)
        diff1 = ~(((lm >= 0) & (ls1 >= 0)) | ((lm < 0) & (ls1 < 0)))
        # crossing toward ps1 where signs differ, else toward ps2
        # (reference errors out if neither; here the ps2 branch is taken
        # unconditionally as fallback — validate via interface length tests)
        pb = jnp.where(diff1[..., None], ps1, ps2)
        ip = find_zero_crossings(pm, pb, phi)
        S = p0.shape[1]
        inter = jnp.stack([p0, ip], axis=2).reshape(C, 2 * S, 2)
        pts = jnp.concatenate([inter, pts[:, -1:]], axis=1)

    return pts


def _preprocess_core(mesh, phi, levels: int, agglomeration: bool,
                     displacement: bool = True):
    """Pure device pipeline; jitted by cut_preprocess. Returns
    (points', CutData, concave_any, n_bad_cells)."""
    node_loc = detect_node_position(mesh, phi)
    fcuts = detect_cut_faces(mesh, phi)
    distorted = jnp.zeros((mesh.num_cells,), dtype=bool)
    agglo = jnp.full((mesh.num_cells,), AGGLO_UNDEF, dtype=jnp.int8)
    concave_any = jnp.asarray(False)

    if agglomeration:
        ccuts = detect_cut_cells(mesh, phi, fcuts)
        agglo = detect_cell_agglo_set(mesh, phi, fcuts, node_loc, ccuts.loc)
    elif not displacement:
        # plain classification (used on already-agglomerated meshes)
        ccuts = detect_cut_cells(mesh, phi, fcuts)
    else:
        mv = move_nodes(mesh, fcuts)
        concave_any = jnp.any(mv.concave)
        mesh = mesh.with_points(mv.points)
        distorted = mv.distorted
        fcuts = detect_cut_faces(mesh, phi)   # re-run on moved points
        ccuts = detect_cut_cells(mesh, phi, fcuts)

    n_bad = jnp.sum((ccuts.cut_count != 0) & (ccuts.cut_count != 2))
    iface = refine_interface(mesh, phi, ccuts, levels)
    cutdata = CutData(
        node_loc=node_loc,
        face_loc=fcuts.loc,
        face_isect=fcuts.isect,
        face_node_inside=fcuts.node_inside,
        cell_loc=ccuts.loc,
        interface=iface,
        agglo_set=agglo,
        distorted=distorted,
    )
    return mesh.points, cutdata, concave_any, n_bad


def band_cell_ids(mesh, phi):
    """Host ids of the interface BAND: every cell touching a node of a
    sign-change face (the 1-ring of the cut cells). Everything the full
    preprocessing pipeline computes differs from the trivial corner-sign
    classification ONLY inside this band:

    - a face can be LOC_CUT only if its endpoint phis differ in
      sign-class (detect_cut_faces, cuthho_geom.hpp:132-161);
    - move_nodes displaces only endpoints of LOC_CUT faces
      (cuthho_geom.hpp:466-543), so displaced nodes — and hence
      distorted cells, re-detected faces and post-displacement cut
      cells — all touch a sign-change face's endpoint;
    - the displacement pushes the node AWAY from the interface (toward
      the face midpoint), and even if the moved phi changes sign, the
      affected cells still touch the moved node, i.e. stay in the band.

    Returns (band_ids [B], lnode [P] numpy phi values at the original
    points)."""
    import numpy as np

    lnode = np.asarray(phi(mesh.points))
    neg = lnode < 0
    fp = np.asarray(mesh.face_ptids)
    fcut = neg[fp[:, 0]] != neg[fp[:, 1]]
    marked = np.zeros(mesh.num_points, dtype=bool)
    marked[fp[fcut].ravel()] = True
    cp = np.asarray(mesh.cell_ptids)
    band = marked[cp].any(axis=1)
    return np.nonzero(band)[0], lnode


def cut_preprocess_band(mesh, phi, levels: int = 4):
    """Band-restricted cut_preprocess (displacement path): identical
    output contract, with the per-face bisections, node displacement,
    cell classification and interface refinement computed only on the
    O(N) interface band (band_cell_ids) instead of all O(N^2) cells.
    The full-mesh arrays are reconstructed by scattering the band
    results over the trivial corner-sign classification — exact, because
    outside the band no node moves and no face/cell can be cut.

    This is what makes classification O(band) at 1024^2..4096^2 — the
    full pipeline's 30-iteration bisection over every face is the
    single most expensive setup stage at scale."""
    import numpy as np

    band_ids, lnode = band_cell_ids(mesh, phi)
    cp = np.asarray(mesh.cell_ptids)
    fp = np.asarray(mesh.face_ptids)
    cf = np.asarray(mesh.cell_faces)
    C, F, P = mesh.num_cells, mesh.num_faces, mesh.num_points
    R = 2 ** max(levels, 1) if levels else 1

    if len(band_ids) == 0:
        # no sign change anywhere: trivial classification
        both_pos = (lnode[fp[:, 0]] >= 0) & (lnode[fp[:, 1]] >= 0)
        all_pos = (lnode[cp] > 0).all(axis=1)
        cutdata = CutData(
            node_loc=jnp.asarray(
                np.where(lnode < 0, LOC_NEG, LOC_POS).astype(np.int8)),
            face_loc=jnp.asarray(
                np.where(both_pos, LOC_POS, LOC_NEG).astype(np.int8)),
            face_isect=jnp.zeros((F, 2), mesh.points.dtype),
            face_node_inside=jnp.asarray(
                np.where(lnode[fp[:, 0]] < 0, 0, 1).astype(np.int8)),
            cell_loc=jnp.asarray(
                np.where(all_pos, LOC_POS, LOC_NEG).astype(np.int8)),
            interface=jnp.zeros((C, R + 1, 2), mesh.points.dtype),
            agglo_set=jnp.full((C,), AGGLO_UNDEF, dtype=jnp.int8),
            distorted=jnp.zeros((C,), dtype=bool),
        )
        return mesh, cutdata

    # compacted face list of the band sub-mesh
    sub_cf_g = cf[band_ids]
    fsub, inv = np.unique(sub_cf_g, return_inverse=True)
    sub = dataclasses.replace(
        mesh,
        cell_ptids=jnp.asarray(cp[band_ids]),
        cell_npts=mesh.cell_npts[jnp.asarray(band_ids)],
        cell_faces=jnp.asarray(
            inv.reshape(sub_cf_g.shape).astype(np.int32)),
        face_ptids=jnp.asarray(fp[fsub].astype(np.int32)),
        face_bnd=mesh.face_bnd[jnp.asarray(fsub)],
    )
    core = jax.jit(partial(_preprocess_core, phi=phi, levels=levels,
                           agglomeration=False, displacement=True))
    points2, sub_cut, concave_any, n_bad = core(sub)
    if bool(concave_any):
        raise RuntimeError("concave poly generated by node displacement")
    if int(n_bad) != 0:
        raise RuntimeError(
            f"invalid number of cuts in {int(n_bad)} cell(s)")

    # ---- scatter band results over the trivial classification ----
    dtype = np.asarray(mesh.points).dtype
    # faces outside the band sub-list: endpoints unmoved, same
    # sign-class -> POS iff both >= 0 (detect_cut_faces rule)
    both_pos = (lnode[fp[:, 0]] >= 0) & (lnode[fp[:, 1]] >= 0)
    face_loc = np.where(both_pos, LOC_POS, LOC_NEG).astype(np.int8)
    face_loc[fsub] = np.asarray(sub_cut.face_loc)
    face_isect = np.zeros((F, 2), dtype=dtype)
    face_isect[fsub] = np.asarray(sub_cut.face_isect)
    face_node_inside = np.where(lnode[fp[:, 0]] < 0, 0, 1).astype(np.int8)
    face_node_inside[fsub] = np.asarray(sub_cut.face_node_inside)

    # cells outside the band: POS iff all corners strictly positive
    # (detect_cut_cells' all_pos rule, cuthho_geom.hpp:301-309)
    all_pos = (lnode[cp] > 0).all(axis=1)
    cell_loc = np.where(all_pos, LOC_POS, LOC_NEG).astype(np.int8)
    cell_loc[band_ids] = np.asarray(sub_cut.cell_loc)
    interface = np.zeros((C, R + 1, 2), dtype=dtype)
    interface[band_ids] = np.asarray(sub_cut.interface)
    distorted = np.zeros((C,), dtype=bool)
    distorted[band_ids] = np.asarray(sub_cut.distorted)

    cutdata = CutData(
        node_loc=sub_cut.node_loc,
        face_loc=jnp.asarray(face_loc),
        face_isect=jnp.asarray(face_isect),
        face_node_inside=jnp.asarray(face_node_inside),
        cell_loc=jnp.asarray(cell_loc),
        interface=jnp.asarray(interface),
        agglo_set=jnp.full((C,), AGGLO_UNDEF, dtype=jnp.int8),
        distorted=jnp.asarray(distorted),
    )
    return mesh.with_points(points2), cutdata


def cut_preprocess(mesh, phi, levels: int = 4, agglomeration: bool = False,
                   displacement: bool = True):
    """The full level-set mesh preprocessing pipeline of the reference main
    (cuthho_square.cpp:2035-2052), jit-compiled end to end:

    displacement path (default, -D): detect nodes/faces, move nodes,
    re-detect faces, detect cells, refine interface.
    agglomeration path (-A): detect nodes/faces/cells, compute agglo sets +
    neighbor info (detection only — the reference's merge step is dead code,
    see SURVEY.md "known bugs").

    Returns (mesh', CutData). Raises on invalid cut counts / concave cells
    (host-side check of the device flags, mirroring the reference throws at
    cuthho_geom.hpp:335-336 and :538-540).
    """
    core = jax.jit(partial(_preprocess_core, phi=phi, levels=levels,
                           agglomeration=agglomeration,
                           displacement=displacement))
    points, cutdata, concave_any, n_bad = core(mesh)
    if bool(concave_any):
        raise RuntimeError("concave poly generated by node displacement")
    if int(n_bad) != 0:
        raise RuntimeError(f"invalid number of cuts in {int(n_bad)} cell(s)")
    return mesh.with_points(points), cutdata
