"""Cell agglomeration: actually merge bad-cut cells with neighbors.

The reference only *detects* bad cuts (-A computes agglo sets + neighbor
info); its merge routine is dead code (agglomerate_cells hardcodes Nx = 0
and the consuming assembler is #if 0 — SURVEY.md "known bugs"). This
module completes the feature: every T_KO cell is merged with the
face-neighbor owning the largest portion of the deficient side, producing
a polygonal mesh on which the standard cut pipeline (and every solver)
runs unchanged — the padded SoA design makes merged polygons just rows
with larger npts.

Algorithm (host-side mesh preprocessing, like all topology work):
  1. classify (detect_* + detect_cell_agglo_set);
  2. each KO cell picks its best face-neighbor (largest area of the
     deficient side, never a cell that is KO of the same side);
  3. union-find the picks into groups;
  4. each group's union polygon = boundary edges (edges not shared by two
     members) walked into a CCW loop;
  5. rebuild the mesh (boundary codes inherited from the old faces) and
     repeat until no KO cells remain (merged cells can in rare cases still
     be badly cut; round >= 2 uses a side-area-fraction criterion since the
     reference's edge-fraction test is quad-only).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ..core.geometry import cell_geometry, cell_points
from ..core.mesh import Mesh, _build_topology
from . import quadrature as cq
from .classify import (AGGLO_KO_NEG, AGGLO_KO_POS, AGGLO_OK, LOC_CUT,
                       LOC_NEG, LOC_POS, detect_cell_agglo_set,
                       detect_cut_cells, detect_cut_faces,
                       detect_node_position)


def _side_measures(mesh, phi):
    """(neg_area [C], pos_area [C], cell_loc [C]) for neighbor choice."""
    node_loc = detect_node_position(mesh, phi)
    fcuts = detect_cut_faces(mesh, phi)
    ccuts = detect_cut_cells(mesh, phi, fcuts)
    geom = cell_geometry(mesh)
    loc = np.asarray(ccuts.loc)
    meas = np.asarray(geom.meas)
    neg = np.where(loc == LOC_NEG, meas, 0.0)
    pos = np.where(loc == LOC_POS, meas, 0.0)
    ids = np.nonzero(loc == LOC_CUT)[0]
    if len(ids):
        from .classify import refine_interface
        iface = refine_interface(mesh, phi, ccuts, 1)
        cp = cell_points(mesh)[ids]
        nl = node_loc[mesh.cell_ptids[ids]]
        poly_n = cq.triangulation_points(cp, mesh.cell_npts[ids], nl,
                                         iface[ids], LOC_NEG)
        sn = np.asarray(cq.side_measure(poly_n))
        neg[ids] = sn
        pos[ids] = meas[ids] - sn
    return neg, pos, loc, node_loc, fcuts, ccuts


def _face_neighbor_table(mesh):
    """[C, Pmax] face-sharing neighbor ids (-1 where boundary), fully
    vectorized via the face-cells incidence transpose (the reference
    builds the point-sharing variant in an O(C^2) scan,
    cuthho_geom.hpp:343-380; this is the O(C) SoA form the merge
    step needs)."""
    from ..methods.assembly import build_face_incidence, build_dofmap
    from ..core.ops import HHODegreeInfo

    dm = build_dofmap(mesh, HHODegreeInfo(0, 0))
    inc = build_face_incidence(mesh, dm)
    fc = np.asarray(inc.face_cells)            # [F, 2], sentinel C
    cf = np.asarray(mesh.cell_faces)           # [C, Pmax]
    C = mesh.num_cells
    pair = fc[cf]                              # [C, Pmax, 2]
    cid = np.arange(C)[:, None]
    other = np.where(pair[..., 0] == cid, pair[..., 1], pair[..., 0])
    other = np.where(other >= C, -1, other).astype(np.int64)
    # mask padding slots (they repeat a real face -> duplicate entries)
    valid = np.arange(cf.shape[1])[None, :] < \
        np.asarray(mesh.cell_npts)[:, None]
    return np.where(valid, other, -1)


class _UnionFind:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, a):
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[ra] = rb


def _walk_boundary(edges):
    """Order a set of undirected boundary edges into a closed loop of
    point ids. edges: list of (a, b) pairs."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for p, lst in adj.items():
        if len(lst) != 2:
            raise RuntimeError("non-manifold agglomeration boundary")
    start = min(adj)
    loop = [start]
    prev, cur = None, start
    while True:
        nxts = adj[cur]
        nxt = nxts[0] if nxts[0] != prev else nxts[1]
        if nxt == start:
            break
        loop.append(nxt)
        prev, cur = cur, nxt
    return loop


def _merge_round(mesh, phi, use_reference_classifier: bool):
    neg, pos, loc, node_loc, fcuts, ccuts = _side_measures(mesh, phi)
    C = mesh.num_cells
    geom = cell_geometry(mesh)
    meas = np.asarray(geom.meas)

    if use_reference_classifier and mesh.max_pts == 4:
        agglo = np.asarray(detect_cell_agglo_set(mesh, phi, fcuts,
                                                 node_loc, ccuts.loc))
    else:
        # generic side-area criterion for polygonal rounds
        frac_neg = np.where(loc == LOC_CUT, neg / meas, 1.0)
        frac_pos = np.where(loc == LOC_CUT, pos / meas, 1.0)
        thr = 0.09  # ~ the reference's 0.3 edge fraction, squared
        agglo = np.where(loc != LOC_CUT, 0,
                         np.where(frac_neg < thr, AGGLO_KO_NEG,
                                  np.where(frac_pos < thr, AGGLO_KO_POS,
                                           AGGLO_OK)))

    ko = np.isin(agglo, (AGGLO_KO_NEG, AGGLO_KO_POS))
    if not ko.any():
        return mesh, 0

    # neighbor choice, vectorized over the O(N) KO set
    nbr_tab = _face_neighbor_table(mesh)
    ko_ids = np.nonzero(ko)[0]
    cand = nbr_tab[ko_ids]                                # [K, Pmax]
    deficient = np.where((agglo[ko_ids] == AGGLO_KO_NEG)[:, None],
                         neg[np.maximum(cand, 0)],
                         pos[np.maximum(cand, 0)])
    same = agglo[np.maximum(cand, 0)] == agglo[ko_ids][:, None]
    score = np.where((cand < 0), -np.inf,
                     np.where(same, -np.inf, deficient))
    best = cand[np.arange(len(ko_ids)), np.argmax(score, axis=1)]
    # all partners same-side-deficient: fall back to the largest anyway
    none = ~np.isfinite(np.max(score, axis=1))
    if none.any():
        score2 = np.where(cand[none] < 0, -np.inf, deficient[none])
        best[none] = cand[none][np.arange(none.sum()),
                                np.argmax(score2, axis=1)]

    # union-find over the INVOLVED cells only (groups are tiny; the
    # other C - O(N) cells pass through untouched)
    involved = np.unique(np.concatenate([ko_ids, best]))
    uf = _UnionFind(len(involved))
    lookup = {int(c): i for i, c in enumerate(involved)}
    for c, b in zip(ko_ids, best):
        uf.union(lookup[int(c)], lookup[int(b)])
    groups = {}
    for i, c in enumerate(involved):
        groups.setdefault(uf.find(i), []).append(int(c))
    groups = [g for g in groups.values() if len(g) > 1]
    grouped = np.zeros(C, dtype=bool)
    for g in groups:
        grouped[g] = True

    cp = np.asarray(mesh.cell_ptids)
    npts = np.asarray(mesh.cell_npts)
    points = np.asarray(mesh.points)

    # untouched cells keep their (already padded) point rows
    keep_ids = np.nonzero(~grouped)[0]
    new_cells = []                      # merged polygons only (small)
    merged = 0
    for members in groups:
        merged += 1
        edge_count = {}
        for c in members:
            ids = cp[c, :npts[c]]
            for k in range(len(ids)):
                a, b = int(ids[k]), int(ids[(k + 1) % len(ids)])
                key = (min(a, b), max(a, b))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, n in edge_count.items() if n == 1]
        loop = _walk_boundary(boundary)
        # CCW orientation via the shoelace sign
        pts = points[loop]
        area2 = np.sum(pts[:, 0] * np.roll(pts[:, 1], -1) -
                       np.roll(pts[:, 0], -1) * pts[:, 1])
        if area2 < 0:
            loop = loop[::-1]
        new_cells.append(loop)

    # rebuild the mesh; boundary codes inherited from the old face table
    # (vectorized key lookup: sorted edge keys + searchsorted)
    fp = np.asarray(mesh.face_ptids).astype(np.int64)
    fb = np.asarray(mesh.face_bnd)
    P = mesh.num_points
    old_keys = fp[:, 0] * P + fp[:, 1]
    korder = np.argsort(old_keys)
    old_keys_s = old_keys[korder]
    old_bnd_s = fb[korder]

    # combine untouched rows (vectorized) + merged polygons (small),
    # pad, and lexsort into the reference's sorted generation order
    m_npts = np.fromiter((len(c) for c in new_cells), np.int64,
                         count=len(new_cells))
    Pmax = int(max(cp.shape[1], m_npts.max() if len(m_npts) else 0))
    n_new = len(keep_ids) + len(new_cells)
    cell_ptids = np.zeros((n_new, Pmax), dtype=np.int64)
    cell_npts = np.concatenate([npts[keep_ids], m_npts])
    cell_ptids[:len(keep_ids), :cp.shape[1]] = cp[keep_ids]
    for i, c in enumerate(new_cells):
        cell_ptids[len(keep_ids) + i, :len(c)] = c
    last = cell_ptids[np.arange(n_new), cell_npts - 1]
    pad = np.arange(Pmax)[None, :] >= cell_npts[:, None]
    cell_ptids = np.where(pad, last[:, None], cell_ptids)
    # sort rows lexicographically by (padded-with--1) point lists
    sort_key = np.where(np.arange(Pmax)[None, :] < cell_npts[:, None],
                        cell_ptids, -1)
    order = np.lexsort(sort_key.T[::-1])
    cell_ptids = cell_ptids[order]
    cell_npts = cell_npts[order]

    def raw_bnd(lo, hi, valid):
        lo64 = lo.astype(np.int64)
        hi64 = hi.astype(np.int64)
        keys = lo64 * P + hi64
        pos = np.searchsorted(old_keys_s, keys)
        pos = np.minimum(pos, len(old_keys_s) - 1)
        hit = old_keys_s[pos] == keys
        out = np.where(valid & hit, old_bnd_s[pos], 0)
        return out.astype(fb.dtype)

    new_mesh = _build_topology(points, cell_ptids, cell_npts, raw_bnd,
                               "poly")
    return new_mesh, merged


def agglomerate(mesh, phi, max_rounds: int = 3) -> Tuple[Mesh, int]:
    """Merge all badly-cut cells; returns (mesh', total merges). The
    result feeds cut_preprocess(..., agglomeration=True) / the fictdom and
    interface drivers like any polygonal mesh."""
    total = 0
    for rnd in range(max_rounds):
        mesh, merged = _merge_round(mesh, phi,
                                    use_reference_classifier=(rnd == 0))
        total += merged
        if merged == 0:
            break
    return mesh, total
