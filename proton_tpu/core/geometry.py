"""Batched mesh geometry (TPU-native replacement for the per-element free
functions in ``src/core/core_bits/basic_geom.hpp``).

Every function here computes a quantity for *all* cells (or faces) at once as
vectorized ``jnp`` math, instead of per-element loops with binary-search
lookups. All formulas mirror the reference exactly:

- barycenter: polygon fan formula with *signed* areas from p0
  (basic_geom.hpp:247-286)
- diameter: max pairwise point distance (basic_geom.hpp:288-305)
- measure:  fan-triangle |area| sum / edge length (basic_geom.hpp:317-344)
- normals:  per-edge outward unit normal (v.y, -v.x)/|v| for CCW polygons
  (basic_geom.hpp:349-399)

Padded polygon slots (repeated last point) produce degenerate edges that
contribute zero automatically; normal vectors of degenerate edges are guarded
against 0/0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def cell_points(mesh):
    """[C, Pmax, 2] coordinates of each cell's points (padded slots repeat
    the last valid point)."""
    return mesh.points[mesh.cell_ptids]


def _fan_dets(pts):
    """Signed fan determinants d_i = det(p_{i-1}-p0, p_i-p0)/2 for i=2..n-1.

    pts: [..., P, 2] -> [..., P-2]
    """
    rel = pts - pts[..., :1, :]
    a = rel[..., 1:-1, :]
    b = rel[..., 2:, :]
    return 0.5 * (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])


def polygon_barycenter(pts):
    """Area-weighted barycenter of a (padded) CCW polygon, fan formula of
    basic_geom.hpp:247-270. pts: [..., P, 2] -> [..., 2]."""
    rel = pts - pts[..., :1, :]
    d = _fan_dets(pts)  # [..., P-2]
    mids = rel[..., 1:-1, :] + rel[..., 2:, :]  # pprev + pcur
    num = jnp.sum(mids * d[..., None], axis=-2)
    den = jnp.sum(d, axis=-1)
    return pts[..., 0, :] + num / (3.0 * den[..., None])


def polygon_measure(pts):
    """Polygon area as sum of |fan triangle| areas (basic_geom.hpp:317-334)."""
    return jnp.sum(jnp.abs(_fan_dets(pts)), axis=-1)


def polygon_diameter(pts):
    """Max pairwise point distance (basic_geom.hpp:288-305)."""
    diff = pts[..., :, None, :] - pts[..., None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(jnp.max(d2, axis=(-2, -1)))


def cell_barycenters(mesh):
    return polygon_barycenter(cell_points(mesh))


def cell_measures(mesh):
    return polygon_measure(cell_points(mesh))


def cell_diameters(mesh):
    return polygon_diameter(cell_points(mesh))


def cell_edge_vertices(mesh):
    """Local edge endpoints in cell-local CCW order: edge k joins local
    points (k, k+1 mod npts) (basic_geom.hpp:194-200). Padded edges are
    degenerate (p0 == p1).

    Returns (e0, e1): each [C, Pmax, 2].
    """
    pts = cell_points(mesh)
    C, P, _ = pts.shape
    k = jnp.arange(P)[None, :]
    npts = mesh.cell_npts[:, None]
    valid = k < npts
    i1 = jnp.where(k + 1 < npts, k + 1, 0)
    i1 = jnp.where(valid, i1, jnp.minimum(k, npts - 1))
    e0 = pts
    e1 = jnp.take_along_axis(pts, i1[..., None].astype(jnp.int32), axis=1)
    return e0, e1


def cell_normals(mesh):
    """Outward unit normal of each cell edge (basic_geom.hpp:349-399).
    [C, Pmax, 2]; zero vector on degenerate padded edges."""
    e0, e1 = cell_edge_vertices(mesh)
    v = e1 - e0
    n = jnp.stack([v[..., 1], -v[..., 0]], axis=-1)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return jnp.where(norm > 0, n / jnp.where(norm > 0, norm, 1.0), 0.0)


def face_points(mesh):
    """[F, 2, 2] endpoint coordinates of every global face, in sorted-ptid
    order (the order ``points(msh, fc)`` returns, basic_geom.hpp:158-171).
    The face basis direction depends on this order (bases.hpp:260-262)."""
    return mesh.points[mesh.face_ptids]


def face_barycenters(mesh):
    return jnp.mean(face_points(mesh), axis=1)


def face_measures(mesh):
    fp = face_points(mesh)
    return jnp.linalg.norm(fp[:, 1] - fp[:, 0], axis=-1)


class CellGeom(NamedTuple):
    """Precomputed per-cell geometry bundle shared by the HHO kernels."""

    bar: jnp.ndarray          # [C, 2]
    diam: jnp.ndarray         # [C]
    meas: jnp.ndarray         # [C]
    normals: jnp.ndarray      # [C, Pmax, 2] local-edge outward normals
    edge_valid: jnp.ndarray   # [C, Pmax] bool
    # per local edge, the *global face* data (sorted-ptid orientation):
    face_pts: jnp.ndarray     # [C, Pmax, 2, 2]
    face_bar: jnp.ndarray     # [C, Pmax, 2]
    face_h: jnp.ndarray       # [C, Pmax] face diameter == length
    face_ids: jnp.ndarray     # [C, Pmax] global face index


def cell_geometry(mesh) -> CellGeom:
    pts = cell_points(mesh)
    k = jnp.arange(mesh.max_pts)[None, :]
    valid = k < mesh.cell_npts[:, None]
    fpts = mesh.points[mesh.face_ptids[mesh.cell_faces]]  # [C,P,2,2]
    fbar = jnp.mean(fpts, axis=2)
    fh = jnp.linalg.norm(fpts[:, :, 1] - fpts[:, :, 0], axis=-1)
    return CellGeom(
        bar=polygon_barycenter(pts),
        diam=polygon_diameter(pts),
        meas=polygon_measure(pts),
        normals=cell_normals(mesh),
        edge_valid=valid,
        face_pts=fpts,
        face_bar=fbar,
        face_h=fh,
        face_ids=mesh.cell_faces,
    )
