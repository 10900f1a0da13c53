"""Cut-cell integration with static padding
(replaces cuthho_geom.hpp:547-895).

The reference builds, per cut cell, a variable-length ordered polygon of
same-side nodes + interface polyline (4 node-ordering cases,
collect_triangulation_points :675-728), fan-triangulates it (:754-777) and
runs a triangle rule per fan triangle (:798-815). Here the branchy point
collection becomes a *sort-key assignment*: each candidate point (cell node
or interface vertex) gets a key encoding its position in the reference's
traversal order, an argsort produces the padded ordered polygon, and the
existing padded fan rule integrates it. Everything is [C_cut, ...] batched.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from ..core.geometry import polygon_barycenter
from ..core.quadrature import QuadRule, face_rule, gauss_legendre, \
    poly_cell_rule
from ..config import np_real_dtype
from .classify import LOC_CUT, LOC_NEG, LOC_POS


class SidePolygon(NamedTuple):
    """Padded ordered polygon of one side of each (cut) cell."""

    tp: jnp.ndarray      # [Cc, T, 2] points, padding repeats the last
    count: jnp.ndarray   # [Cc] number of valid points
    bar: jnp.ndarray     # [Cc, 2] fan barycenter (barycenter(tp))


def triangulation_points(cell_pts, cell_npts, node_loc_cells, interface,
                         side: int) -> SidePolygon:
    """collect_triangulation_points (cuthho_geom.hpp:675-728) for a batch
    of cut cells.

    cell_pts       [Cc, P, 2]  cell corner coordinates
    cell_npts      [Cc]
    node_loc_cells [Cc, P]     LOC_* of each cell corner
    interface      [Cc, R+1, 2] oriented interface polyline
    side           LOC_NEG or LOC_POS

    Ordering (mirroring the reference):
    - cases 1-3 (NOT both first and last node on side): on-side nodes in
      local order, then the interface (forward for NEG, reversed for POS);
    - case 4 (first and last node both on side): the leading run of on-side
      nodes, the interface, then the trailing run.
    """
    Cc, P, _ = cell_pts.shape
    R1 = interface.shape[1]
    k = jnp.arange(P)[None, :]
    valid = k < cell_npts[:, None]
    onside = (node_loc_cells == side) & valid

    last_idx = (cell_npts - 1).astype(jnp.int32)
    first_on = onside[:, 0]
    last_on = jnp.take_along_axis(onside, last_idx[:, None], axis=1)[:, 0]
    case4 = first_on & last_on

    # leading run: prefix of on-side nodes; trailing run: suffix (padding
    # counts as "on side" for the suffix scan so it doesn't break the run)
    prefix = jnp.cumprod(onside.astype(jnp.int32), axis=1).astype(bool)
    onside_or_pad = onside | ~valid
    suffix = jnp.flip(jnp.cumprod(jnp.flip(
        onside_or_pad.astype(jnp.int32), axis=1), axis=1), axis=1).astype(bool)
    trailing = suffix & onside & ~prefix

    BIG = 10 * (P + R1 + 2)
    key_iface = P + jnp.arange(R1)[None, :]           # after leading nodes
    key_trail = P + R1 + k
    key_nodes = jnp.where(
        onside,
        jnp.where(case4[:, None] & trailing, key_trail, k),
        BIG)

    iface = interface if side == LOC_NEG else jnp.flip(interface, axis=1)
    all_pts = jnp.concatenate([cell_pts, iface], axis=1)     # [Cc, P+R1, 2]
    keys = jnp.concatenate(
        [key_nodes, jnp.broadcast_to(key_iface, (Cc, R1))], axis=1)
    order = jnp.argsort(keys, axis=1)
    tp = jnp.take_along_axis(all_pts, order[..., None].astype(jnp.int32),
                             axis=1)
    count = jnp.sum(onside, axis=1) + R1

    # repeat the last valid point into padding slots (degenerate fan edges)
    slot = jnp.arange(P + R1)[None, :]
    last_pt = jnp.take_along_axis(
        tp, (count - 1)[:, None, None].astype(jnp.int32).repeat(2, -1),
        axis=1)
    tp = jnp.where((slot < count[:, None])[..., None], tp, last_pt)

    return SidePolygon(tp, count.astype(jnp.int32), polygon_barycenter(tp))


def side_cell_rule(poly: SidePolygon, degree: int) -> QuadRule:
    """integrate(msh, cl, degree, where) on cut cells: barycenter fan +
    triangle rule per fan triangle (cuthho_geom.hpp:798-815). Returns
    [Cc, T*Qt] points/weights."""
    return poly_cell_rule(poly.tp, poly.count, poly.bar, degree)


def side_measure(poly: SidePolygon) -> jnp.ndarray:
    """measure(msh, cl, where): total fan-triangle area
    (cuthho_geom.hpp:779-796)."""
    rule = side_cell_rule(poly, 1)
    return jnp.sum(rule.w, axis=-1)


def interface_rule(interface, side_bar, degree: int) -> QuadRule:
    """integrate_interface (cuthho_geom.hpp:851-895): GL per polyline
    segment, with the orientation sign from the side-barycenter probe —
    int_sign = -1 if (p_a - bar) . rot(p_b - p_a) < 0 (:862-870), where
    rot(v) = (v.y, -v.x) and p_a, p_b are the first two polyline points.

    interface: [Cc, R+1, 2]; side_bar: [Cc, 2]. Returns [Cc, R*n].
    """
    pa = interface[:, 0]
    pb = interface[:, 1]
    va = pa - side_bar
    vb_t = pb - pa
    vb = jnp.stack([vb_t[..., 1], -vb_t[..., 0]], axis=-1)
    int_sign = jnp.where(jnp.sum(va * vb, axis=-1) < 0, -1.0, 1.0)

    p0 = interface[:, :-1]    # [Cc, R, 2]
    p1 = interface[:, 1:]
    rule = face_rule(p0, p1, degree)          # pts [Cc, R, n, 2]
    Cc, R, n, _ = rule.pts.shape
    w = rule.w * int_sign[:, None, None]
    return QuadRule(rule.pts.reshape(Cc, R * n, 2), w.reshape(Cc, R * n))


def make_test_points(cell_pts4, phi, side: int, N: int = 10):
    """Reference-grid sample points of each (quad) cell filtered by side
    (make_test_points, cuthho_geom.hpp:898-932): an (N+1)^2 grid mapped
    through the bilinear reference transform, with an on-side mask instead
    of a filtered list (static shapes).

    cell_pts4 [..., 4, 2] -> (pts [..., (N+1)^2, 2], mask [..., (N+1)^2]).
    """
    import numpy as np

    t = np.linspace(-1.0, 1.0, N + 1)
    XI, ETA = np.meshgrid(t, t)
    xi = jnp.asarray(XI.ravel().astype(np_real_dtype()))
    eta = jnp.asarray(ETA.ravel().astype(np_real_dtype()))
    s0 = 0.25 * (1 - xi) * (1 - eta)
    s1 = 0.25 * (1 + xi) * (1 - eta)
    s2 = 0.25 * (1 + xi) * (1 + eta)
    s3 = 0.25 * (1 - xi) * (1 + eta)
    p = (cell_pts4[..., 0, None, :] * s0[:, None] +
         cell_pts4[..., 1, None, :] * s1[:, None] +
         cell_pts4[..., 2, None, :] * s2[:, None] +
         cell_pts4[..., 3, None, :] * s3[:, None])
    v = phi(p)
    mask = (v < 0) if side == LOC_NEG else (v > 0)
    return p, mask


def side_face_rule(face_pts, face_loc, face_isect, fnode0_loc, fnode1_loc,
                   degree: int, side: int) -> QuadRule:
    """integrate(msh, fc, degree, where) (cuthho_geom.hpp:817-849) batched
    over any [..., ] set of faces:

    - faces located on `side`: full GL segment rule;
    - cut faces: GL on the sub-segment between the on-side endpoint and the
      intersection point (points(msh, fc, where), :547-569);
    - other faces: zero weights.

    face_pts [..., 2, 2] endpoint coords (sorted-ptid order); face_loc
    [...]; face_isect [..., 2]; fnode{0,1}_loc [...]: LOC of endpoints.
    """
    cut = face_loc == LOC_CUT
    p0 = face_pts[..., 0, :]
    p1 = face_pts[..., 1, :]
    # on a cut face, replace the endpoint that is NOT on `side`
    p0e = jnp.where((cut & (fnode0_loc != side))[..., None], face_isect, p0)
    p1e = jnp.where((cut & (fnode1_loc != side))[..., None], face_isect, p1)
    rule = face_rule(p0e, p1e, degree)
    live = cut | (face_loc == side)
    return QuadRule(rule.pts, rule.w * live[..., None])
