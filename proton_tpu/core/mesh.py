"""Structure-of-arrays mesh data model (TPU-native replacement for the
reference's object mesh).

The reference stores a mesh as vectors of ``cell``/``face``/``node`` objects
(``src/core/core_bits/basic_mesh.hpp:206-486``) and answers topology queries
with per-element binary searches (``basic_geom.hpp:30-61``). Here the mesh is
a pytree of dense index arrays built once on the host: all topology lookups
become O(1) gathers, and all geometry becomes batched ``jnp`` math over the
whole element set (see :mod:`proton_tpu.core.geometry`).

Conventions mirrored from the reference:

- Point grid is row-major, j (y) outer / i (x) inner
  (``basic_mesh.hpp:239-251``).
- Quad cell point ids are (bl, br, tr, tl), i.e. counter-clockwise
  (``basic_mesh.hpp:257-263``).
- Faces store their two point ids *sorted ascending* and the global face list
  is sorted lexicographically and deduplicated (``basic_mesh.hpp:289-291``);
  face k of a cell joins local points (k, k+1 mod n) (``basic_geom.hpp:194-203``).
- Every boundary face of a generated mesh is DIRICHLET
  (``basic_mesh.hpp:293-297``).

Polygonal meshes are stored padded: ``cell_ptids`` has shape [C, Pmax] with
the last valid point id repeated in the padding slots (degenerate edges then
contribute zero length/area everywhere), plus a ``cell_npts`` count vector.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import np_real_dtype

# boundary condition codes (mirrors the reference `boundary` enum,
# basic_mesh.hpp:105-111)
BND_NONE = 0
BND_DIRICHLET = 1
BND_NEUMANN = 2
BND_ROBIN = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mesh:
    """SoA mesh pytree.

    Dynamic (device) fields:
      points      [P, 2]   point coordinates
      cell_ptids  [C, Pmax] point ids per cell, padded by repeating the last
                           valid id (quad meshes: Pmax == 4, no padding)
      cell_npts   [C]      number of valid points per cell
      cell_faces  [C, Pmax] global face id of local edge k = (pt k, pt k+1);
                           padded slots repeat the last valid face id
      face_ptids  [F, 2]   sorted point ids per face
      face_bnd    [F]      boundary-condition code (BND_*) per face; interior
                           faces are BND_NONE

    Static fields:
      kind        "quad" or "poly" — selects the cell quadrature path
                  (tensor-product GL vs. barycenter fan, quadratures.hpp:311-402)
    """

    points: jax.Array
    cell_ptids: jax.Array
    cell_npts: jax.Array
    cell_faces: jax.Array
    face_ptids: jax.Array
    face_bnd: jax.Array
    kind: str = dataclasses.field(metadata=dict(static=True), default="quad")
    all_quads: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_cells(self) -> int:
        return self.cell_ptids.shape[0]

    @property
    def num_faces(self) -> int:
        return self.face_ptids.shape[0]

    @property
    def max_pts(self) -> int:
        return self.cell_ptids.shape[1]

    def with_points(self, points) -> "Mesh":
        """Same topology, new coordinates (used by cut node displacement)."""
        return dataclasses.replace(self, points=points)


@dataclasses.dataclass(frozen=True)
class MeshInitParams:
    """Domain box + subdivision counts (mirrors mesh_init_params,
    basic_mesh.hpp:178-197; same defaults: 4x4 unit square)."""

    min_x: float = 0.0
    max_x: float = 1.0
    min_y: float = 0.0
    max_y: float = 1.0
    Nx: int = 4
    Ny: int = 4

    @property
    def hx(self) -> float:
        return (self.max_x - self.min_x) / self.Nx

    @property
    def hy(self) -> float:
        return (self.max_y - self.min_y) / self.Ny


def _dedupe_faces(raw_faces: np.ndarray, raw_bnd: np.ndarray):
    """Sort faces lexicographically by (p0, p1), deduplicate, OR boundary
    flags of duplicates (mirrors sort+unique at basic_mesh.hpp:290-291)."""
    uniq, inverse = np.unique(raw_faces, axis=0, return_inverse=True)
    bnd = np.zeros(len(uniq), dtype=np.int8)
    np.maximum.at(bnd, inverse, raw_bnd)
    return uniq, inverse, bnd


def _cell_edges(cell_ptids: np.ndarray, cell_npts: np.ndarray):
    """Edge point-id pairs (local order k -> (pt k, pt k+1 mod npts)),
    returned unsorted-within-pair, with padding slots repeating edge
    (last, last) (degenerate)."""
    C, Pmax = cell_ptids.shape
    k = np.arange(Pmax)[None, :]
    valid = k < cell_npts[:, None]
    i0 = np.minimum(k, cell_npts[:, None] - 1)
    i1 = np.where(k + 1 < cell_npts[:, None], k + 1, 0)
    i1 = np.where(valid, i1, i0)
    p0 = np.take_along_axis(cell_ptids, i0, axis=1)
    p1 = np.take_along_axis(cell_ptids, i1, axis=1)
    return p0, p1, valid


def _build_topology(points: np.ndarray, cell_ptids: np.ndarray,
                    cell_npts: np.ndarray, raw_bnd_fn, kind: str) -> Mesh:
    """Common builder: face extraction, dedup, per-cell face ids. Uses the
    native C++ topology library (native/topology.cpp) when built, with
    this NumPy implementation as the reference fallback."""
    from .. import native_bindings

    C, Pmax = cell_ptids.shape
    p0, p1, valid = _cell_edges(cell_ptids, cell_npts)
    lo = np.minimum(p0, p1)
    hi = np.maximum(p0, p1)
    raw_bnd2d = raw_bnd_fn(lo, hi, valid).astype(np.int8)

    if native_bindings.available():
        uniq, bnd, face_of_edge, _, _ = native_bindings.build_topology(
            cell_ptids, cell_npts, raw_bnd2d)
        rdt = np_real_dtype()
        return Mesh(
            points=jnp.asarray(points.astype(rdt)),
            cell_ptids=jnp.asarray(cell_ptids.astype(np.int32)),
            cell_npts=jnp.asarray(cell_npts.astype(np.int32)),
            cell_faces=jnp.asarray(face_of_edge.astype(np.int32)),
            face_ptids=jnp.asarray(uniq.astype(np.int32)),
            face_bnd=jnp.asarray(bnd),
            kind=kind,
            all_quads=bool((cell_npts == 4).all()),
        )

    raw = np.stack([lo.ravel(), hi.ravel()], axis=1)
    raw_bnd = raw_bnd2d.ravel()
    # degenerate padded edges (lo == hi) must not be emitted as faces: they
    # are filtered by uniquing only valid edges, padding cell_faces after.
    valid_flat = valid.ravel()
    uniq, inverse_valid, bnd = _dedupe_faces(raw[valid_flat], raw_bnd[valid_flat])

    # map every cell edge to its global face id; padded edges repeat the
    # last valid face id of that cell.
    face_of_edge = np.zeros(C * Pmax, dtype=np.int64)
    face_of_edge[valid_flat] = inverse_valid
    face_of_edge = face_of_edge.reshape(C, Pmax)
    k = np.arange(Pmax)[None, :]
    last = np.maximum(cell_npts[:, None] - 1, 0)
    face_of_edge = np.where(k < cell_npts[:, None], face_of_edge,
                            np.take_along_axis(face_of_edge, last, axis=1))

    rdt = np_real_dtype()
    return Mesh(
        points=jnp.asarray(points.astype(rdt)),
        cell_ptids=jnp.asarray(cell_ptids.astype(np.int32)),
        cell_npts=jnp.asarray(cell_npts.astype(np.int32)),
        cell_faces=jnp.asarray(face_of_edge.astype(np.int32)),
        face_ptids=jnp.asarray(uniq.astype(np.int32)),
        face_bnd=jnp.asarray(bnd),
        kind=kind,
        all_quads=bool((cell_npts == 4).all()),
    )


def _structured_arrays(params: MeshInitParams):
    """Point grid + quad connectivity of the structured generator
    (basic_mesh.hpp:230-298)."""
    Nx, Ny = params.Nx, params.Ny
    i = np.arange(Nx + 1)
    j = np.arange(Ny + 1)
    X, Y = np.meshgrid(params.min_x + i * params.hx,
                       params.min_y + j * params.hy)
    points = np.stack([X.ravel(), Y.ravel()], axis=1)

    ci, cj = np.meshgrid(np.arange(Nx), np.arange(Ny))
    ci, cj = ci.ravel(), cj.ravel()
    pt0 = cj * (Nx + 1) + ci
    cell_ptids = np.stack([pt0, pt0 + 1, pt0 + Nx + 2, pt0 + Nx + 1], axis=1)

    def raw_bnd(lo, hi, valid):
        # boundary iff the edge lies on the domain border: both endpoints on
        # the same border line of the structured grid.
        bi_lo, bj_lo = lo % (Nx + 1), lo // (Nx + 1)
        bi_hi, bj_hi = hi % (Nx + 1), hi // (Nx + 1)
        on = ((bj_lo == 0) & (bj_hi == 0)) | ((bj_lo == Ny) & (bj_hi == Ny)) | \
             ((bi_lo == 0) & (bi_hi == 0)) | ((bi_lo == Nx) & (bi_hi == Nx))
        return np.where(on, BND_DIRICHLET, BND_NONE)

    return points, cell_ptids, raw_bnd


def _structured_topology(params: MeshInitParams, kind: str) -> Mesh:
    """Closed-form topology of the structured generator — no sort, no
    dedup, no native call: the sorted-lexicographic face order of
    basic_mesh.hpp:290-291 has an explicit formula on the grid (for
    point p=(j,i), its H-edge precedes its V-edge; edges are ordered by
    their lower point id), so every Mesh index array is pure vectorized
    arithmetic. Identical output to _build_topology (tested), ~50 ms at
    1024^2 where the sort-based builder takes seconds."""
    Nx, Ny = params.Nx, params.Ny
    W = Nx + 1

    i = np.arange(W)
    j = np.arange(Ny + 1)
    X, Y = np.meshgrid(params.min_x + i * params.hx,
                       params.min_y + j * params.hy)
    points = np.stack([X.ravel(), Y.ravel()], axis=1)

    # face index formulas (row stride 2*Nx+1 below the top row)
    def f_H(jj, ii):
        return np.where(jj < Ny, jj * (2 * Nx + 1) + 2 * ii,
                        Ny * (2 * Nx + 1) + ii)

    def f_V(jj, ii):
        return jj * (2 * Nx + 1) + 2 * ii + (ii < Nx)

    ci, cj = np.meshgrid(np.arange(Nx), np.arange(Ny))
    ci, cj = ci.ravel(), cj.ravel()
    pt0 = cj * W + ci
    cell_ptids = np.stack([pt0, pt0 + 1, pt0 + W + 1, pt0 + W], axis=1)
    # local edge order (bottom, right, top, left) = (pt k, pt k+1 mod 4)
    cell_faces = np.stack([f_H(cj, ci), f_V(cj, ci + 1),
                           f_H(cj + 1, ci), f_V(cj, ci)], axis=1)

    F = (Ny + 1) * Nx + Ny * W
    face_ptids = np.zeros((F, 2), dtype=np.int64)
    face_bnd = np.zeros((F,), dtype=np.int8)
    hi_, hj = np.meshgrid(np.arange(Nx), np.arange(Ny + 1))
    hi_, hj = hi_.ravel(), hj.ravel()
    hidx = f_H(hj, hi_)
    hp = hj * W + hi_
    face_ptids[hidx, 0] = hp
    face_ptids[hidx, 1] = hp + 1
    face_bnd[hidx] = np.where((hj == 0) | (hj == Ny), BND_DIRICHLET,
                              BND_NONE)
    vi, vj = np.meshgrid(np.arange(W), np.arange(Ny))
    vi, vj = vi.ravel(), vj.ravel()
    vidx = f_V(vj, vi)
    vp = vj * W + vi
    face_ptids[vidx, 0] = vp
    face_ptids[vidx, 1] = vp + W
    face_bnd[vidx] = np.where((vi == 0) | (vi == Nx), BND_DIRICHLET,
                              BND_NONE)

    rdt = np_real_dtype()
    C = Nx * Ny
    return Mesh(
        points=jnp.asarray(points.astype(rdt)),
        cell_ptids=jnp.asarray(cell_ptids.astype(np.int32)),
        cell_npts=jnp.asarray(np.full(C, 4, dtype=np.int32)),
        cell_faces=jnp.asarray(cell_faces.astype(np.int32)),
        face_ptids=jnp.asarray(face_ptids.astype(np.int32)),
        face_bnd=jnp.asarray(face_bnd),
        kind=kind,
        all_quads=True,
    )


def structured_topology_device(Nx: int, Ny: int):
    """(cell_ptids, cell_npts, cell_faces, face_ptids, face_bnd) of the
    generated Nx x Ny grid as DEVICE int32 arrays (identical values to
    _structured_topology — tested). Shapes are static; everything is
    iota arithmetic, so under jit this fuses to nearly nothing. Points
    are NOT generated here: the classification runs on the host and its
    (displaced) f32 points are shipped, keeping device geometry
    bit-identical to what was classified."""
    W = Nx + 1
    i = jnp.arange(W, dtype=jnp.int32)
    j = jnp.arange(Ny + 1, dtype=jnp.int32)

    def f_H(jj, ii):
        return jnp.where(jj < Ny, jj * (2 * Nx + 1) + 2 * ii,
                         Ny * (2 * Nx + 1) + ii)

    def f_V(jj, ii):
        return jj * (2 * Nx + 1) + 2 * ii + (ii < Nx)

    cj, ci = jnp.meshgrid(jnp.arange(Ny, dtype=jnp.int32),
                          jnp.arange(Nx, dtype=jnp.int32), indexing="ij")
    ci, cj = ci.ravel(), cj.ravel()
    pt0 = cj * W + ci
    cell_ptids = jnp.stack([pt0, pt0 + 1, pt0 + W + 1, pt0 + W], axis=1)
    cell_faces = jnp.stack([f_H(cj, ci), f_V(cj, ci + 1),
                            f_H(cj + 1, ci), f_V(cj, ci)], axis=1)

    F = (Ny + 1) * Nx + Ny * W
    face_ptids = jnp.zeros((F, 2), dtype=jnp.int32)
    face_bnd = jnp.zeros((F,), dtype=jnp.int8)
    hj, hi_ = jnp.meshgrid(jnp.arange(Ny + 1, dtype=jnp.int32),
                           jnp.arange(Nx, dtype=jnp.int32), indexing="ij")
    hj, hi_ = hj.ravel(), hi_.ravel()
    hidx = f_H(hj, hi_)
    hp = hj * W + hi_
    face_ptids = face_ptids.at[hidx, 0].set(hp).at[hidx, 1].set(hp + 1)
    face_bnd = face_bnd.at[hidx].set(
        jnp.where((hj == 0) | (hj == Ny), BND_DIRICHLET,
                  BND_NONE).astype(jnp.int8))
    vj, vi = jnp.meshgrid(jnp.arange(Ny, dtype=jnp.int32),
                          jnp.arange(W, dtype=jnp.int32), indexing="ij")
    vj, vi = vj.ravel(), vi.ravel()
    vidx = f_V(vj, vi)
    vp = vj * W + vi
    face_ptids = face_ptids.at[vidx, 0].set(vp).at[vidx, 1].set(vp + W)
    face_bnd = face_bnd.at[vidx].set(
        jnp.where((vi == 0) | (vi == Nx), BND_DIRICHLET,
                  BND_NONE).astype(jnp.int8))

    C = Nx * Ny
    cell_npts = jnp.full((C,), 4, dtype=jnp.int32)
    return cell_ptids, cell_npts, cell_faces, face_ptids, face_bnd


def make_quad_mesh(params: Optional[MeshInitParams] = None, **kw) -> Mesh:
    """Structured quad mesh of an axis-aligned box (mesh_impl<T,4>,
    basic_mesh.hpp:230-298). Cells come out in the reference's sorted order
    (row-major generation order is already sorted by ptids)."""
    params = params or MeshInitParams(**kw)
    return _structured_topology(params, "quad")


def make_poly_mesh(params: Optional[MeshInitParams] = None, **kw) -> Mesh:
    """Same structured grid stored as a polygonal mesh (mesh_impl<T,0>,
    basic_mesh.hpp:321-403; the optional random jitter there is commented
    out, so geometry is identical to the quad mesh)."""
    params = params or MeshInitParams(**kw)
    return _structured_topology(params, "poly")


def load_poly_mesh(filename: str) -> Mesh:
    """Text-format polygonal mesh loader (mesh_impl<T,0>::mesh_impl(string),
    basic_mesh.hpp:405-475).

    Format: #points; x y per point; #cells; per cell: npts domain ids...;
    #boundary-faces; per face: domain p0 p1 (marked DIRICHLET).
    """
    with open(filename) as fh:
        tokens = fh.read().split()
    pos = 0

    def take(n):
        nonlocal pos
        out = tokens[pos:pos + n]
        pos += n
        return out

    npoints = int(take(1)[0])
    coords = np.array(take(2 * npoints), dtype=np.float64).reshape(npoints, 2)

    ncells = int(take(1)[0])
    cells = []
    for _ in range(ncells):
        n = int(take(1)[0])
        take(1)  # domain id (unused, as in the reference loader)
        cells.append([int(t) for t in take(n)])

    # reference sorts cells by their ptid vectors (basic_mesh.hpp:452)
    cells.sort()
    npts = np.array([len(c) for c in cells], dtype=np.int64)
    Pmax = int(npts.max())
    cell_ptids = np.zeros((ncells, Pmax), dtype=np.int64)
    for ci, c in enumerate(cells):
        cell_ptids[ci, :len(c)] = c
        cell_ptids[ci, len(c):] = c[-1]

    nbnd = int(take(1)[0])
    bnd_pairs = set()
    for _ in range(nbnd):
        take(1)  # domain id
        a, b = int(take(1)[0]), int(take(1)[0])
        bnd_pairs.add((min(a, b), max(a, b)))

    def raw_bnd(lo, hi, valid):
        out = np.zeros_like(lo, dtype=np.int64)
        flat_lo, flat_hi = lo.ravel(), hi.ravel()
        marks = np.array([(int(a), int(b)) in bnd_pairs
                          for a, b in zip(flat_lo, flat_hi)])
        return np.where(marks.reshape(lo.shape), BND_DIRICHLET, BND_NONE)

    return _build_topology(coords, cell_ptids, npts, raw_bnd, "poly")
