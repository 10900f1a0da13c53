"""Global assembly as gather / batched-GEMM / segment-sum scatter
(replaces assembler<Mesh>, src/methods/hho_bits/hho.hpp:252-463).

The reference pushes Eigen triplets per cell and finalizes a SparseMatrix;
its DOF layout is: all cell dofs [0, C*cbs), then non-Dirichlet face dofs
ordered by a compress table that skips Dirichlet faces (hho.hpp:298-335).
We keep the *same layout* but represent the operator matrix-free: the local
matrices lc [C, d, d] stay on device, and A @ x is

    gather  x_loc = x_ext[asm_idx]          (Dirichlet slots read 0)
    batched y_loc = lc @ x_loc              (one big MXU GEMM)
    scatter y     = segment_sum(y_loc)      (Dirichlet rows drop into a
                                             sentinel bin)

Dirichlet condensation (hho.hpp:368-405) becomes one masked einsum: the
boundary data g is L2-projected per Dirichlet face, laid out locally, and
RHS -= lc @ g_loc is scattered with the same index map.

An explicit BCOO export is provided for tests/IO parity with
dump_sparse_matrix (utils.hpp:376-386).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..core import bases
from ..core.mesh import BND_DIRICHLET
from ..core.ops import HHODegreeInfo, cho_solve_batched, face_mass_matrices, face_rhs


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FaceIncidence:
    """Transpose of the cell->face map, for gather-based operator
    application (TPU: gathers are far cheaper than segment_sum scatters in
    the CG hot loop).

    face_cells [F, 2]: the (<= 2) cells owning each face; missing -> C.
    face_slot  [F, 2]: the local edge index of the face within that cell.
    expand    [n_other_faces]: face id of each compressed free face
    (the assembler's expand_table, hho.hpp:310-323).
    """

    face_cells: jax.Array
    face_slot: jax.Array
    expand: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DofMap:
    """Local-to-global DOF index map with Dirichlet masking.

    asm_idx [C, d]: global dof of each local dof, with Dirichlet face dofs
    (and padded face slots) pointing at the sentinel index ``n_dofs`` so
    gathers read 0 and scatters drop.
    free_local [C, d]: True where the local dof is a real assembled dof.
    dirichlet_local [C, d]: True where the local dof sits on a Dirichlet
    face (the slots that receive boundary data).
    face_compress [F]: compressed index of non-Dirichlet faces
    (hho.hpp:313-323); junk for Dirichlet faces.
    """

    asm_idx: jax.Array
    free_local: jax.Array
    dirichlet_local: jax.Array
    face_compress: jax.Array
    is_dirichlet_face: jax.Array
    cbs: int = dataclasses.field(metadata=dict(static=True), default=0)
    fbs: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_cells: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_dofs: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def d(self) -> int:
        return self.asm_idx.shape[1]


def build_dofmap_structured(N: int, hdi: HHODegreeInfo) -> DofMap:
    """DofMap of the generated N x N mesh built ENTIRELY on the host
    (closed-form topology) and shipped once. build_dofmap on a
    device-resident mesh first downloads cell_faces/face_bnd over the
    transport — on the remote-TPU tunnel that download is orders of
    magnitude slower than rebuilding the topology on the host (measured
    137 s vs 2.6 s at 1024^2)."""
    from ..core.mesh import make_poly_mesh

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        dm = build_dofmap(make_poly_mesh(Nx=N, Ny=N), hdi)
    if jax.default_backend() != "cpu":
        dm = jax.device_put(dm, jax.devices()[0])
    return dm


def build_dofmap(mesh, hdi: HHODegreeInfo) -> DofMap:
    """Host-side construction of the assembler tables (assembler ctor,
    hho.hpp:298-335)."""
    cbs = bases.cell_basis_size(hdi.cell_degree)
    fbs = bases.face_basis_size(hdi.face_degree)
    C = mesh.num_cells
    F = mesh.num_faces
    nF = mesh.max_pts
    d = cbs + nF * fbs

    face_bnd = np.asarray(mesh.face_bnd)
    is_dir = face_bnd == BND_DIRICHLET
    compress = np.cumsum(~is_dir) - 1  # compressed id of non-Dirichlet faces
    n_other = int((~is_dir).sum())
    n_dofs = C * cbs + n_other * fbs

    cell_faces = np.asarray(mesh.cell_faces)          # [C, nF]
    edge_valid = (np.arange(nF)[None, :] <
                  np.asarray(mesh.cell_npts)[:, None])  # [C, nF]

    asm_idx = np.empty((C, d), dtype=np.int64)
    asm_idx[:, :cbs] = (np.arange(C)[:, None] * cbs + np.arange(cbs)[None, :])

    face_dof_base = C * cbs + compress[cell_faces] * fbs   # [C, nF]
    face_idx = face_dof_base[:, :, None] + np.arange(fbs)[None, None, :]
    dir_face = is_dir[cell_faces]                          # [C, nF]
    dead = dir_face | ~edge_valid
    face_idx = np.where(dead[:, :, None], n_dofs, face_idx)
    asm_idx[:, cbs:] = face_idx.reshape(C, nF * fbs)

    free_local = asm_idx < n_dofs
    dirichlet_local = np.zeros((C, d), dtype=bool)
    dirichlet_local[:, cbs:] = np.repeat(
        (dir_face & edge_valid), fbs, axis=1)

    return DofMap(
        asm_idx=jnp.asarray(asm_idx.astype(np.int32)),
        free_local=jnp.asarray(free_local),
        dirichlet_local=jnp.asarray(dirichlet_local),
        face_compress=jnp.asarray(compress.astype(np.int32)),
        is_dirichlet_face=jnp.asarray(is_dir),
        cbs=cbs, fbs=fbs, n_cells=C, n_dofs=int(n_dofs),
    )


def dirichlet_face_data(mesh, hdi: HHODegreeInfo, bc_fn):
    """L2-projection of the boundary function onto every face's basis
    [F, fbs] (the per-Dirichlet-face solves at hho.hpp:381-386); only the
    Dirichlet rows are ever read."""
    fpts = mesh.points[mesh.face_ptids]  # [F, 2, 2]
    mass = face_mass_matrices(fpts, hdi.face_degree)
    rhs = face_rhs(fpts, hdi.face_degree, bc_fn)
    return cho_solve_batched(mass, rhs[..., None])[..., 0]


def local_dirichlet_data(dofmap: DofMap, mesh, face_data):
    """Scatter the per-face boundary projections into local layout
    g_loc [C, d]: zeros except on Dirichlet face slots (dirichlet_data in
    hho.hpp:368-387)."""
    C, d = dofmap.asm_idx.shape
    nF = mesh.max_pts
    g_faces = face_data[mesh.cell_faces].reshape(C, nF * dofmap.fbs)
    g_loc = jnp.concatenate(
        [jnp.zeros((C, dofmap.cbs), dtype=face_data.dtype), g_faces], axis=1)
    return jnp.where(dofmap.dirichlet_local, g_loc, 0.0)


def _scatter(dofmap: DofMap, values_loc):
    """segment-sum local values [C, d] into the global vector, dropping
    Dirichlet/padded slots via the sentinel bin."""
    y = jax.ops.segment_sum(values_loc.reshape(-1),
                            dofmap.asm_idx.reshape(-1),
                            num_segments=dofmap.n_dofs + 1)
    return y[:dofmap.n_dofs]


def gather_local(dofmap: DofMap, x):
    """x_loc [C, d] with zeros in Dirichlet/padded slots."""
    x_ext = jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])
    return x_ext[dofmap.asm_idx]


def make_operator(dofmap: DofMap, lc):
    """Matrix-free SPD operator A(x) from local matrices lc [C, d, d]."""

    def apply_A(x):
        x_loc = gather_local(dofmap, x)
        y_loc = _einsum("cij,cj->ci", lc, x_loc)
        return _scatter(dofmap, y_loc)

    return apply_A


def operator_diagonal(dofmap: DofMap, lc):
    """diag(A) for the Jacobi preconditioner (solver_cg.hpp:78-81)."""
    d_loc = jnp.diagonal(lc, axis1=1, axis2=2)
    return _scatter(dofmap, d_loc)


def assemble_rhs(dofmap: DofMap, cell_loads, lc, g_loc=None):
    """Global RHS [n_dofs]: cell load vectors [C, cbs] land on cell dofs
    (hho.hpp:405) and Dirichlet data is folded in as RHS -= lc @ g_loc
    (hho.hpp:396-402)."""
    C, d = dofmap.asm_idx.shape
    loads = jnp.zeros((C, d), dtype=cell_loads.dtype)
    loads = loads.at[:, :cell_loads.shape[1]].set(cell_loads)
    if g_loc is not None:
        loads = loads - _einsum("cij,cj->ci", lc, g_loc)
    return _scatter(dofmap, loads)


def take_local_data(dofmap: DofMap, solution, g_loc=None):
    """Per-cell solution vectors [C, d] from the condensed global solution,
    re-inserting Dirichlet data (take_local_data, hho.hpp:408-449)."""
    x_loc = gather_local(dofmap, solution)
    if g_loc is not None:
        x_loc = x_loc + g_loc
    return x_loc


def build_face_incidence(mesh, dofmap: DofMap) -> FaceIncidence:
    """Host-side transpose of cell_faces for gather-based apply."""
    C, nF = np.asarray(mesh.cell_faces).shape
    F = mesh.num_faces
    cell_faces = np.asarray(mesh.cell_faces)
    edge_valid = (np.arange(nF)[None, :] <
                  np.asarray(mesh.cell_npts)[:, None])
    f_flat = cell_faces[edge_valid]
    c_flat = np.broadcast_to(np.arange(C)[:, None], (C, nF))[edge_valid]
    k_flat = np.broadcast_to(np.arange(nF)[None, :], (C, nF))[edge_valid]
    order = np.argsort(f_flat, kind="stable")
    fs, cs, ks = f_flat[order], c_flat[order], k_flat[order]
    first = np.concatenate([[True], fs[1:] != fs[:-1]])
    group_start = np.maximum.accumulate(np.where(first,
                                                 np.arange(len(fs)), 0))
    occ = np.arange(len(fs)) - group_start         # 0 or 1 per entry
    face_cells = np.full((F, 2), C, dtype=np.int64)
    face_slot = np.zeros((F, 2), dtype=np.int64)
    face_cells[fs, occ] = cs
    face_slot[fs, occ] = ks
    expand = np.nonzero(~np.asarray(dofmap.is_dirichlet_face))[0]
    return FaceIncidence(jnp.asarray(face_cells.astype(np.int32)),
                         jnp.asarray(face_slot.astype(np.int32)),
                         jnp.asarray(expand.astype(np.int32)))


def make_gather_operator(dofmap: DofMap, inc: FaceIncidence, lc):
    """A @ x with no scatter: cell rows are written directly (cell dofs
    belong to exactly one cell) and face rows gather the <= 2 owning
    cells' contributions through the FaceIncidence transpose. Hot path of
    the TPU CG solve."""
    C, d = dofmap.asm_idx.shape
    cbs, fbs = dofmap.cbs, dofmap.fbs

    def apply_A(x):
        x_loc = gather_local(dofmap, x)
        contrib = _einsum("cij,cj->ci", lc, x_loc)            # [C, d]
        y_cells = contrib[:, :cbs].reshape(C * cbs)
        contrib_ext = jnp.concatenate(
            [contrib, jnp.zeros((1, d), dtype=contrib.dtype)])
        fvals = 0.0
        for copy in range(2):
            cells = inc.face_cells[:, copy]                   # [F]
            base = cbs + inc.face_slot[:, copy] * fbs         # [F]
            idx = base[:, None] + jnp.arange(fbs)[None, :]    # [F, fbs]
            fvals = fvals + contrib_ext[cells[:, None], idx]
        y_faces = fvals[inc.expand].reshape(-1)
        return jnp.concatenate([y_cells, y_faces])

    return apply_A


# ---------------------------------------------------------------------------
# Generic multi-block machinery (used by the doubled-dof interface
# assembler, cuthho_square.cpp:1091-1443, and any custom DOF layout):
# a "block" is (asm_idx [n, d], lc [n, d, d]) with the same sentinel
# convention (index == n_dofs -> dropped).
# ---------------------------------------------------------------------------

def scatter_values(asm_idx, n_dofs: int, values):
    y = jax.ops.segment_sum(values.reshape(-1), asm_idx.reshape(-1),
                            num_segments=n_dofs + 1)
    return y[:n_dofs]


def gather_values(asm_idx, x):
    x_ext = jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])
    return x_ext[asm_idx]


def make_multi_operator(n_dofs: int, blocks):
    """Matrix-free operator from several (asm_idx, lc) blocks."""

    def apply_A(x):
        y = jnp.zeros((n_dofs,), dtype=x.dtype)
        for asm_idx, lc in blocks:
            xl = gather_values(asm_idx, x)
            yl = _einsum("cij,cj->ci", lc, xl)
            y = y + scatter_values(asm_idx, n_dofs, yl)
        return y

    return apply_A


def multi_operator_diagonal(n_dofs: int, blocks):
    d = jnp.zeros((n_dofs,))
    for asm_idx, lc in blocks:
        dl = jnp.diagonal(lc, axis1=1, axis2=2)
        d = d + scatter_values(asm_idx, n_dofs, dl)
    return d


def multi_assemble_rhs(n_dofs: int, contributions):
    """Global RHS from (asm_idx [n, d], values [n, d]) contributions."""
    rhs = jnp.zeros((n_dofs,))
    for asm_idx, vals in contributions:
        rhs = rhs + scatter_values(asm_idx, n_dofs, vals)
    return rhs


def assemble_bcoo(dofmap: DofMap, lc):
    """Explicit sparse matrix (BCOO) of the condensed system — for tests,
    diagnostics and dump parity (utils.hpp:376-386). Duplicate entries are
    summed; Dirichlet rows/cols are dropped."""
    from jax.experimental import sparse as jsparse

    C, d = dofmap.asm_idx.shape
    rows = jnp.broadcast_to(dofmap.asm_idx[:, :, None], (C, d, d))
    cols = jnp.broadcast_to(dofmap.asm_idx[:, None, :], (C, d, d))
    keep = (rows < dofmap.n_dofs) & (cols < dofmap.n_dofs)
    vals = jnp.where(keep, lc, 0.0).reshape(-1)
    idx = jnp.stack([jnp.minimum(rows, dofmap.n_dofs - 1).reshape(-1),
                     jnp.minimum(cols, dofmap.n_dofs - 1).reshape(-1)],
                    axis=1)
    mat = jsparse.BCOO((vals, idx),
                       shape=(dofmap.n_dofs, dofmap.n_dofs))
    return mat.sum_duplicates()
