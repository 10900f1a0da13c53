"""Halo-exchange shard_map variant of the structured face-grid solve.

The single-chip hot loop (methods/structured.py) applies the condensed
Schur operator by slice-gather / batched GEMM / shift-scatter on the
H/V face grids. On a multi-chip mesh the same loop shards by *cell
rows*: each device owns a contiguous slab of ``Ny / n_devices`` cell
rows, the cells' condensed blocks, and the face rows beneath them. The
only cross-device coupling is the one H-row between adjacent slabs —
a classic 1-deep halo that rides ICI as a `ppermute` pair per operator
application (one row down for the gather, one partial row up for the
scatter-reduce). Everything else — the batched GEMM, the V-face work,
the CG recurrences — is embarrassingly row-parallel; GSPMD inserts the
psum for the dot products.

Layout trick: the global top boundary H row (index Ny) is Dirichlet-
frozen on the generated box meshes (basic_mesh.hpp:293-297), so it is
dropped from the sharded iterate entirely. Both grids then have
exactly Ny rows and shard evenly; each device's H slab holds the
*bottom* faces of its cells, and the top faces of its last cell row
live on the next device (fetched via the halo) or are the dropped
frozen row (last device).

This is the multi-chip twin of the gather-free structured path — same
stencil, same numbers (tests assert the solution is identical to the
single-device solve) — replacing what NCCL halo exchanges would be in
a torch/CUDA framework (SURVEY.md section 5.8) with jax.shard_map +
lax.ppermute collectives.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from ..config import MATMUL_PRECISION
from ..methods import structured
from ..methods.condensation import CondensedSystem
from ..solvers import cg

ROW_AXIS = "rows"


def _einsum(*args):
    return jnp.einsum(*args, precision=MATMUL_PRECISION)


class HaloGridVec(NamedTuple):
    """Face-grid iterate without the frozen top boundary row: both grids
    have Ny rows, so they shard evenly over the row axis."""

    H: jnp.ndarray   # [Ny, Nx, fbs]   bottom faces of each cell row
    V: jnp.ndarray   # [Ny, Nx+1, fbs]


def make_row_mesh(devices=None) -> DeviceMesh:
    devices = devices if devices is not None else jax.devices()
    return DeviceMesh(np.array(devices), (ROW_AXIS,))


def to_halo(x: structured.GridVec) -> HaloGridVec:
    """Drop the frozen top boundary H row (identically zero in the
    masked iterate)."""
    return HaloGridVec(x.H[:-1], x.V)


def from_halo(x: HaloGridVec) -> structured.GridVec:
    """Re-append the frozen top boundary row as zeros."""
    top = jnp.zeros_like(x.H[:1])
    return structured.GridVec(jnp.concatenate([x.H, top], axis=0), x.V)


def _halo_masks(sys: structured.StructuredFaceSystem):
    """freeH restricted to rows 0..Ny-1 (row 0 frozen), freeV as is."""
    return sys.freeH[:-1], sys.freeV


def shard_system(dmesh: DeviceMesh, sys: structured.StructuredFaceSystem,
                 S, x: HaloGridVec):
    """Place the per-cell Schur blocks and the face grids row-sharded on
    the device mesh. S is [C, 4*fbs, 4*fbs] with cells row-major
    (j * Nx + i), so a leading-axis shard is exactly a cell-row slab."""
    row = NamedSharding(dmesh, P(ROW_AXIS))
    return (jax.device_put(S, row),
            HaloGridVec(jax.device_put(x.H, row), jax.device_put(x.V, row)))


def _local_apply(Sb, xH, xV, fH, fV, n_shards: int, fbs: int):
    """Per-shard Schur operator application with a 1-row halo exchange.

    Runs inside shard_map: all arrays are the device-local row slabs,
    shapes [Nb(, Nx(+1)), ...]. Returns the local slab of A @ x.
    """
    down = [(d + 1, d) for d in range(n_shards - 1)]   # next -> prev
    up = [(d, d + 1) for d in range(n_shards - 1)]     # prev -> next

    mH, mV = fH[..., None], fV[..., None]
    xHm = xH * mH
    xVm = xV * mV

    # gather: bottom faces are local; top faces of the last cell row are
    # the next shard's first H row (frozen zero row for the last shard —
    # ppermute leaves unpaired receivers zero)
    if n_shards > 1:
        top_halo = lax.ppermute(xHm[0], ROW_AXIS, down)
    else:
        top_halo = jnp.zeros_like(xHm[0])
    bottom = xHm
    top = jnp.concatenate([xHm[1:], top_halo[None]], axis=0)
    left = xVm[:, :-1]
    right = xVm[:, 1:]
    loc = jnp.stack([bottom, right, top, left], axis=2)  # [Nb, Nx, 4, fbs]
    Nb, Nx = loc.shape[0], loc.shape[1]
    contrib = _einsum("cij,cj->ci", Sb,
                      loc.reshape(Nb * Nx, 4 * fbs))
    c = contrib.reshape(Nb, Nx, 4, fbs)

    # scatter: bottom contributions land on local rows; top contributions
    # land one row up, the last one on the next shard's first row
    H = c[:, :, 0, :]
    topc = c[:, :, 2, :]
    H = H.at[1:].add(topc[:-1])
    if n_shards > 1:
        from_prev = lax.ppermute(topc[-1], ROW_AXIS, up)
        H = H.at[0].add(from_prev)
    zV = jnp.zeros((Nb, 1, fbs), dtype=c.dtype)
    V = jnp.concatenate([c[:, :, 3, :], zV], axis=1) + \
        jnp.concatenate([zV, c[:, :, 1, :]], axis=1)

    # mask + identity on frozen faces (keeps the operator SPD)
    H = H * mH + xH * (~mH)
    V = V * mV + xV * (~mV)
    return H, V


def make_halo_operator(dmesh: DeviceMesh,
                       sys: structured.StructuredFaceSystem, S):
    """x -> A @ x over row-sharded HaloGridVec, with the halo exchange
    explicit inside shard_map. S: [C, 4*fbs, 4*fbs] row-major cells."""
    n = dmesh.devices.size
    if sys.Ny % n != 0:
        raise ValueError(f"Ny={sys.Ny} not divisible by {n} shards")
    fH, fV = _halo_masks(sys)
    fn = jax.shard_map(
        partial(_local_apply, n_shards=n, fbs=sys.fbs),
        mesh=dmesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS),
                  P(ROW_AXIS), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS), P(ROW_AXIS)))

    def apply_S(x: HaloGridVec) -> HaloGridVec:
        H, V = fn(S, x.H, x.V, fH, fV)
        return HaloGridVec(H, V)

    return apply_S


def halo_diagonal(dmesh: DeviceMesh, sys: structured.StructuredFaceSystem,
                  S) -> HaloGridVec:
    """Jacobi diagonal in the halo layout (cf.
    structured.structured_diagonal); the one cross-shard row is summed
    via the same ppermute pattern."""
    n = dmesh.devices.size
    fH, fV = _halo_masks(sys)

    def local_diag(Sb, fHb, fVb):
        dl = jnp.diagonal(Sb, axis1=1, axis2=2)       # [Cb, 4*fbs]
        Nb = fHb.shape[0]
        Nx = fHb.shape[1]
        fbs = sys.fbs
        c = dl.reshape(Nb, Nx, 4, fbs)
        H = c[:, :, 0, :]
        topc = c[:, :, 2, :]
        H = H.at[1:].add(topc[:-1])
        if n > 1:
            up = [(d, d + 1) for d in range(n - 1)]
            H = H.at[0].add(lax.ppermute(topc[-1], ROW_AXIS, up))
        zV = jnp.zeros((Nb, 1, fbs), dtype=c.dtype)
        V = jnp.concatenate([c[:, :, 3, :], zV], axis=1) + \
            jnp.concatenate([zV, c[:, :, 1, :]], axis=1)
        H = jnp.where(fHb[..., None], H, 1.0)
        V = jnp.where(fVb[..., None], V, 1.0)
        return H, V

    fn = jax.shard_map(
        local_diag, mesh=dmesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS), P(ROW_AXIS)))
    H, V = fn(S, fH, fV)
    return HaloGridVec(H, V)


def solve_condensed_halo(dmesh: DeviceMesh,
                         sys: structured.StructuredFaceSystem,
                         cond: CondensedSystem, g_loc=None,
                         cbs: Optional[int] = None,
                         cg_params: cg.CGParams = cg.CGParams(
                             convergence_threshold=1e-6,
                             divergence_threshold=1e8,
                             max_iter=50000,
                             apply_preconditioner=True)
                         ) -> Tuple[jnp.ndarray, cg.CGResult]:
    """Row-sharded twin of structured.solve_condensed_structured: same
    condensed system, same Jacobi-PCG, the matvec stencil exchanged via
    explicit halos. Returns (local [C, d], CGResult) — identical
    solution to the single-device path (tests assert it)."""
    rhs_full = structured.structured_rhs(sys, cond, g_loc, cbs)
    rhs = to_halo(rhs_full)
    S, rhs = shard_system(dmesh, sys, cond.S, rhs)

    apply_S = make_halo_operator(dmesh, sys, S)
    diag = halo_diagonal(dmesh, sys, S)

    @jax.jit
    def run(rhs, diag):
        return cg.conjugated_gradient(apply_S, rhs, diag, cg_params)

    res = run(rhs, diag)

    fH, _ = _halo_masks(sys)
    xm = HaloGridVec(res.x.H * fH[..., None],
                     res.x.V * sys.freeV[..., None])
    uF = structured.grid_gather(sys, from_halo(xm))
    if g_loc is not None:
        uF = uF + g_loc[:, cbs:]
    rhs_T = cond.fT - _einsum("cij,cj->ci", cond.ATF, uF)
    from ..core.ops import cho_solve_batched
    uT = cho_solve_batched(cond.ATT, rhs_T[..., None])[..., 0]
    local = jnp.concatenate([uT, uF], axis=1)
    return local, res
