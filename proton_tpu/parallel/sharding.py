"""Multi-chip data-parallel solve: shard the element batch over a device
mesh (SURVEY.md section 5.7/5.8: per-element assembly has zero
cross-element communication; only the Krylov solve reduces globally).

Strategy: the [C, ...] cell arrays (and the local matrices lc) are sharded
along a 1-D ``cells`` mesh axis with jax.sharding; the condensed global DOF
vector stays replicated. Under jit, XLA inserts the collectives: the
batched local GEMM of A @ x runs fully sharded, and the face scatter
reduces across shards (faces on shard boundaries ride an ICI psum /
all-reduce). Dot products in CG reduce over the replicated vector for
free.

This mirrors what NCCL/MPI would do in a torch/CUDA framework — but here
it is only sharding annotations; the solver code is unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from ..core.ops import HHODegreeInfo
from ..methods import assembly
from ..solvers import cg

CELL_AXIS = "cells"


def make_device_mesh(devices=None) -> DeviceMesh:
    devices = devices if devices is not None else jax.devices()
    return DeviceMesh(np.array(devices), (CELL_AXIS,))


def shard_cells(dmesh: DeviceMesh, tree):
    """Shard every array in the pytree along its leading (cell) axis."""
    def put(a):
        spec = P(CELL_AXIS) if a.ndim >= 1 else P()
        return jax.device_put(a, NamedSharding(dmesh, spec))
    return jax.tree.map(put, tree)


def replicate(dmesh: DeviceMesh, tree):
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(dmesh, P())), tree)


def pad_cells_to_multiple(mesh_arrays, n: int):
    """Pad cell-count C to a multiple of n devices by repeating the last
    cell's rows (the padded copies scatter into the sentinel bin, so they
    do not perturb the system)."""
    import dataclasses

    C = mesh_arrays.cell_ptids.shape[0]
    rem = (-C) % n
    if rem == 0:
        return mesh_arrays, C

    def pad(a):
        return jnp.concatenate([a, jnp.repeat(a[-1:], rem, axis=0)], axis=0)

    padded = dataclasses.replace(
        mesh_arrays,
        cell_ptids=pad(mesh_arrays.cell_ptids),
        cell_npts=pad(mesh_arrays.cell_npts),
        cell_faces=pad(mesh_arrays.cell_faces))
    return padded, C


def sharded_solve(dmesh: DeviceMesh, dofmap: assembly.DofMap, lc,
                  rhs, cg_params: cg.CGParams):
    """PCG with lc sharded over cells and the DOF vector replicated.

    The padded cells appended by pad_cells_to_multiple must already carry
    sentinel rows in ``dofmap.asm_idx`` (use build_dofmap_padded below).
    """
    lc = shard_cells(dmesh, lc)
    dofmap = jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(dmesh,
                             P(CELL_AXIS) if (a.ndim >= 1 and
                                              a.shape[0] == lc.shape[0])
                             else P())), dofmap)
    rhs = replicate(dmesh, rhs)

    @jax.jit
    def run(lc, rhs):
        apply_A = assembly.make_operator(dofmap, lc)
        diag = assembly.operator_diagonal(dofmap, lc)
        return cg.conjugated_gradient(apply_A, rhs, diag, cg_params)

    return run(lc, rhs)


def build_dofmap_padded(mesh, hdi: HHODegreeInfo, n_devices: int):
    """DofMap whose cell count is padded to a multiple of n_devices; the
    padded cells' rows are all sentinel (they read zeros and scatter into
    the dropped bin)."""
    dm = assembly.build_dofmap(mesh, hdi)
    C, d = dm.asm_idx.shape
    rem = (-C) % n_devices
    if rem == 0:
        return dm, C
    import dataclasses

    sentinel_rows = jnp.full((rem, d), dm.n_dofs, dtype=dm.asm_idx.dtype)
    return dataclasses.replace(
        dm,
        asm_idx=jnp.concatenate([dm.asm_idx, sentinel_rows]),
        free_local=jnp.concatenate(
            [dm.free_local, jnp.zeros((rem, d), dtype=bool)]),
        dirichlet_local=jnp.concatenate(
            [dm.dirichlet_local, jnp.zeros((rem, d), dtype=bool)]),
        n_cells=C + rem,
    ), C
