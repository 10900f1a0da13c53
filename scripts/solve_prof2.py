"""Component split of the 6 ms uniform matvec + V-cycle pieces at
1024^2: pure stencil vs irregular correction vs bj vs patch vs
transfers. Usage: python scripts/solve_prof2.py [N]"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_X64", "1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from proton_tpu.core import bases
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.methods import cells_last as cl
from proton_tpu.methods.structured import make_structured_system
from proton_tpu.solvers import multigrid as mgm

k = 1
hdi = HHODegreeInfo(k + 1, k)
eta = fs.nitsche_eta(k)
problem = fs.default_problem()
fbs = bases.face_basis_size(hdi.face_degree)
nfd = 4 * fbs

jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = fs._classify_host(
    N, hdi, problem, 4, True)
geom = jax.jit(cell_geometry)(mesh)
unit_host = fs._unit_cell_host(hdi, 1.0 / N)
irr = np.union1d(dist_ids, np.asarray(cut_ids))
unit = tuple(jnp.asarray(a, jnp.float32) for a in unit_host)
cond = fs._assemble_level_uniform_lean(
    mesh, geom, cell_loc, batch, jnp.asarray(dist_ids, dtype=jnp.int32),
    jnp.asarray(irr, dtype=jnp.int32), unit, hdi, problem, eta,
    with_rhs=True)
S_u = np.asarray(unit_host[0], np.float64)
sys_f = make_structured_system(N, N, fbs)
print(f"irr columns: {len(irr)}", flush=True)

key = jax.random.PRNGKey(0)
x = cl.GridVecCL(
    jax.random.normal(key, (fbs, N + 1, N), jnp.float32),
    jax.random.normal(key, (fbs, N, N + 1), jnp.float32))


def force(tree):
    for a in jax.tree.leaves(tree):
        if hasattr(a, "dtype"):
            jax.device_get(jnp.sum(jnp.ravel(a)[:4096]))


def timeit(label, f, *args, reps=20):
    out = f(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    force(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s} {dt:9.3f} ms", flush=True)


@jax.jit
def stencil_only(v):
    return cl.make_uniform_operator_cl(sys_f, S_u.astype(np.float32))(v)


@jax.jit
def stencil_corr(dS, v):
    return cl.make_uniform_operator_cl(sys_f, S_u.astype(np.float32),
                                       irr, dS)(v)


jj = jnp.asarray(irr // N, jnp.int32)
ii = jnp.asarray(irr % N, jnp.int32)


@jax.jit
def corr_only(dS, v):
    H = v.H * sys_f.freeH[None]
    V = v.V * sys_f.freeV[None]
    xli = jnp.concatenate([H[:, jj, ii], V[:, jj, ii + 1],
                           H[:, jj + 1, ii], V[:, jj, ii]], axis=0)
    ci = cl._matvec_rows(dS, xli, nfd, nfd).reshape(4, fbs, -1)
    yH = jnp.zeros_like(v.H).at[:, jj, ii].add(ci[0]).at[
        :, jj + 1, ii].add(ci[2])
    yV = jnp.zeros_like(v.V).at[:, jj, ii].add(ci[3]).at[
        :, jj, ii + 1].add(ci[1])
    return cl.GridVecCL(yH, yV)


iHu, iVu = cl.uniform_block_jacobi_blocks(sys_f, S_u)
hf, vf = jax.jit(lambda dS: cl.uniform_face_block_deltas(
    sys_f, dS, irr))(cond.dS)
corrH, corrV = jax.jit(
    lambda h, v: cl.uniform_bj_from_deltas(sys_f, S_u, h, v,
                                           jnp.float32))(hf, vf)


@jax.jit
def bj_apply(cH, cV, v):
    return cl.make_uniform_block_jacobi_cl(
        sys_f, iHu.astype(jnp.float32), iVu.astype(jnp.float32),
        cH, cV)(v)


ring = fs.expand_ring(cut_ids, N, 1)
pb = jax.jit(lambda dS: cl.uniform_patch_setup_lean(
    sys_f, S_u, dS, irr, ring, jnp.float32))(cond.dS)
print(f"patch cells: {len(ring)}", flush=True)


@jax.jit
def patch_apply(blk, v):
    return cl.apply_cut_patch_cl(sys_f, ring, *blk, v)


nc = N // 2
sys_c = make_structured_system(nc, nc, fbs)
mats = mgm._transfer_slot_matrices(hdi, 1.0 / nc, jnp.float32)
mats = jax.tree.map(jnp.asarray, mats)
xc = cl.GridVecCL(
    jax.random.normal(key, (fbs, nc + 1, nc), jnp.float32),
    jax.random.normal(key, (fbs, nc, nc + 1), jnp.float32))


@jax.jit
def prol(m, v):
    return mgm.make_reconstruction_prolongation_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float32, mats=m)(v)


@jax.jit
def restr(m, v):
    return mgm.make_reconstruction_restriction_cl(
        sys_f, sys_c, hdi, 1.0 / nc, jnp.float32, mats=m)(v)


timeit("stencil only", stencil_only, x)
timeit("stencil + correction", stencil_corr, cond.dS, x)
timeit("correction only", corr_only, cond.dS, x)
timeit("block-jacobi (uniform+corr)", bj_apply, corrH, corrV, x)
timeit("patch apply", patch_apply, pb, x)
timeit("prolong N/2 -> N", prol, mats, xc)
timeit("restrict N -> N/2", restr, mats, x)
print("done", flush=True)
