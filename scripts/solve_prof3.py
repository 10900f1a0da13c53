"""Pure device throughput of the V-cycle components: each op chained
REPS times inside one jit (lax.fori_loop), so per-call dispatch cost is
amortized away. Usage: python scripts/solve_prof3.py [N]"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_X64", "1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
REPS = 50

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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

key = jax.random.PRNGKey(0)
x = cl.GridVecCL(
    jax.random.normal(key, (fbs, N + 1, N), jnp.float32),
    jax.random.normal(key, (fbs, N, N + 1), jnp.float32))


def force(tree):
    for a in jax.tree.leaves(tree):
        if hasattr(a, "dtype"):
            jax.device_get(jnp.sum(jnp.ravel(a)[:4096]))


def chain_time(label, make_op, *arrs):
    """make_op(*arrs) -> op; time x -> op(x) chained REPS times in one
    jit (renormalized each step to avoid overflow)."""

    @jax.jit
    def run(v, *a):
        op = make_op(*a)

        def body(_, vv):
            w = op(vv)
            s = jax.tree.leaves(w)[0]
            nrm = 1.0 / (jnp.sqrt(jnp.vdot(s, s).real) + 1.0)
            return jax.tree.map(lambda t: t * nrm, w)

        return lax.fori_loop(0, REPS, body, v)

    out = run(x, *arrs)
    force(out)
    t0 = time.perf_counter()
    out = run(x, *arrs)
    force(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:44s} {dt:9.3f} ms/apply", flush=True)


iHu, iVu = cl.uniform_block_jacobi_blocks(sys_f, S_u)
hf, vf = jax.jit(lambda dS: cl.uniform_face_block_deltas(
    sys_f, dS, irr))(cond.dS)
corrH, corrV = jax.jit(
    lambda h, v: cl.uniform_bj_from_deltas(sys_f, S_u, h, v,
                                           jnp.float32))(hf, vf)
ring = fs.expand_ring(cut_ids, N, 1)
pb = jax.jit(lambda dS: cl.uniform_patch_setup_lean(
    sys_f, S_u, dS, irr, ring, jnp.float32))(cond.dS)

chain_time("stencil only",
           lambda: cl.make_uniform_operator_cl(
               sys_f, S_u.astype(np.float32)))
chain_time("stencil + correction",
           lambda dS: cl.make_uniform_operator_cl(
               sys_f, S_u.astype(np.float32), irr, dS), cond.dS)
chain_time("block-jacobi",
           lambda cH, cV: cl.make_uniform_block_jacobi_cl(
               sys_f, iHu.astype(jnp.float32), iVu.astype(jnp.float32),
               cH, cV), corrH, corrV)
chain_time("patch apply",
           lambda *blk: functools.partial(cl.apply_cut_patch_cl, sys_f,
                                          ring, *blk), *pb)

nc = N // 2
sys_c = make_structured_system(nc, nc, fbs)
mats = jax.tree.map(jnp.asarray,
                    mgm._transfer_slot_matrices(hdi, 1.0 / nc,
                                                jnp.float32))
chain_time("restrict+prolong roundtrip",
           lambda m: (lambda v: mgm.make_reconstruction_prolongation_cl(
               sys_f, sys_c, hdi, 1.0 / nc, jnp.float32, mats=m)(
                   mgm.make_reconstruction_restriction_cl(
                       sys_f, sys_c, hdi, 1.0 / nc, jnp.float32,
                       mats=m)(v))), mats)


def cheb_op(dS, cH, cV):
    ap = cl.make_uniform_operator_cl(sys_f, S_u.astype(np.float32), irr,
                                     dS)
    base = cl.make_uniform_block_jacobi_cl(
        sys_f, iHu.astype(jnp.float32), iVu.astype(jnp.float32), cH, cV)
    lam = jnp.float32(2.0)
    return mgm.make_chebyshev_smoother(ap, base, lam, degree=4)


chain_time("chebyshev(4) smoother", cheb_op, cond.dS, corrH, corrV)
print("done", flush=True)
