"""Microbenchmark of the V-cycle components at bench scale on TPU.

Times (per apply, warm): fine matvec, block-Jacobi, Chebyshev smoother,
cut-patch smoother, transfers, full V-cycle, and one PCG iteration —
to find where the measured ~65 ms/iteration at 1024^2 goes.

Usage: python scripts/vcycle_prof.py [N] [k]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
os.environ.setdefault("PROTON_TPU_X64", "0")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from proton_tpu.core import bases
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.methods import cells_last as cl
from proton_tpu.methods.structured import make_structured_system
from proton_tpu.solvers import multigrid as mgm

hdi = HHODegreeInfo(k + 1, k)
eta = fs.nitsche_eta(k)
problem = fs.default_problem()
fbs = bases.face_basis_size(hdi.face_degree)

print(f"N={N} k={k} fbs={fbs}", flush=True)
t0 = time.perf_counter()
lev = fs.build_level(N, hdi, problem, eta, int_refsteps=4, mixed=False,
                     use_pallas=jax.default_backend() == "tpu",
                     with_rhs=True)
jax.block_until_ready(lev.cond.S)
print(f"build fine: {time.perf_counter()-t0:.1f}s", flush=True)

S_levels, cut_levels = {N: lev.cond.S}, {N: lev.cut_ids}
t0 = time.perf_counter()
for n in fs._mg_sizes(N, 8)[1:]:
    l2 = fs.build_level(n, hdi, problem, eta, int_refsteps=4, mixed=False,
                        use_pallas=jax.default_backend() == "tpu",
                        with_rhs=False)
    S_levels[n] = l2.cond.S
    cut_levels[n] = l2.cut_ids
jax.block_until_ready(S_levels[min(S_levels)])
print(f"build coarse: {time.perf_counter()-t0:.1f}s", flush=True)

sizes = tuple(sorted(S_levels))
S_list = tuple(S_levels[n] for n in sizes)
cut_static = tuple(
    (n, tuple(int(i) for i in fs.expand_ring(cut_levels[n], n, 1)))
    for n in sizes)
stat = dict(sizes=sizes, hdi=hdi, cut_levels=cut_static, mg_coarsest=8,
            cheb_degree=4)

t0 = time.perf_counter()
mgdata = fs._mg_setup_jit(S_list, **stat)
jax.block_until_ready(mgdata.coarse_chol)
print(f"mg setup (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
mgdata = fs._mg_setup_jit(S_list, **stat)
jax.block_until_ready(mgdata.coarse_chol)
print(f"mg setup (warm run): {time.perf_counter()-t0:.3f}s", flush=True)

sys_f = make_structured_system(N, N, fbs)
S_fine = S_levels[N]
cuts = {n: np.asarray(ids, dtype=np.int64) for n, ids in cut_static}

key = jax.random.PRNGKey(0)
x = cl.GridVecCL(
    jax.random.normal(key, (fbs, N + 1, N), jnp.float32),
    jax.random.normal(key, (fbs, N, N + 1), jnp.float32))


def timeit(label, fn, *args, reps=20, static_argnums=()):
    # big arrays go through jit ARGUMENTS (closures over big constants
    # break the axon remote compile with HTTP 413)
    f = jax.jit(fn, static_argnums=static_argnums)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:32s} {dt:8.3f} ms", flush=True)
    return out


# fine matvec
def mv(S, v):
    return cl.make_structured_operator_cl(sys_f, S)(v)


timeit("matvec fine", mv, S_fine, x)

# matvec pieces
nfd = 4 * fbs
timeit("  gather only", lambda v: cl.grid_gather_cl(sys_f, v), x)
xl_pre = jax.jit(lambda v: cl.grid_gather_cl(sys_f, v))(x)
timeit("  matvec_rows only",
       lambda S, z: cl._matvec_rows(S, z, nfd, nfd), S_fine, xl_pre)
timeit("  scatter only", lambda z: cl.grid_scatter_cl(sys_f, z), xl_pre)
timeit("  mask only", lambda v: cl.mask_cl(sys_f, v), x)

# block jacobi
iH, iV = jax.jit(lambda S: cl.block_jacobi_setup_cl(sys_f, S))(S_fine)
timeit("block-jacobi fine",
       lambda ih, iv, v: cl.apply_block_jacobi_cl(ih, iv, v), iH, iV, x)

# chebyshev(4)
lam = jax.jit(lambda S, ih, iv, v: mgm.estimate_lambda_max(
    cl.make_structured_operator_cl(sys_f, S),
    functools.partial(cl.apply_block_jacobi_cl, ih, iv), v))(
        S_fine, iH, iV, x)
lam = jax.block_until_ready(lam)


def cheb(S, ih, iv, lam_, v):
    sm = mgm.make_chebyshev_smoother(
        cl.make_structured_operator_cl(sys_f, S),
        functools.partial(cl.apply_block_jacobi_cl, ih, iv),
        lam_, degree=4)
    return sm(v)


timeit("chebyshev(4) fine", cheb, S_fine, iH, iV, lam, x)

# cut patch smoother
ids_fine = cuts[N]
Binv, wH, wV = jax.jit(lambda S: cl.cut_patch_setup_cl(sys_f, S,
                                                       ids_fine))(S_fine)
print(f"patch cells: {len(ids_fine)}", flush=True)
timeit("cut patch fine",
       lambda b, wh, wv, v: cl.apply_cut_patch_cl(sys_f, ids_fine, b, wh,
                                                  wv, v),
       Binv, wH, wV, x)

# transfers fine<->N/2
nc = sizes[-2]
sys_c = make_structured_system(nc, nc, fbs)
mats = jax.tree.map(jnp.asarray, mgdata.transfers[0])
xc = cl.GridVecCL(
    jax.random.normal(key, (fbs, nc + 1, nc), jnp.float32),
    jax.random.normal(key, (fbs, nc, nc + 1), jnp.float32))
timeit("prolong N/2 -> N",
       lambda m, v: mgm.make_reconstruction_prolongation_cl(
           sys_f, sys_c, hdi, 1.0 / nc, jnp.float32, mats=m)(v), mats, xc)
timeit("restrict N -> N/2",
       lambda m, v: mgm.make_reconstruction_restriction_cl(
           sys_f, sys_c, hdi, 1.0 / nc, jnp.float32, mats=m)(v), mats, x)


# full V-cycle
def vcycle(data, v):
    return mgm.mg_precondition_cl(data, v, N=N, fbs=fbs,
                                  cut_ids_per_level=cuts, coarsest=8,
                                  n_smooth=1, cheb_degree=4, hdi=hdi)


timeit("V-cycle full", vcycle, mgdata, x)


# one PCG iteration ~ matvec + vcycle + axpys/dots
def pcg_iter(data, v):
    av = cl.make_structured_operator_cl(sys_f, data.S[0])(v)
    z = vcycle(data, av)
    num = sum(jnp.vdot(a, b).real for a, b in
              zip(jax.tree.leaves(av), jax.tree.leaves(z)))
    return jax.tree.map(lambda a, b: a + num * b, v, z)


timeit("PCG-iteration shape", pcg_iter, mgdata, x)
