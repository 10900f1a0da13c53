"""Warm profile of the bench solve path at 1024^2 k=1 mixed (lean
uniform system, segmented mixed-f32 CG, MG V-cycle preconditioner).

Times, with true scalar-fetch barriers: coarse hierarchy build,
_mg_setup_jit (warm), _rhs_jit, one 50-iteration CG segment (warm,
-> ms/iteration), the V-cycle alone, and the uniform matvec alone.

Usage: python scripts/solve_prof.py [N]
"""
import dataclasses
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
from proton_tpu.methods import assembly, cells_last as cl
from proton_tpu.methods.structured import make_structured_system
from proton_tpu.solvers import cg, multigrid as mgm

k = 1
hdi = HHODegreeInfo(k + 1, k)
eta = fs.nitsche_eta(k)
problem = fs.default_problem()
fbs = bases.face_basis_size(hdi.face_degree)


def force(tree):
    for a in jax.tree.leaves(tree):
        if hasattr(a, "dtype"):
            jax.device_get(jnp.sum(jnp.ravel(a)[:4096]))


def tick(label, t0):
    print(f"{label:44s} {time.perf_counter()-t0:9.3f} s", flush=True)


jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))

t0 = time.perf_counter()
mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = fs._classify_host(
    N, hdi, problem, 4, True)
geom = jax.jit(cell_geometry)(mesh)
dofmap = assembly.build_dofmap_structured(N, hdi)
force((geom.bar, batch.interface))
tick("classify_host fine + geom", t0)

t0 = time.perf_counter()
unit_host = fs._unit_cell_host(hdi, 1.0 / N)
irr = np.union1d(dist_ids, np.asarray(cut_ids))
unit = tuple(jnp.asarray(a, jnp.float32) for a in unit_host)
cond = fs._assemble_level_uniform_lean(
    mesh, geom, cell_loc, batch, jnp.asarray(dist_ids, dtype=jnp.int32),
    jnp.asarray(irr, dtype=jnp.int32), unit, hdi, problem, eta,
    with_rhs=True)
sub = fs._cut64_condensed(batch, hdi, problem, eta, with_rhs=True)
cond = fs._set_cells_lean(cond, unit[0].reshape(-1, 1),
                          jnp.asarray(irr, dtype=jnp.int32),
                          jnp.asarray(cut_ids, dtype=jnp.int32), sub)
force(cond)
tick("fine uniform-lean assembly (warm?)", t0)

levels = {N: fs.LevelData(mesh, None, cut_ids, cond,
                          np.asarray(unit_host[0], np.float64), irr,
                          batch, cell_loc)}
t0 = time.perf_counter()
S_levels, cut_levels = {N: cond.dS}, {N: cut_ids}
for n in fs._mg_sizes(N, 8)[1:]:
    tl = time.perf_counter()
    lev = fs.build_level(n, hdi, problem, eta, int_refsteps=4,
                         mixed=False, use_pallas=True, with_rhs=False,
                         fitted="lean")
    levels[n] = lev
    S_levels[n] = lev.cond.dS.astype(jnp.float32)
    cut_levels[n] = lev.cut_ids
    force(S_levels[n])
    tick(f"  coarse level n={n}", tl)
tick("coarse hierarchy total", t0)

sizes = tuple(sorted(S_levels))
S_list = tuple(S_levels[n] for n in sizes)
cut_static = tuple(
    (n, tuple(int(i) for i in fs.expand_ring(cut_levels[n], n, 1)))
    for n in sizes)
uniform_levels = fs.uniform_static(levels)
stat = dict(sizes=sizes, hdi=hdi, cut_levels=cut_static, mg_coarsest=8,
            cheb_degree=4, patch_colors=1, uniform_levels=uniform_levels)

for rep in range(3):
    t0 = time.perf_counter()
    mgdata = fs._mg_setup_jit(S_list, **stat)
    force(mgdata.coarse_chol)
    force(mgdata.lam)
    tick(f"_mg_setup_jit rep {rep}", t0)

for rep in range(2):
    t0 = time.perf_counter()
    rhs, gF_cl = fs._rhs_jit(mesh, dofmap, cond, sizes=sizes, hdi=hdi,
                             problem=problem,
                             uniform_levels=uniform_levels)
    force(rhs)
    tick(f"_rhs_jit rep {rep}", t0)

cgp = cg.CGParams(convergence_threshold=1e-6, divergence_threshold=1e8,
                  max_iter=50, apply_preconditioner=True,
                  recompute_every=0)
x = nr0 = None
for seg in range(4):
    t0 = time.perf_counter()
    x, it, ex, rel, nr0 = fs._cg_seg_jit(
        cond.dS, mgdata, rhs, x, nr0, n_smooth=1, cg_params=cgp, **stat)
    force(x)
    dt = time.perf_counter() - t0
    print(f"segment {seg}: {int(it)} iters in {dt:.3f} s "
          f"({dt/max(int(it),1)*1e3:.2f} ms/iter) rel={float(rel):.3e}",
          flush=True)

# V-cycle alone + uniform matvec alone (fresh small jits)
uni = fs._uniform_unpack(uniform_levels)
cuts = {n: np.asarray(ids, dtype=np.int64) for n, ids in cut_static}
sys_f = make_structured_system(N, N, fbs)
S_u, irr_u = uni[N]


@jax.jit
def vcycle(mgd, r):
    return mgm.mg_precondition_cl(mgd, r, N=N, fbs=fbs,
                                  cut_ids_per_level=cuts, coarsest=8,
                                  n_smooth=1, cheb_degree=4,
                                  patch_colors=1, hdi=hdi,
                                  uniform_per_level=uni)


@jax.jit
def matvec(dS, r):
    return cl.make_uniform_operator_cl(sys_f, S_u.astype(jnp.float32),
                                       irr_u, dS)(r)


def timeit(label, f, *args, reps=10):
    out = f(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    force(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s} {dt:9.3f} ms", flush=True)


t0 = time.perf_counter()
timeit("V-cycle apply", vcycle, mgdata, rhs)
timeit("uniform matvec apply", matvec, cond.dS, rhs)
print("done", flush=True)
