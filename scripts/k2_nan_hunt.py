"""Locate the NaN in the k=2 1024^2 mixed bench h1_error: rebuild the
exact bench pipeline (cached programs), then isnan-scan the system, the
solved local dofs, and the two H1 contributions separately.
Usage: python scripts/k2_nan_hunt.py [N] [k]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_X64", "1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
k = int(sys.argv[2]) if len(sys.argv) > 2 else 2

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
from proton_tpu.cut import methods as cut_methods
from proton_tpu.cut.classify import LOC_NEG
from proton_tpu.cut.quadrature import side_cell_rule
from proton_tpu.methods import assembly, cells_last
from proton_tpu.solvers import cg

hdi = HHODegreeInfo(k + 1, k)
eta = fs.nitsche_eta(k)
problem = fs.default_problem()

jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = fs._classify_host(
    N, hdi, problem, 4, True)
geom = jax.jit(cell_geometry)(mesh)
dofmap = assembly.build_dofmap_structured(N, hdi)

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


def nanscan(label, tree):
    for name, a in zip(getattr(tree, "_fields",
                               [str(i) for i in range(99)]),
                       jax.tree.leaves(tree)):
        n = int(jnp.sum(~jnp.isfinite(a)))
        if n:
            print(f"  {label}.{name}: {n} non-finite of {a.size}",
                  flush=True)
    print(f"{label}: scan done", flush=True)


nanscan("sub(cut64)", sub)
nanscan("cond", cond)

levels = {N: fs.LevelData(mesh, None, cut_ids, cond,
                          np.asarray(unit_host[0], np.float64), irr,
                          batch, cell_loc)}
S_levels, cut_levels = {N: cond.dS}, {N: cut_ids}
for n in fs._mg_sizes(N, 8)[1:]:
    lev = fs.build_coarse_level(n, hdi, problem, eta, 4,
                                mixed=k >= 2)
    levels[n] = lev
    S_levels[n] = lev.cond.dS.astype(jnp.float32)
    cut_levels[n] = lev.cut_ids
sizes = tuple(sorted(S_levels))
S_list = tuple(S_levels[n] for n in sizes)
kw = dict(sizes=sizes, hdi=hdi, problem=problem, precond="mg",
          cut_levels=tuple(
              (n, tuple(int(i) for i in
                        fs.expand_ring(cut_levels[n], n, 1)))
              for n in sizes),
          mg_coarsest=8, n_smooth=1, cheb_degree=4, patch_colors=1,
          uniform_levels=fs.uniform_static(levels), cg_f64=False,
          mg_f32=False, cheb_ops="exact")
cgp = cg.CGParams(convergence_threshold=1e-6, divergence_threshold=1e8,
                  max_iter=50000, apply_preconditioner=True)
stat = fs.segments_static(kw)
mgdata = fs.mg_setup_cached(S_list, stat, problem)
rhs, gF_cl = fs._rhs_jit(mesh, dofmap, cond, sizes=sizes, hdi=hdi,
                         problem=problem,
                         uniform_levels=stat["uniform_levels"])
nanscan("rhs", rhs)
local, iters, ex, rel = fs.solve_segments(
    mesh, dofmap, cond, S_list, cgp, 50, kw, pre=(mgdata, rhs, gF_cl))
print(f"solved: {int(iters)} iters exit {int(ex)} rel {float(rel):.2e}",
      flush=True)

bad = jnp.sum(~jnp.isfinite(local), axis=1)
nbad = int(jnp.sum(bad > 0))
print(f"local dofs: {nbad} cells with non-finite entries", flush=True)
if nbad:
    ids = np.asarray(jnp.nonzero(bad > 0, size=min(nbad, 16))[0])
    print("  first bad cells:", ids[:16],
          "loc:", np.asarray(cell_loc)[ids[:16]], flush=True)
    cutset = set(np.asarray(cut_ids).tolist())
    irrset = set(irr.tolist())
    print("  in cut set:", sum(1 for i in ids if int(i) in cutset),
          " in irr set:", sum(1 for i in ids if int(i) in irrset),
          flush=True)

# H1 parts separately
celdeg = hdi.cell_degree
cbs = bases.cell_basis_size(celdeg)
h1_full = fs.fictdom_h1_error_chunked(mesh, geom, batch, cell_loc, hdi,
                                      local, problem.sol_grad)
print("h1 full:", float(h1_full), flush=True)
zero_cut = local.at[batch.ids].set(0.0)
h1_fit = fs.fictdom_h1_error_chunked(
    mesh, geom, batch, cell_loc, hdi,
    jnp.where(jnp.isfinite(local), local, 0.0), problem.sol_grad)
print("h1 with non-finite zeroed:", float(h1_fit), flush=True)
