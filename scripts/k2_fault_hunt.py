"""Isolate the libtpu kernel fault in the k=2 256^2 solve: apply the
solve-phase programs one at a time with synced fetches between, so the
crash lands on a specific component. Usage: python scripts/k2_fault_hunt.py [N] [k]"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_X64", "1")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from proton_tpu.core import bases
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.methods import assembly, cells_last as cl
from proton_tpu.methods.structured import make_structured_system
from proton_tpu.solvers import cg, multigrid
import functools

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
hdi = HHODegreeInfo(k + 1, k)
eta = fs.nitsche_eta(k)
problem = fs.default_problem()
jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))

def sync(label, *arrays):
    for a in arrays:
        jax.device_get(jnp.sum(jnp.ravel(a)[:1024]))
    print(f"OK: {label}", flush=True)

mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = fs._classify_host(N, hdi, problem, 4, True)
geom = jax.jit(cell_geometry)(mesh)
dofmap = assembly.build_dofmap_structured(N, hdi)
cut_sub = fs.cut64_condensed_cached(N, batch, hdi, problem, eta, with_rhs=True)
unit_host = fs._unit_cell_host(hdi, 1.0 / N)
irr = np.union1d(dist_ids, np.asarray(cut_ids))
unit = tuple(jnp.asarray(a, jnp.float32) for a in unit_host)
cond = fs._assemble_level_uniform_lean(
    mesh, geom, cell_loc, batch, jnp.asarray(dist_ids, dtype=jnp.int32),
    jnp.asarray(irr, dtype=jnp.int32), unit, hdi, problem, eta, with_rhs=True)
cond = fs._set_cells_lean(cond, unit[0].reshape(-1, 1),
                          jnp.asarray(irr, dtype=jnp.int32),
                          jnp.asarray(cut_ids, dtype=jnp.int32), cut_sub)
sync("assembly", cond.dS, cond.bF)
levels = {N: fs.LevelData(mesh, None, cut_ids, cond,
                          np.asarray(unit_host[0], np.float64), irr, batch, cell_loc)}
S_levels, cut_levels = {N: cond.dS}, {N: cut_ids}
for n in fs._mg_sizes(N, 8)[1:]:
    lev = fs.build_coarse_level(n, hdi, problem, eta, 4, mixed=True)
    levels[n] = lev; S_levels[n] = lev.cond.dS.astype(jnp.float32)
    cut_levels[n] = lev.cut_ids
sizes = tuple(sorted(S_levels))
S_list = tuple(S_levels[n] for n in sizes)
kw = dict(sizes=sizes, hdi=hdi, problem=problem, precond="mg",
          cut_levels=tuple((n, tuple(int(i) for i in fs.expand_ring(cut_levels[n], n, 1)))
                           for n in sizes),
          mg_coarsest=8, n_smooth=1, cheb_degree=4, patch_colors=1,
          uniform_levels=fs.uniform_static(levels), cg_f64=False,
          mg_f32=False, cheb_ops="exact")
stat = fs.segments_static(kw)
mgdata = fs.mg_setup_cached(S_list, stat, problem)
rhs, gF_cl = fs._rhs_jit(mesh, dofmap, cond, sizes=sizes, hdi=hdi,
                         problem=problem, uniform_levels=stat["uniform_levels"])
sync("mg setup + rhs", *jax.tree.leaves(mgdata.lam), rhs.H, rhs.V)

fbs = bases.face_basis_size(k)
sys_f = make_structured_system(N, N, fbs)
uni = fs._uniform_unpack(stat["uniform_levels"])
S_u, irrn = uni[N]
apply_S = jax.jit(cl.make_uniform_operator_cl(sys_f, S_u.astype(jnp.float32), irrn, cond.dS))
y = apply_S(rhs); sync("fine apply_S", y.H, y.V)

iHu, iVu = cl.uniform_block_jacobi_blocks(sys_f, S_u)
hf, vf = cl.uniform_face_block_deltas(sys_f, cond.dS, irrn)
corrH, corrV = cl.uniform_bj_from_deltas(sys_f, S_u, hf, vf, jnp.float32)
bj = jax.jit(cl.make_uniform_block_jacobi_cl(sys_f, iHu.astype(np.float32), iVu.astype(np.float32), corrH, corrV))
z = bj(rhs); sync("fine bj", z.H, z.V)

pids = fs.expand_ring(cut_ids, N, 1)
pb = cl.uniform_patch_setup_lean(sys_f, S_u, cond.dS, irrn, pids, jnp.float32)
patch = jax.jit(lambda r: cl.apply_cut_patch_cl(sys_f, pids, *pb, r))
p = patch(rhs); sync("fine patch", p.H, p.V)

nc = N // 2
sys_c = make_structured_system(nc, nc, fbs)
mats = multigrid._transfer_slot_matrices(hdi, 1.0 / nc, jnp.float32)
prol = jax.jit(multigrid.make_reconstruction_prolongation_cl(sys_f, sys_c, hdi, 1.0/nc, jnp.float32, mats=mats))
restr = jax.jit(multigrid.make_reconstruction_restriction_cl(sys_f, sys_c, hdi, 1.0/nc, jnp.float32, mats=mats))
rc = restr(rhs); sync("restrict", rc.H, rc.V)
pf = prol(rc); sync("prolong", pf.H, pf.V)

lam = mgdata.lam[-1]
cheb = jax.jit(multigrid.make_chebyshev_smoother(
    cl.make_uniform_operator_cl(sys_f, S_u.astype(jnp.float32), irrn, cond.dS),
    cl.make_uniform_block_jacobi_cl(sys_f, iHu.astype(np.float32), iVu.astype(np.float32), corrH, corrV),
    lam, degree=4))
c = cheb(rhs); sync("fine cheb4", c.H, c.V)

cuts = {n: np.asarray(ids, dtype=np.int64) for n, ids in kw["cut_levels"]}
prec = jax.jit(functools.partial(multigrid.mg_precondition_cl, mgdata, N=N, fbs=fbs,
    cut_ids_per_level=cuts, coarsest=8, n_smooth=1, cheb_degree=4,
    patch_colors=1, hdi=hdi, uniform_per_level=uni, cheb_ops="exact"))
v = prec(rhs); sync("full V-cycle", v.H, v.V)

cgp = cg.CGParams(convergence_threshold=1e-6, divergence_threshold=1e8,
                  max_iter=5, apply_preconditioner=True)
x, it, ex, rel, nr0 = fs._cg_seg_jit(cond.dS, mgdata, rhs, None, None,
                                     n_smooth=1, patch_sweeps=1,
                                     smooth_transfers=False, mg_gamma=1,
                                     cg_params=cgp, **stat)
sync("cg segment (5 iters)", x.H, x.V)
print("rel:", float(rel), flush=True)
cgp = cg.CGParams(convergence_threshold=1e-6, divergence_threshold=1e8,
                  max_iter=50, apply_preconditioner=True)
x, it, ex, rel, nr0 = fs._cg_seg_jit(cond.dS, mgdata, rhs, None, None,
                                     n_smooth=1, patch_sweeps=1,
                                     smooth_transfers=False, mg_gamma=1,
                                     cg_params=cgp, **stat)
sync("cg segment (50 iters)", x.H, x.V)
print("rel:", float(rel), flush=True)
