"""Experiment: MG-PCG vs Jacobi/block-Jacobi PCG iteration counts on the
cut fictdom condensed system (run on CPU f64 or f32).

Usage: PROTON_TPU_PLATFORM=cpu python scripts/mg_cut_exp.py [Nmax] [k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_PLATFORM", "cpu")
os.environ.setdefault("PROTON_TPU_X64", "1")

import numpy as np
import jax
import jax.numpy as jnp

import proton_tpu as pt
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs
from proton_tpu.cut import classify, levelset
from proton_tpu.cut import methods as cut_methods
from proton_tpu.methods import assembly, condensation, poisson, structured
from proton_tpu.solvers import cg, multigrid

Nmax = int(sys.argv[1]) if len(sys.argv) > 1 else 128
k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
hdi = HHODegreeInfo(k + 1, k)
pi = np.pi
rhs_fun = lambda p: 2 * pi ** 2 * jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
ls = levelset.circle_level_set(0.35, 0.5, 0.5)
side = classify.LOC_NEG
eta = 5.0 if k < 2 else 5.0 * (k + 1) ** 2


def assemble_level(N):
    mesh = pt.make_poly_mesh(Nx=N, Ny=N)
    mesh, cutdata = classify.cut_preprocess(mesh, ls, levels=4)
    geom = cell_geometry(mesh)
    cut_ids = np.nonzero(np.asarray(cutdata.cell_loc) == classify.LOC_CUT)[0]
    batch = cut_methods.make_cut_batch(mesh, geom, cutdata, cut_ids)
    _, lc = poisson.assemble_local(mesh, geom, hdi)
    _, data_cut = cut_methods.cut_hho_laplacian(batch, ls, hdi, side, eta=eta)
    stab_cut = cut_methods.cut_stabilization(batch, hdi, side)
    lc = lc.at[batch.ids].set(data_cut + stab_cut)
    f_std = cell_rhs(mesh, geom, hdi.cell_degree, rhs_fun)
    f = jnp.where((cutdata.cell_loc == side)[:, None], f_std, 0.0)
    f_cut = cut_methods.cut_rhs(batch, hdi.cell_degree, rhs_fun, ls, sol_fun,
                                side, eta=eta)
    f = f.at[batch.ids].set(f_cut)
    dm = assembly.build_dofmap(mesh, hdi)
    fd = assembly.dirichlet_face_data(mesh, hdi, sol_fun)
    g_loc = assembly.local_dirichlet_data(dm, mesh, fd)
    cond = condensation.condense(lc, f, dm.cbs)
    return mesh, dm, cond, g_loc, cut_ids


for N in [64, 128, 256]:
    if N > Nmax:
        break
    S_per, cuts_per = {}, {}
    n = N
    fine = None
    while n >= 8:
        data = assemble_level(n)
        S_per[n] = data[2].S
        cuts_per[n] = data[4]
        if n == N:
            fine = data
        n //= 2
    mesh, dm, cond, g_loc, cut_ids = fine
    sys_f = structured.make_structured_system(N, N, dm.fbs)
    rhs = structured.structured_rhs(sys_f, cond, g_loc, dm.cbs)
    apply_S = structured.make_structured_operator(sys_f, cond.S)
    diag = structured.structured_diagonal(sys_f, cond.S)
    cgp = cg.CGParams(convergence_threshold=1e-8, max_iter=30000,
                      apply_preconditioner=True)
    r_j = cg.conjugated_gradient(apply_S, rhs, diag, cgp)
    print(f"N={N:4d} k={k}  jacobi-PCG   iters={int(r_j.iterations):6d} "
          f"exit={int(r_j.exit_reason)}", flush=True)
    bj = structured.block_jacobi_preconditioner(sys_f, cond.S)
    r_b = cg.conjugated_gradient(apply_S, rhs, None, cgp, precond=bj)
    print(f"N={N:4d} k={k}  blockJ-PCG   iters={int(r_b.iterations):6d} "
          f"exit={int(r_b.exit_reason)}", flush=True)
    for label, kw in [
        ("MG(bj)      ", dict()),
        ("MG(bj+patch)", dict(cut_ids_per_level=cuts_per)),
    ]:
        t0 = time.perf_counter()
        mg = multigrid.build_multigrid(N, dm.fbs, S_per, hdi=hdi,
                                       **kw)
        r_m = cg.conjugated_gradient(apply_S, rhs, None, cgp,
                                     precond=mg.precondition)
        err = float(jnp.max(jnp.abs(r_m.x.H - r_j.x.H)))
        print(f"N={N:4d} k={k}  {label} iters={int(r_m.iterations):6d} "
              f"exit={int(r_m.exit_reason)} maxdiff={err:.2e} "
              f"t={time.perf_counter()-t0:.1f}s", flush=True)
