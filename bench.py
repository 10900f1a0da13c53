#!/usr/bin/env python
"""Benchmark: cutHHO fictitious-domain Poisson on an N x N cut mesh
(the BASELINE.json metric: elements/sec local assembly (k=1 cutHHO) and
end-to-end solve time on a 1024^2 mesh).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Environment knobs:
  PROTON_BENCH_N       mesh subdivisions per side (default 1024)
  PROTON_BENCH_K       method degree (default 1)
  PROTON_BENCH_TOL     CG relative tolerance (default 1e-6)
  PROTON_BENCH_MIXED   force mixed precision (automatic for k >= 2)
  PROTON_TPU_PLATFORM  backend override (default: real TPU)

k <= 1 runs pure float32 on TPU. k >= 2 runs *mixed precision*: the
sliver-cut local Nitsche blocks round to indefinite in f32 (local
condition ~1/eps_f32, see CLAUDE.md), so the O(N) cut-cell class is
classified, assembled and condensed in float64 on the host CPU backend
while the O(N^2) fitted path (fused Pallas kernel) and the global CG stay
float32 on TPU. The fitted local-operator build streams cell blocks with
cells in the lane dimension (methods/pallas_assembly.py); the solve is
the statically condensed face-grid PCG (methods/structured.py).
"""

import json
import os
import sys
import time

# k <= 1: pure f32 (fastest). k >= 2: mixed precision (f64 cut class).
_BENCH_K = int(os.environ.get("PROTON_BENCH_K", "1"))
_MIXED = _BENCH_K >= 2 or os.environ.get("PROTON_BENCH_MIXED") == "1"
os.environ.setdefault("PROTON_TPU_X64", "1" if _MIXED else "0")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:  # persistent compilation cache: amortize remote AOT compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import proton_tpu as pt  # noqa: E402
from proton_tpu.cut import classify, levelset  # noqa: E402
from proton_tpu.cut import methods as cut_methods  # noqa: E402
from proton_tpu.core.geometry import cell_geometry  # noqa: E402
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs  # noqa: E402
from proton_tpu.methods import assembly, condensation, hho, \
    pallas_assembly, poisson, structured  # noqa: E402
from proton_tpu.solvers import cg  # noqa: E402


def _cast32(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def main():
    N = int(os.environ.get("PROTON_BENCH_N", "1024"))
    k = _BENCH_K
    tol = float(os.environ.get("PROTON_BENCH_TOL", "1e-6"))
    chunk = int(os.environ.get("PROTON_BENCH_CHUNK", "16384"))
    eta = 5.0 if k < 2 else 5.0 * (k + 1) ** 2  # Nitsche (see CLAUDE.md)

    hdi = HHODegreeInfo(k + 1, k)
    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
    ls = levelset.circle_level_set(0.35, 0.5, 0.5)

    cpu = jax.devices("cpu")[0] if _MIXED else None

    # ---------------- setup (host topology + classification) -------------
    t_setup0 = time.perf_counter()
    mesh = pt.make_poly_mesh(Nx=N, Ny=N)
    if _MIXED:
        with jax.default_device(cpu):
            mesh64, cutdata64 = classify.cut_preprocess(mesh, ls, levels=4)
        mesh = jax.device_put(_cast32(mesh64), jax.devices()[0])
        cutdata = jax.device_put(_cast32(cutdata64), jax.devices()[0])
    else:
        mesh, cutdata = classify.cut_preprocess(mesh, ls, levels=4)
    geom = jax.jit(cell_geometry)(mesh)
    cut_ids = np.nonzero(np.asarray(cutdata.cell_loc) == classify.LOC_CUT)[0]
    batch = jax.jit(cut_methods.make_cut_batch)(mesh, geom, cutdata,
                                                cut_ids)
    dofmap = assembly.build_dofmap(mesh, hdi)
    inc = assembly.build_face_incidence(mesh, dofmap)
    jax.block_until_ready(geom.bar)
    t_setup = time.perf_counter() - t_setup0

    C = mesh.num_cells
    side = classify.LOC_NEG
    use_pallas = (jax.default_backend() == "tpu" and
                  os.environ.get("PROTON_BENCH_PALLAS", "1") == "1")

    # ---------------- local assembly -------------------------------------
    @jax.jit
    def assemble_fitted(mesh, geom, cell_loc):
        """Fitted operator (reconstruction data + naive stabilization, the
        uncut fallback of the fictdom path) on every cell: fused Pallas
        kernel on TPU, chunked XLA elsewhere; plus the standard source."""
        if use_pallas:
            lc = pallas_assembly.fitted_local_operator(mesh, geom, hdi)
        else:
            _, lc = poisson.assemble_local_chunked(
                mesh, geom, hdi, "naive", chunk)
        f_std = cell_rhs(mesh, geom, hdi.cell_degree, rhs_fun)
        f = jnp.where((cell_loc == side)[:, None], f_std, 0.0)
        return lc, f

    @jax.jit
    def assemble_cut32(batch):
        _, data_cut = cut_methods.cut_hho_laplacian(batch, ls, hdi, side,
                                                    eta=eta)
        stab_cut = cut_methods.cut_stabilization(batch, hdi, side)
        f_cut = cut_methods.cut_rhs(batch, hdi.cell_degree, rhs_fun, ls,
                                    sol_fun, side, eta=eta)
        return data_cut + stab_cut, f_cut

    def _cut64_impl(mesh64, cutdata64):
        geom64 = cell_geometry(mesh64)
        batch64 = cut_methods.make_cut_batch(mesh64, geom64, cutdata64,
                                             cut_ids)
        _, data_cut = cut_methods.cut_hho_laplacian(
            batch64, ls, hdi, side, eta=eta)
        stab_cut = cut_methods.cut_stabilization(batch64, hdi, side)
        f_cut = cut_methods.cut_rhs(batch64, hdi.cell_degree, rhs_fun,
                                    ls, sol_fun, side, eta=eta)
        lc_cut = data_cut + stab_cut
        cond_cut = condensation.condense(lc_cut, f_cut, dofmap.cbs,
                                         robust=True)
        return lc_cut, f_cut, cond_cut

    _cut64_jit = jax.jit(_cut64_impl)

    def assemble_cut64():
        """Mixed-precision path: cut-cell class in f64 on the host CPU."""
        with jax.default_device(cpu):
            lc_cut, f_cut, cond_cut = _cut64_jit(mesh64, cutdata64)
            jax.block_until_ready(lc_cut)
        dev = jax.devices()[0]
        return (jax.device_put(_cast32(lc_cut), dev),
                jax.device_put(_cast32(f_cut), dev),
                jax.device_put(_cast32(cond_cut), dev))

    def assemble_all():
        lc, f = assemble_fitted(mesh, geom, cutdata.cell_loc)
        if _MIXED:
            lc_cut, f_cut, cond_cut = assemble_cut64()
        else:
            lc_cut, f_cut = assemble_cut32(batch)
            cond_cut = None
        lc = lc.at[jnp.asarray(cut_ids)].set(lc_cut)
        f = f.at[jnp.asarray(cut_ids)].set(f_cut)
        return lc, f, cond_cut

    lc, f, cond_cut = assemble_all()
    jax.block_until_ready(lc)
    t0 = time.perf_counter()
    lc, f, cond_cut = assemble_all()
    jax.block_until_ready(lc)
    t_assembly = time.perf_counter() - t0
    elements_per_sec = C / t_assembly

    # ---------------- condensed face-grid solve --------------------------
    cgp = cg.CGParams(convergence_threshold=tol,
                      divergence_threshold=1e8,
                      max_iter=int(os.environ.get("PROTON_BENCH_MAXIT",
                                                  "50000")),
                      apply_preconditioner=True)
    str_sys = structured.make_structured_system(N, N, dofmap.fbs)
    ids_dev = jnp.asarray(cut_ids)

    @jax.jit
    def solve(mesh, lc, f, cond_cut):
        fd = assembly.dirichlet_face_data(mesh, hdi, sol_fun)
        g_loc = assembly.local_dirichlet_data(dofmap, mesh, fd)
        cond = condensation.condense(lc, f, dofmap.cbs)
        if cond_cut is not None:
            # overwrite the cut rows with the f64-condensed (then rounded)
            # Schur data — the f32 condensation of those blocks is the
            # unstable step
            cond = condensation.CondensedSystem(
                cond.S.at[ids_dev].set(cond_cut.S),
                cond.bF.at[ids_dev].set(cond_cut.bF),
                cond.ATT.at[ids_dev].set(cond_cut.ATT),
                cond.ATF.at[ids_dev].set(cond_cut.ATF),
                cond.fT.at[ids_dev].set(cond_cut.fT))
        rhs = structured.structured_rhs(str_sys, cond, g_loc, dofmap.cbs)
        apply_S = structured.make_structured_operator(str_sys, cond.S)
        diag = structured.structured_diagonal(str_sys, cond.S)
        res = cg.conjugated_gradient(apply_S, rhs, diag, cgp)
        uF = structured.grid_gather(str_sys, structured._mask(str_sys,
                                                              res.x))
        uF = uF + g_loc[:, dofmap.cbs:]
        from proton_tpu.core.ops import cho_solve_batched
        rhs_T = cond.fT - jnp.einsum("cij,cj->ci", cond.ATF, uF)
        uT = cho_solve_batched(cond.ATT, rhs_T[..., None])[..., 0]
        local = jnp.concatenate([uT, uF], axis=1)
        return local, res.iterations, res.exit_reason, res.rel_residual

    local, iters, exit_reason, rel = solve(mesh, lc, f, cond_cut)
    jax.block_until_ready(local)
    t0 = time.perf_counter()
    local, iters, exit_reason, rel = solve(mesh, lc, f, cond_cut)
    jax.block_until_ready(local)
    t_solve = time.perf_counter() - t0

    end_to_end = t_setup + t_assembly + t_solve

    result = {
        "metric": "elements/sec local assembly (k=1 cutHHO); "
                  "end-to-end solve time, 1024^2 mesh",
        "value": round(elements_per_sec, 1),
        "unit": "elements/s",
        "vs_baseline": 1.0,
        "n": N,
        "k": k,
        "cells": int(C),
        "cut_cells": int(len(cut_ids)),
        "dofs": int(dofmap.n_dofs),
        "condensed_dofs": int(condensation.face_dof_view(dofmap)[1]),
        "setup_s": round(t_setup, 3),
        "assembly_s": round(t_assembly, 4),
        "solve_s": round(t_solve, 3),
        "end_to_end_s": round(end_to_end, 3),
        "cg_iters": int(iters),
        "cg_rel_residual": float(rel),
        "cg_exit": int(exit_reason),
        "backend": jax.default_backend(),
        "precision": "mixed(f32+f64-cut)" if _MIXED else "float32",
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
