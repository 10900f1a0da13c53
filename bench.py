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
  PROTON_TPU_PLATFORM  backend override (default: real TPU)

Runs in float32 on TPU (f64 is emulated with ~16x padded buffers and OOMs
at this scale; the accuracy gate runs in f64 on CPU via the test suite).
The local-operator build streams cell chunks through lax.map to bound the
tile-padding footprint of the [chunk, Q, B] basis tensors.
"""

import json
import os
import sys
import time

os.environ.setdefault("PROTON_TPU_X64", "0")  # f32 on TPU

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


def main():
    N = int(os.environ.get("PROTON_BENCH_N", "1024"))
    k = int(os.environ.get("PROTON_BENCH_K", "1"))
    tol = float(os.environ.get("PROTON_BENCH_TOL", "1e-6"))
    chunk = int(os.environ.get("PROTON_BENCH_CHUNK", "16384"))

    hdi = HHODegreeInfo(k + 1, k)
    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])

    t_setup0 = time.perf_counter()
    mesh = pt.make_poly_mesh(Nx=N, Ny=N)
    ls = levelset.circle_level_set(0.35, 0.5, 0.5)
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

    @jax.jit
    def assemble(mesh, geom, batch, cell_loc):
        # fitted operator (reconstruction data + naive stabilization, the
        # uncut fallback of the fictdom path) on every cell: fused Pallas
        # kernel on TPU (41x over the XLA path), chunked XLA elsewhere
        if use_pallas:
            lc = pallas_assembly.fitted_local_operator(mesh, geom, hdi)
        else:
            _, lc = poisson.assemble_local_chunked(
                mesh, geom, hdi, "naive", chunk)
        _, data_cut = cut_methods.cut_hho_laplacian(batch, ls, hdi, side)
        stab_cut = cut_methods.cut_stabilization(batch, hdi, side)
        lc = lc.at[batch.ids].set(data_cut + stab_cut)
        f_std = cell_rhs(mesh, geom, hdi.cell_degree, rhs_fun)
        f = jnp.where((cell_loc == side)[:, None], f_std, 0.0)
        f_cut = cut_methods.cut_rhs(batch, hdi.cell_degree, rhs_fun, ls,
                                    sol_fun, side)
        return lc, f.at[batch.ids].set(f_cut)

    lc, f = assemble(mesh, geom, batch, cutdata.cell_loc)
    jax.block_until_ready(lc)
    t0 = time.perf_counter()
    lc, f = assemble(mesh, geom, batch, cutdata.cell_loc)
    jax.block_until_ready(lc)
    t_assembly = time.perf_counter() - t0
    elements_per_sec = C / t_assembly

    cgp = cg.CGParams(convergence_threshold=tol,
                      max_iter=int(os.environ.get("PROTON_BENCH_MAXIT",
                                                  "50000")),
                      apply_preconditioner=True)

    str_sys = structured.make_structured_system(N, N, dofmap.fbs)

    @jax.jit
    def solve(mesh, lc, f):
        """Statically condensed face-grid PCG + cell recovery (gather-free
        stencil exchange: methods/structured.py)."""
        fd = assembly.dirichlet_face_data(mesh, hdi, sol_fun)
        g_loc = assembly.local_dirichlet_data(dofmap, mesh, fd)
        local, res = structured.solve_condensed_structured(
            str_sys, lc, f, dofmap.cbs, g_loc, cgp)
        return local, res.iterations, res.exit_reason, res.rel_residual

    local, iters, exit_reason, rel = solve(mesh, lc, f)
    jax.block_until_ready(local)
    t0 = time.perf_counter()
    local, iters, exit_reason, rel = solve(mesh, lc, f)
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
        "dtype": "float64" if jax.config.jax_enable_x64 else "float32",
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
