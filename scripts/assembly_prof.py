"""Profile the timed assembly phase (bench.py assemble_fine) piece by
piece under the honest sync barrier — round-4 verdict item 6: where does
~1 s go at 1024^2 k=1 (BENCH_r04: 975k elem/s) when round-2 claimed
9.3M elem/s (0.11 s)?

Pieces, each synced independently after a warmup execution:
  pallas  — fitted_local_operator (the Pallas fused kernel alone)
  cut     — cut_hho_laplacian + cut_stabilization (XLA, O(band))
  rhs     — cell_rhs + cut_rhs
  cond    — condense_cl of a precomputed (lc_cl, f_cl)
  full    — the whole _assemble_level_cl (+ mixed set_cells)

Run ON THE TPU HOST, serialized with nothing else.
"""

import json
import os
import sys
import time

os.environ.setdefault("PROTON_TPU_X64", "1")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from proton_tpu.core import bases  # noqa: E402
from proton_tpu.core.geometry import cell_geometry  # noqa: E402
from proton_tpu.core.ops import HHODegreeInfo, cell_rhs  # noqa: E402
from proton_tpu.cut import fictdom_structured as fs  # noqa: E402
from proton_tpu.cut import methods as cut_methods  # noqa: E402
from proton_tpu.cut.classify import LOC_NEG  # noqa: E402
from proton_tpu.methods import (assembly, cells_last,  # noqa: E402
                                pallas_assembly, poisson)


def sync(*arrays):
    for a in arrays:
        jax.device_get(jnp.sum(jnp.ravel(a)[:4096]))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(*jax.tree.leaves(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(*jax.tree.leaves(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:10s} min {min(ts)*1e3:9.1f} ms  all "
          f"{[round(t*1e3,1) for t in ts]}", flush=True)
    return out, min(ts)


def main():
    N = int(os.environ.get("PROTON_BENCH_N", "1024"))
    k = int(os.environ.get("PROTON_BENCH_K", "1"))
    hdi = HHODegreeInfo(k + 1, k)
    problem = fs.default_problem()
    eta = fs.nitsche_eta(k)

    mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = fs._classify_host(
        N, hdi, problem, 4, True)
    geom = jax.jit(cell_geometry)(mesh)
    cut_sub = fs.cut64_condensed_cached(N, batch, hdi, problem, eta,
                                        with_rhs=True)
    sync(geom.bar, *jax.tree.leaves(cut_sub))
    C = mesh.num_cells
    cbs = bases.cell_basis_size(hdi.cell_degree)

    pallas_fn = jax.jit(lambda m, g: pallas_assembly.fitted_local_operator(
        m, g, hdi, cells_last=True))
    lc_cl, t_p = timeit("pallas", pallas_fn, mesh, geom)

    def cut_fn(batch):
        _, data_cut = cut_methods.cut_hho_laplacian(batch, problem.ls,
                                                    hdi, LOC_NEG, eta=eta)
        stab = cut_methods.cut_stabilization(batch, hdi, LOC_NEG)
        return data_cut + stab
    _, t_c = timeit("cutclass", jax.jit(cut_fn), batch)

    def rhs_fn(mesh, geom, batch, cell_loc):
        f_std = cell_rhs(mesh, geom, hdi.cell_degree, problem.rhs_fun)
        f = jnp.where((cell_loc == LOC_NEG)[:, None], f_std, 0.0)
        f_cut = cut_methods.cut_rhs(batch, hdi.cell_degree,
                                    problem.rhs_fun, problem.ls,
                                    problem.sol_fun, LOC_NEG, eta=eta)
        return f.at[batch.ids].set(f_cut).T
    f_cl, t_r = timeit("rhs", jax.jit(rhs_fn), mesh, geom, batch,
                       cell_loc)

    cond_fn = jax.jit(lambda a, b: cells_last.condense_cl(a, b, cbs))
    cond, t_k = timeit("condense", cond_fn, lc_cl, f_cl)

    full_fn = jax.jit(lambda m, g, cl, b: fs._assemble_level_cl(
        m, g, cl, b, hdi, problem, eta, True, True))
    _, t_f = timeit("full", full_fn, mesh, geom, cell_loc, batch)

    def full_mixed(m, g, cl, b, sub):
        c = fs._assemble_level_cl(m, g, cl, b, hdi, problem, eta, True,
                                  True)
        return cells_last.set_cells(c, cut_ids, sub)
    _, t_m = timeit("full+mix", jax.jit(full_mixed), mesh, geom,
                    cell_loc, batch, cut_sub)

    print(json.dumps({
        "n": N, "k": k, "cells": int(C),
        "pallas_ms": round(t_p * 1e3, 1),
        "cut_ms": round(t_c * 1e3, 1),
        "rhs_ms": round(t_r * 1e3, 1),
        "condense_ms": round(t_k * 1e3, 1),
        "full_ms": round(t_f * 1e3, 1),
        "full_mixed_ms": round(t_m * 1e3, 1),
        "pieces_sum_ms": round((t_p + t_c + t_r + t_k) * 1e3, 1),
        "elem_per_s_full": round(C / t_m, 1)}))


if __name__ == "__main__":
    sys.exit(main())
