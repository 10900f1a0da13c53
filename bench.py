#!/usr/bin/env python
"""Benchmark: cutHHO fictitious-domain Poisson on an N x N cut mesh
(the BASELINE.json metric: elements/sec local assembly (k=1 cutHHO) and
end-to-end solve time on a 1024^2 mesh).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Environment knobs:
  PROTON_BENCH_N        mesh subdivisions per side (default 1024)
  PROTON_BENCH_K        method degree (default 1)
  PROTON_BENCH_TOL      CG relative tolerance (default 1e-6)
  PROTON_BENCH_PRECOND  mg (default) | block_jacobi | jacobi
  PROTON_BENCH_PRECISION
      mixed (default): f32 data pipeline with (a) the O(N) cut-cell
          class assembled + condensed in f64 (sliver-cut Nitsche blocks
          round indefinite in f32) and (b) f64 CG recurrences around
          the f32 matvec + V-cycle (plain f32 CG stagnates on the
          cond ~ N^2 system). H1 carries the f32 fitted-assembly
          noise floor — run the f64 mode for discretization-level H1.
      f64 (accurate mode): assembly, condensation, matvec and CG in
          (TPU-emulated) f64 with the FLOAT32 multigrid V-cycle as
          preconditioner — discretization-accurate H1 at bench scale.
      f32: pure float32 (k <= 1 only; accuracy diagnostics).
  PROTON_BENCH_H1       compute the H1(grad) error vs the manufactured
                        solution (default 1)
  PROTON_TPU_PLATFORM   backend override (default: real TPU)

Pipeline (cut/fictdom_structured.py — the library flagship path):
fused Pallas local assembly in cells-last [d*d, C] layout, unrolled
lane-vector static condensation, f64 cut-cell class spliced in, and the
gather-free face-grid PCG preconditioned by the reconstruction-transfer
multigrid V-cycle with interface-patch smoothing.
"""

import gc
import json
import os
import sys
import time

# Stock run (no PROTON_BENCH_K): the k=1 headline row PLUS the k=2
# north-star row (BASELINE.md: cutHHO fictdom k=2 at 1024^2) in one JSON
# line. Setting PROTON_BENCH_K pins a single degree as before.
_BENCH_K = int(os.environ.get("PROTON_BENCH_K", "1"))
_BENCH_K2 = ("PROTON_BENCH_K" not in os.environ and
             os.environ.get("PROTON_BENCH_NORTHSTAR", "1") == "1")
_PRECISION = os.environ.get("PROTON_BENCH_PRECISION", "mixed")
assert _PRECISION in ("mixed", "f64", "f32"), _PRECISION
_MIXED = _PRECISION == "mixed"
os.environ.setdefault("PROTON_TPU_X64",
                      "0" if _PRECISION == "f32" else "1")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:  # persistent compilation cache: amortize remote AOT compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    # 0.0: the MG hierarchy spends seconds per level recompiling sub-1s
    # host programs every process unless they persist too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from proton_tpu.core.ops import HHODegreeInfo  # noqa: E402
from proton_tpu.core.geometry import cell_geometry  # noqa: E402
from proton_tpu.cut import fictdom_structured as fs  # noqa: E402
from proton_tpu.cut import methods as cut_methods  # noqa: E402
from proton_tpu.methods import assembly, cells_last  # noqa: E402
from proton_tpu.solvers import cg  # noqa: E402


def _progress(msg):
    """Phase heartbeat on stderr (the JSON result goes to stdout): cold
    runs spend minutes in remote AOT compiles and a wedged device can
    stall a phase indefinitely — timestamps tell the two apart."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def run_bench(N, k):
    tol = float(os.environ.get("PROTON_BENCH_TOL", "1e-6"))
    precond = os.environ.get("PROTON_BENCH_PRECOND", "mg")
    want_h1 = os.environ.get("PROTON_BENCH_H1", "1") == "1"
    n_smooth = int(os.environ.get("PROTON_BENCH_NSMOOTH", "1"))
    # Galerkin hierarchies lose rank through many composed masked
    # transfers (the coarsest goes singular; measured 146 iters at
    # 256^2 with coarsest 8 vs 54 with 32) — keep the dense coarsest
    # within ~4 gaps of the fine level
    mg_coarsest = int(os.environ.get(
        "PROTON_BENCH_COARSEST",
        "32" if os.environ.get("PROTON_BENCH_GALERKIN", "0") == "1"
        else "8"))
    patch_ring = int(os.environ.get("PROTON_BENCH_RING", "1"))
    cheb_degree = int(os.environ.get("PROTON_BENCH_CHEB", "4"))
    # smoother operator pair: exact | mixed | uniform (multigrid
    # _cheb_op_pair — 'mixed'/'uniform' drop the irregular gather/
    # scatter corrections from the smoother's inner ops)
    cheb_ops = os.environ.get("PROTON_BENCH_CHEBOPS", "exact")
    patch_colors = int(os.environ.get("PROTON_BENCH_PCOLORS", "1"))
    # segmented CG (true-residual restarts) is the f32-stagnation fix
    # that runs on TPU; cg_f64 (f64 CG recurrences) faults the device at
    # 1024^2 in the emulated-f64 loop ops
    cg_f64 = os.environ.get("PROTON_BENCH_CGF64", "0") == "1"
    segment = int(os.environ.get("PROTON_BENCH_SEGMENT",
                                 "50" if _MIXED else "0"))
    maxit = int(os.environ.get("PROTON_BENCH_MAXIT", "50000"))
    # NOTE: residual replacement enlarges the CG loop body past what the
    # TPU will run at 1024^2 (kernel fault); keep 0 on TPU until the
    # solve is split into segment jits
    recomp = int(os.environ.get("PROTON_BENCH_RECOMP", "0"))

    hdi = HHODegreeInfo(k + 1, k)
    eta = fs.nitsche_eta(k)
    problem = fs.default_problem()
    # Mosaic has no f64: the accurate mode assembles via the chunked XLA
    # path (emulated f64)
    use_pallas = (jax.default_backend() == "tpu" and
                  _PRECISION != "f64" and
                  os.environ.get("PROTON_BENCH_PALLAS", "1") == "1")
    cgp = cg.CGParams(convergence_threshold=tol, divergence_threshold=1e8,
                      max_iter=maxit, apply_preconditioner=True,
                      recompute_every=recomp)

    def sync(*arrays):
        """True execution barrier: fetch a scalar depending on each array.
        The remote (axon) runtime DEFERS execution past
        jax.block_until_ready — a 1 s assembly 'completes' in 30 ms and
        the work drains into whichever phase next reads a value — so
        every phase boundary forces a reduction fetch instead."""
        for a in arrays:
            jax.device_get(jnp.sum(jnp.ravel(a)[:4096]))

    # ---------------- warmup probe ---------------------------------------
    # absorbs the occasional multi-minute post-fault device stall (see
    # CLAUDE.md) so it lands in warmup_s, not in the measured phases
    _progress(f"start N={N} k={k} prec={_PRECISION}")
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    t_warmup = time.perf_counter() - t0
    _progress(f"warmup {t_warmup:.1f}s; classify...")

    # ---------------- setup: host classification + transfer ---------------
    # the band classification (cut_preprocess_band) runs on the CPU host:
    # O(N) interface-band work, no remote TPU programs; only the mesh
    # topology, cell_loc and the gathered O(N) cut batch ship to the chip
    t0 = time.perf_counter()
    mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = fs._classify_host(
        N, hdi, problem, 4, _MIXED)
    geom = jax.jit(cell_geometry)(mesh)
    # host closed-form dofmap: build_dofmap on the device mesh would
    # DOWNLOAD the topology over the tunnel (~137 s at 1024^2)
    dofmap = assembly.build_dofmap_structured(N, hdi)
    # mixed-precision cut splice: NATIVE f64 on the host, disk-cached —
    # the TPU's emulated-f64 path cost ~1.2 s for the O(N) cut class
    # and sat inside the timed assembly phase (round-3 headline
    # regression); the splice is setup, not per-element assembly
    cut_sub = None
    t_splice = 0.0
    if _MIXED:
        t1 = time.perf_counter()
        cut_sub = fs.cut64_condensed_cached(N, batch, hdi, problem, eta,
                                            with_rhs=True)
        # recorded separately so cross-round elements/s comparisons stay
        # honest: rounds <= 3 timed the splice inside the assembly
        # phase; warm runs since load it from the setup cache
        t_splice = time.perf_counter() - t1
    sync(geom.bar, mesh.cell_faces, batch.interface, dofmap.asm_idx,
         *(jax.tree.leaves(cut_sub) if cut_sub is not None else ()))
    t_setup = time.perf_counter() - t0
    _progress(f"setup {t_setup:.1f}s; assembly...")

    # ---------------- fine-level assembly + condensation ------------------
    # the headline metric: full per-cell local assembly + condensation
    # (the Pallas fused kernel on TPU) at bench dtype
    def assemble_fine():
        if _PRECISION == "f64":
            # f64 arithmetic in bounded cell blocks from the f32 geometry
            return fs._assemble_level_cl_f64(mesh, geom, cell_loc, batch,
                                             hdi, problem, eta,
                                             with_rhs=True)
        cond = fs._assemble_level_cl(mesh, geom, cell_loc, batch, hdi,
                                     problem, eta, use_pallas,
                                     with_rhs=True)
        if _MIXED:
            cond = cells_last.set_cells(cond, cut_ids, cut_sub)
        return cond

    cond = assemble_fine()
    sync(cond.S, cond.bF)
    t0 = time.perf_counter()
    cond = assemble_fine()
    sync(cond.S, cond.bF)
    t_assembly = time.perf_counter() - t0
    C = mesh.num_cells
    elements_per_sec = C / t_assembly
    _progress(f"assembly {t_assembly:.3f}s; system...")

    # ---------------- solved system: uniform split ------------------------
    # the system the CG runs on is the UNIFORM broadcast + exact splices
    # (identical discretization; the broadcast carries no per-cell f32
    # rounding scatter, and the matvec becomes a compile-time-constant
    # stencil + O(N) correction). f64 accurate mode keeps the chunked
    # f64 per-cell system.
    uniform_solve = os.environ.get("PROTON_BENCH_UNIFORM", "1") == "1"
    lean = os.environ.get("PROTON_BENCH_LEAN", "1") == "1" and \
        _PRECISION != "f64"
    levels = {}
    t0 = time.perf_counter()
    if uniform_solve:
        unit_host = fs._unit_cell_host(hdi, 1.0 / N)
        irr = np.union1d(dist_ids, np.asarray(cut_ids))
        if _PRECISION == "f64":
            # f64 accurate mode: exact f64 unit blocks + chunked f64 rhs
            # + f64 cut/distorted splices (no full-mesh f64 geometry)
            unit = tuple(jnp.asarray(a, jnp.float64) for a in unit_host)
            cond = fs._assemble_level_uniform64(
                mesh, cell_loc, batch,
                jnp.asarray(dist_ids, dtype=jnp.int32), unit, hdi,
                problem, eta, with_rhs=True)
        elif lean:
            # lean system: broadcasts stay implicit; ~4x less HBM
            unit = tuple(jnp.asarray(a, cond.S.dtype) for a in unit_host)
            cond = fs._assemble_level_uniform_lean(
                mesh, geom, cell_loc, batch,
                jnp.asarray(dist_ids, dtype=jnp.int32),
                jnp.asarray(irr, dtype=jnp.int32), unit, hdi, problem,
                eta, with_rhs=True)
            if _MIXED:
                cond = fs._set_cells_lean(
                    cond, unit[0].reshape(-1, 1),
                    jnp.asarray(irr, dtype=jnp.int32),
                    jnp.asarray(cut_ids, dtype=jnp.int32), cut_sub)
        else:
            unit = tuple(jnp.asarray(a, cond.S.dtype) for a in unit_host)
            cond = fs._assemble_level_uniform(
                mesh, geom, cell_loc, batch,
                jnp.asarray(dist_ids, dtype=jnp.int32), unit, hdi,
                problem, eta, with_rhs=True)
            if _MIXED:
                cond = cells_last.set_cells(cond, cut_ids, cut_sub)
        sync(*jax.tree.leaves(cond))
        levels[N] = fs.LevelData(
            mesh, None, cut_ids, cond,
            np.asarray(unit_host[0], np.float64), irr, batch, cell_loc)
    t_system = time.perf_counter() - t0
    _progress(f"system {t_system:.1f}s; mg setup...")

    # ---------------- MG hierarchy + V-cycle setup -------------------------
    # coarse levels are O(band) lean arrays, disk-cached per (geometry,
    # n, k); the V-cycle setup (patch inversions, lambda_max power
    # iterations, transfer stencils, coarse factorization) runs ONCE
    # here — the solve segments reuse the precomputed MGDataCL arrays
    t0 = time.perf_counter()
    _S = lambda c: (c.dS if isinstance(c, cells_last.UniformCondCL)
                    else c.S)
    dtype = _S(cond).dtype
    S_levels, cut_levels = {N: _S(cond)}, {N: cut_ids}
    if precond == "mg":
        # the preconditioner only needs the f64 cut splice where f32
        # rounds the blocks indefinite (k >= 2)
        for n in fs._mg_sizes(N, mg_coarsest)[1:]:
            lev = fs.build_coarse_level(n, hdi, problem, eta,
                                        int_refsteps=4,
                                        mixed=_MIXED and k >= 2)
            levels[n] = lev
            S_levels[n] = _S(lev.cond).astype(dtype)
            cut_levels[n] = lev.cut_ids

    sizes = tuple(sorted(S_levels))
    S_list = tuple(S_levels[n] for n in sizes)
    # EXPERIMENTAL (default off): exact-Galerkin coarse hierarchy. On
    # CPU f64 it converges (19@64 / 34@128 / 54@256 with coarsest 32)
    # and beats the rediscretized levels on stability (rho(E) 0.9 vs
    # 4.9), but on TPU f32 the outer CG stagnates at rel ~2e-4
    # (f32 V-cycle noise on the near-singular composed hierarchy) —
    # see ROADMAP for the full measurement trail.
    use_gal = precond == "mg" and len(sizes) > 1 and \
        os.environ.get("PROTON_BENCH_GALERKIN", "0") == "1"
    cut_static = tuple(
        (n, tuple(int(i) for i in fs.expand_ring(cut_levels[n], n,
                                                 patch_ring)))
        for n in sizes)

    kw = dict(sizes=sizes, hdi=hdi, problem=problem, precond=precond,
              cut_levels=cut_static, mg_coarsest=mg_coarsest,
              n_smooth=n_smooth, cheb_degree=cheb_degree,
              patch_colors=patch_colors,
              uniform_levels=fs.uniform_static(levels),
              cg_f64=cg_f64, mg_f32=_PRECISION == "f64",
              cheb_ops=cheb_ops)

    # MG transfer mode: uniform | smoothed (operator-smoothed pair) |
    # cut (per-cut-cell corrections; measured worse — experimentation)
    mg_transfer = os.environ.get("PROTON_BENCH_MGTRANSFER", "uniform")
    drec_list = None
    if precond == "mg" and mg_transfer == "cut":
        dl = tuple(levels[n].drec if n in levels else None
                   for n in sizes)
        if any(d is not None for d in dl):
            drec_list = dl
        else:
            print("WARNING: mg_transfer='cut' but no level has drec — "
                  "running UNIFORM transfers", file=sys.stderr)
    kw["smooth_transfers"] = mg_transfer == "smoothed"
    # interface-band deflation: 2K+1 Fourier modes along the band
    kw["deflate_K"] = int(os.environ.get("PROTON_BENCH_DEFLATE", "0"))
    # 2 = W-cycle (per-gap correction quality degrades with depth on
    # the Galerkin hierarchy; W re-visits recover it)
    kw["mg_gamma"] = int(os.environ.get("PROTON_BENCH_GAMMA", "1"))

    # band-Galerkin coarse corrections: the measured fix for the
    # V-cycle's band amplification (rediscretized coarse cut operators
    # overshoot; rho(E) 4.9 -> <1 with Galerkin band blocks)
    gal_list = None
    if use_gal:
        gal = fs.band_galerkin_levels(levels, hdi, problem, eta)
        gal_list = tuple(gal.get(n) for n in sizes)

    mg_pre = None
    chunk_fns = None
    # knobs that shape the S values but live outside (problem, stat):
    # part of the config-keyed mgdata cache key (see mg_setup_cached)
    kw["cache_extra"] = f"eta={eta}|prec={_PRECISION}|lean={lean}"
    if segment and fs.segments_can_reuse(kw):
        stat = fs.segments_static(kw)
        mgdata = fs.mg_setup_cached(S_list, stat, problem, drec_list,
                                    gal_list,
                                    extra_key=kw["cache_extra"])
        rhs, gF_cl = fs._rhs_jit(mesh, dofmap, cond, sizes=sizes,
                                 hdi=hdi, problem=problem,
                                 uniform_levels=stat["uniform_levels"])
        sync(*jax.tree.leaves(mgdata.coarse_chol),
             *jax.tree.leaves(rhs))
        mg_pre = (mgdata, rhs, gF_cl)
    t_mg_setup = time.perf_counter() - t0
    _progress(f"mg setup {t_mg_setup:.1f}s; solve (warm-up run)...")

    # ---------------- condensed face-grid solve ---------------------------
    # k >= 2 at N >= 256: libtpu faults on the while_loop-wrapped deep
    # V-cycle (every component runs standalone; the multilevel in-loop
    # composite crashes the worker — scripts/k2_fault_hunt.py), so the
    # solve runs as straight-line unrolled chunks with a host loop
    segstyle = os.environ.get(
        "PROTON_BENCH_SEGSTYLE",
        "chunk" if (k >= 2 and N >= 256 and
                    jax.default_backend() == "tpu") else "loop")

    chunk_steps = int(os.environ.get("PROTON_BENCH_CHUNK", "5"))
    if segstyle == "chunk" and fs.segments_can_reuse(kw) and \
            mg_pre is not None:
        stat = fs.segments_static(kw)
        S_fine = (cond.dS if isinstance(cond, cells_last.UniformCondCL)
                  else cond.S)
        chunk_fns = fs._make_chunk_fns(
            S_fine, mg_pre[0], n_smooth=kw.get("n_smooth", 1),
            patch_sweeps=kw.get("patch_sweeps", 1),
            smooth_transfers=kw.get("smooth_transfers", False),
            mg_gamma=kw.get("mg_gamma", 1), steps=chunk_steps, **stat)

    def solve():
        if segstyle == "chunk" and fs.segments_can_reuse(kw):
            return fs.solve_chunked(mesh, dofmap, cond, S_list, cgp,
                                    kw, pre=mg_pre, gal_list=gal_list,
                                    steps=chunk_steps, fns=chunk_fns)
        if segment:
            return fs.solve_segments(mesh, dofmap, cond, S_list, cgp,
                                     segment, kw, pre=mg_pre,
                                     drec_list=drec_list,
                                     gal_list=gal_list)
        kw_jit = {k2: v for k2, v in kw.items() if k2 != "cache_extra"}
        out = fs._solve_jit(mesh, dofmap, cond, S_list, cg_params=cgp,
                            drec_list=drec_list, gal_list=gal_list,
                            **kw_jit)
        return out[0], out[2], out[3], out[4]

    local, iters, exit_reason, rel = solve()
    sync(local)
    _progress(f"solve warm-up done ({int(iters)} iters, exit {int(exit_reason)}); timed solve...")
    t0 = time.perf_counter()
    local, iters, exit_reason, rel = solve()
    sync(local)
    t_solve = time.perf_counter() - t0
    _progress(f"solve {t_solve:.1f}s; h1...")

    # ---------------- H1 error vs manufactured solution -------------------
    h1 = None
    t_h1 = 0.0
    if want_h1:
        t0 = time.perf_counter()
        h1 = fs.fictdom_h1_error_chunked(mesh, geom, batch, cell_loc, hdi,
                                         local, problem.sol_grad)
        h1 = float(jax.block_until_ready(h1))
        t_h1 = time.perf_counter() - t0

    end_to_end = (t_setup + t_assembly + t_system + t_mg_setup +
                  t_solve + t_h1)

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
        "condensed_dofs": int(dofmap.n_dofs - dofmap.n_cells * dofmap.cbs),
        "warmup_s": round(t_warmup, 3),
        "setup_s": round(t_setup, 3),
        "cut_splice_s": round(t_splice, 3),
        "assembly_s": round(t_assembly, 4),
        "system_s": round(t_system, 3),
        "mg_setup_s": round(t_mg_setup, 3),
        "solve_s": round(t_solve, 3),
        "h1_s": round(t_h1, 3),
        "end_to_end_s": round(end_to_end, 3),
        "cg_iters": int(iters),
        "cg_rel_residual": float(rel),
        "cg_exit": int(exit_reason),
        "h1_error": h1,
        "precond": precond,
        "backend": jax.default_backend(),
        "precision": {"mixed": "mixed(f32+f64-cut)",
                      "f64": "f64(f32-mg-precond)",
                      "f32": "float32"}[_PRECISION],
    }
    return result


_K2_FIELDS = ("k", "dofs", "condensed_dofs", "cut_cells", "setup_s",
              "cut_splice_s", "assembly_s", "value", "system_s",
              "mg_setup_s", "solve_s", "h1_s", "end_to_end_s",
              "cg_iters", "cg_rel_residual", "cg_exit", "h1_error")


def main():
    N = int(os.environ.get("PROTON_BENCH_N", "1024"))
    result = run_bench(N, _BENCH_K)
    if _BENCH_K2:
        # north-star row (BASELINE.md): k=2 at the same mesh, same
        # precision mode, appended as a sub-object so the driver's one
        # recorded JSON line carries both degrees. Runs in a SUBPROCESS
        # with a timeout: k>=2 at large N is the historical device-fault
        # landscape (libtpu while_loop faults, post-fault wedges), and a
        # hang there must not take down the recorded k=1 row.
        gc.collect()
        import subprocess
        env = dict(os.environ)
        env["PROTON_BENCH_K"] = "2"
        k2_timeout = float(os.environ.get("PROTON_BENCH_K2_TIMEOUT",
                                          "3600"))
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=k2_timeout)
            if res.stderr:
                sys.stderr.write(res.stderr[-4000:])
            line = next(l for l in reversed(res.stdout.splitlines())
                        if l.startswith("{"))
            r2 = json.loads(line)
            result["k2"] = {f: r2[f] for f in _K2_FIELDS if f in r2}
        except Exception as e:  # record the failure, keep the k=1 row
            result["k2"] = {"error": repr(e)[:500]}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
