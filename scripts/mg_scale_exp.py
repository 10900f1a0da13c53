"""Diagnose the MG-PCG iteration growth on cut problems (ROADMAP item
7: 44 iters at 128^2 -> 372 at 1024^2 on TPU round 2).

Separates the two candidate causes:
  (a) algorithmic: interface smoothing weakens as the cut configuration
      set grows with N  -> shows up in full-f64 V-cycle counts too;
  (b) precision: the f32 V-cycle loses its spectral quality under the
      cond ~ N^2 fine system -> f64 V-cycle flat, f32 V-cycle grows.

Usage: python scripts/mg_scale_exp.py [Nmax] [k] [tol]
Runs on CPU f64 (PROTON_TPU_PLATFORM=cpu). MODE=seg32 instead runs the
bench's exact TPU recipe (pure f32, segmented CG with true-residual
restarts) to reproduce the hardware iteration counts off-device.
"""
import os
import sys
import time

MODE = os.environ.get("MODE", "f64")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_PLATFORM", "cpu")
os.environ.setdefault("PROTON_TPU_X64", "0" if MODE == "seg32" else "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.solvers import cg

Nmax = int(sys.argv[1]) if len(sys.argv) > 1 else 512
k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-6

cgp = cg.CGParams(convergence_threshold=tol, max_iter=3000,
                  apply_preconditioner=True)

if MODE == "seg32":
    CONFIGS = [
        ("f32 seg50 (bench)  ", dict(cg_segment=50)),
        ("f32 seg50 colors=2 ", dict(cg_segment=50, patch_colors=2)),
    ]
else:
    CONFIGS = [
        ("f64 V-cycle        ", dict()),
        ("f32 V-cycle        ", dict(mg_f32=True, cg_f64=True)),
        ("f64 colors=2       ", dict(patch_colors=2)),
        ("f64 ns=2           ", dict(n_smooth=2)),
        ("f64 ring=2         ", dict(patch_ring=2)),
    ]

N = 128
while N <= Nmax:
    for label, kw in CONFIGS:
        t0 = time.perf_counter()
        r = fs.solve_fictdom_structured(
            N, k, mixed=False, use_pallas=False, cg_params=cgp,
            compute_h1=False, fitted="uniform", **kw)
        print(f"N={N:5d} k={k} {label} iters={int(r.iterations):5d} "
              f"exit={int(r.exit_reason)} rel={float(r.rel_residual):.2e} "
              f"t={time.perf_counter()-t0:.1f}s", flush=True)
    N *= 2
