"""MG tuning on TPU f32: iteration counts + solve time of the structured
fictdom driver across N / smoother configs.

Usage: python scripts/mg_tune.py [k] [Nmax]
(TPU default backend; PROTON_TPU_X64 must be 0 unless k >= 2 mixed.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
k = int(sys.argv[1]) if len(sys.argv) > 1 else 1
Nmax = int(sys.argv[2]) if len(sys.argv) > 2 else 512
mixed = k >= 2
os.environ.setdefault("PROTON_TPU_X64", "1" if mixed else "0")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.solvers import cg

cgp = cg.CGParams(convergence_threshold=1e-6, divergence_threshold=1e8,
                  max_iter=50000, apply_preconditioner=True)

N = 64
while N <= Nmax:
    for label, kw in [
        ("jacobi        ", dict(precond="jacobi")),
        ("mg s1 r0      ", dict(precond="mg", n_smooth=1)),
        ("mg s1 r1      ", dict(precond="mg", n_smooth=1, patch_ring=1)),
        ("mg s2 r1      ", dict(precond="mg", n_smooth=2, patch_ring=1)),
    ]:
        t0 = time.perf_counter()
        r = fs.solve_fictdom_structured(N, k, mixed=mixed, cg_params=cgp,
                                        compute_h1=True, **kw)
        t = time.perf_counter() - t0
        print(f"N={N:5d} k={k} {label} iters={int(r.iterations):6d} "
              f"exit={int(r.exit_reason)} h1={float(r.h1_error):.3e} "
              f"solve={r.timings['solve_s']:.3f}s "
              f"asm={r.timings['assemble_fine_s']:.2f}+"
              f"{r.timings['assemble_coarse_s']:.2f}s tot={t:.1f}s",
              flush=True)
    N *= 2
