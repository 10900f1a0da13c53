"""MG iteration counts of the cheb_ops variants (exact / mixed /
uniform smoother operator pairs) on CPU — preconditioner QUALITY is
hardware-independent, so the cheap CPU run picks the variant before any
TPU compile is spent. Usage: python scripts/chebops_exp.py [Ns...]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PROTON_TPU_PLATFORM"] = "cpu"

import jax  # noqa: E402

from proton_tpu.cut import fictdom_structured as fs  # noqa: E402
from proton_tpu.solvers import cg  # noqa: E402

Ns = [int(a) for a in sys.argv[1:]] or [128, 256]
cgp = cg.CGParams(convergence_threshold=1e-6, divergence_threshold=1e8,
                  max_iter=20000, apply_preconditioner=True)

for N in Ns:
    for ops in ("exact", "mixed", "uniform"):
        t0 = time.perf_counter()
        r = fs.solve_fictdom_structured(
            N, 1, mixed=False, use_pallas=False, cg_params=cgp,
            cheb_ops=ops, fitted="lean", compute_h1=True)
        print(f"N={N:5d} cheb_ops={ops:8s} iters={int(r.iterations):5d} "
              f"exit={int(r.exit_reason)} h1={float(r.h1_error):.4e} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
