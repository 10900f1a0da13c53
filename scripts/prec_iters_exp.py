"""Does the MG-PCG iteration count at scale come from f32 rounding or
from V-cycle quality? Runs the lean fictdom solve at each N in BOTH
precisions on CPU (subprocess per config — x64 is process-global):
f64 iterations growing with N = MG quality problem; flat f64 but
growing f32 = precision problem (the TPU bench runs f32).

Usage: python scripts/prec_iters_exp.py [Ns...]"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = r'''
import os, sys, time
os.environ["PROTON_TPU_PLATFORM"] = "cpu"
os.environ["PROTON_TPU_X64"] = sys.argv[2]
sys.path.insert(0, %r)
import jax.numpy as jnp
from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.solvers import cg
N = int(sys.argv[1])
cgp = cg.CGParams(convergence_threshold=1e-6, divergence_threshold=1e8,
                  max_iter=20000, apply_preconditioner=True)
t0 = time.time()
r = fs.solve_fictdom_structured(N, 1, mixed=False, use_pallas=False,
                                cg_params=cgp, fitted="lean",
                                cg_segment=50 if sys.argv[2] == "0"
                                else 0)
print(f"N={N:5d} x64={sys.argv[2]} iters={int(r.iterations):5d} "
      f"exit={int(r.exit_reason)} h1={float(r.h1_error):.4e} "
      f"({time.time()-t0:.0f}s)", flush=True)
''' % HERE

Ns = [int(a) for a in sys.argv[1:]] or [256, 512]
for N in Ns:
    for x64 in ("1", "0"):
        subprocess.run([sys.executable, "-c", CHILD, str(N), x64],
                       check=False)
