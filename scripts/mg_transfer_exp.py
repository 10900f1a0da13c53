"""A/B the MG transfer modes on the bench pipeline: iteration counts +
solve seconds at N = 128..1024 (mixed f32, segmented CG — the exact
bench recipe) with PROTON_BENCH_MGTRANSFER in {uniform, smoothed}.

Usage: python scripts/mg_transfer_exp.py [Nmax] [k] [modes,csv]
Runs bench.py as subprocesses (serialized; 1-core host) with
PROTON_BENCH_H1=0 to skip the error phase.
"""
import json
import os
import subprocess
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
Nmax = int(sys.argv[1]) if len(sys.argv) > 1 else 512
k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
modes = (sys.argv[3].split(",") if len(sys.argv) > 3
         else ["uniform", "smoothed"])

N = 128
while N <= Nmax:
    for ct in modes:
        env = dict(os.environ, PROTON_BENCH_N=str(N),
                   PROTON_BENCH_K=str(k), PROTON_BENCH_H1="0",
                   PROTON_BENCH_MGTRANSFER=ct)
        out = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py")],
            capture_output=True, text=True, env=env, timeout=3600)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")]
        if not line:
            print(f"N={N} cuttr={ct}: FAILED\n{out.stdout[-2000:]}"
                  f"\n{out.stderr[-2000:]}", flush=True)
            continue
        r = json.loads(line[-1])
        print(f"N={N} k={k} cuttr={ct}: iters={r['cg_iters']} "
              f"solve={r['solve_s']}s mg_setup={r['mg_setup_s']}s "
              f"assembly={r['assembly_s']}s exit={r['cg_exit']}",
              flush=True)
    N *= 2
