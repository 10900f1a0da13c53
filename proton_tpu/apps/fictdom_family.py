"""Batched geometry families: solve the fictdom problem for a FAMILY of
circle level sets in one vmapped TPU program (cut/batched.py — the
BASELINE.md stretch configuration; the reference can only loop
`cuthho_square` one geometry at a time, cuthho_square.cpp:2030-2031).

Usage:
  python -m proton_tpu.apps.fictdom_family -N 256 -k 1 -B 64
  python -m proton_tpu.apps.fictdom_family -N 64 -B 8 --geom-chunk 4

Geometries: B circles with radii linearly spaced in [r0, r1] and
centers on a small deterministic jitter grid around (0.5, 0.5) (every
geometry cuts the mesh differently). Prints one JSON line with
timings and per-geometry H1 errors/iterations.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# k=1 families run float32 on TPU: emulated f64 in the row-major
# [C, d, d] local-operator layout tile-pads ~16x and OOMs at 256^2 x 8
# geometries (f64 stays the default off-TPU for the accuracy gates)
os.environ.setdefault("PROTON_TPU_X64", "0")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-N", type=int, default=64, help="cells per side")
    ap.add_argument("-k", type=int, default=1, help="method degree")
    ap.add_argument("-B", type=int, default=8, help="number of geometries")
    ap.add_argument("--r0", type=float, default=0.25)
    ap.add_argument("--r1", type=float, default=0.42)
    ap.add_argument("--geom-chunk", type=int, default=None,
                    help="lax.map tile over geometries (memory bound)")
    ap.add_argument("--capacity", type=int, default=None,
                    help="padded cut-class capacity (default 6N)")
    ap.add_argument("--shape", choices=("circle", "ellipse", "flower"),
                    default="circle",
                    help="level-set family (cut/batched.py + "
                         "cut/levelset.py)")
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args(argv)

    import jax
    from proton_tpu.cut import batched
    from proton_tpu.solvers import cg

    B = args.B
    radii = np.linspace(args.r0, args.r1, B)
    rng = np.linspace(0.0, 2.0 * np.pi, B, endpoint=False)
    centers = 0.5 + 0.02 * np.stack([np.cos(rng), np.sin(rng)], axis=1)

    cgp = cg.CGParams(convergence_threshold=args.tol,
                      divergence_threshold=1e8, max_iter=50000,
                      apply_preconditioner=True)

    t0 = time.perf_counter()
    if args.shape == "circle":
        res = batched.solve_fictdom_family(
            args.N, args.k, radii, centers, capacity=args.capacity,
            geom_chunk=args.geom_chunk, cg_params=cgp)
    elif args.shape == "ellipse":
        params = (radii, 0.8 * radii, centers[:, 0], centers[:, 1])
        res = batched.solve_fictdom_family_params(
            args.N, args.k, params, batched.ellipse_family,
            capacity=args.capacity, geom_chunk=args.geom_chunk,
            cg_params=cgp)
    else:
        from proton_tpu.cut import levelset
        from proton_tpu.cut.fictdom_structured import (FictdomProblem,
                                                       default_problem)

        def flower_family(p):
            r0, amp, cx, cy = p
            base = default_problem()
            return FictdomProblem(
                levelset.flower_level_set(r0, amp, 5, cx, cy),
                base.rhs_fun, base.sol_fun, base.sol_grad)

        params = (radii, 0.1 * radii, centers[:, 0], centers[:, 1])
        res = batched.solve_fictdom_family_params(
            args.N, args.k, params, flower_family,
            capacity=args.capacity, geom_chunk=args.geom_chunk,
            cg_params=cgp)
    jax.block_until_ready(res.h1_error)
    t_total = time.perf_counter() - t0

    out = {
        "N": args.N, "k": args.k, "B": B,
        "total_s": round(t_total, 3),
        "per_geometry_s": round(t_total / B, 3),
        "h1_errors": [round(float(h), 8) for h in np.asarray(res.h1_error)],
        "iterations": [int(i) for i in np.asarray(res.iterations)],
        "n_cut": [int(c) for c in np.asarray(res.n_cut)],
        "all_converged": bool(np.all(np.asarray(res.exit_reason) == 0)),
        "overflow": int(np.sum(np.asarray(res.n_cut_overflow))),
        "shape": args.shape,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
