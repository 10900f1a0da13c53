"""Uncut HHO Poisson h/k-convergence study
(replaces apps/convergence_test/convergence_test.cpp).

Config: CLI flags or a Python/JSON config file with the same keys as the
reference's Lua config (deg_min, deg_max, min_N, steps, precond, direct,
stab_hho — convergence_test.cpp:355-361; plain Python replaces Lua per the
BASELINE.json north star). Prints observed orders log2(e_prev/e_cur) for
the L2, projection-L2 and energy errors like the reference (:313-325), and
writes the hho_history / cg_history files (:155-161, :232-242).

Usage: python -m proton_tpu.apps.convergence_test [config.json] [flags]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


@dataclasses.dataclass
class ConvergenceTestParams:
    """convergence_test_params defaults (convergence_test.cpp:69-78)."""

    deg_min: int = 0
    deg_max: int = 6
    min_N: int = 4
    steps: int = 5
    precond: bool = True
    direct: bool = False
    stab_hho: bool = True


def test_method_convergence(ctp: ConvergenceTestParams,
                            write_files: bool = True):
    import jax.numpy as jnp
    import proton_tpu as pt
    from proton_tpu.methods import assembly, poisson
    from proton_tpu.solvers import cg
    from proton_tpu.utils.timing import TimeCounter

    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
    sol_grad = lambda p: jnp.stack(
        [pi * jnp.cos(pi * p[..., 0]) * jnp.sin(pi * p[..., 1]),
         pi * jnp.sin(pi * p[..., 0]) * jnp.cos(pi * p[..., 1])], axis=-1)

    all_results = {}
    for k in range(ctp.deg_min, ctp.deg_max + 1):
        print(f"Testing degree {k}")
        hdi = pt.HHODegreeInfo(k + 1, k)
        stab = "hho" if ctp.stab_hho else "naive"
        errors = []
        hist_name = (f"hho_history_precond_{k}.txt" if ctp.precond
                     else f"hho_history_{k}.txt")
        hist_rows = []

        N = ctp.min_N
        for i in range(ctp.steps):
            mesh = pt.make_quad_mesh(Nx=N, Ny=N)
            dofmap = assembly.build_dofmap(mesh, hdi)
            cgp = cg.CGParams(convergence_threshold=1e-12,
                              divergence_threshold=1e8,
                              max_iter=3 * dofmap.n_dofs,
                              apply_preconditioner=ctp.precond,
                              record_history=write_files)
            if ctp.direct:
                # direct path (the reference's SparseLU branch,
                # convergence_test.cpp:222-229): densified Cholesky —
                # fine at the study's system sizes
                import jax.numpy as jnp
                from proton_tpu.core.geometry import cell_geometry
                from proton_tpu.core.ops import cell_rhs
                from proton_tpu.solvers.cg import CGResult
                geom = cell_geometry(mesh)
                oper, lc = poisson.assemble_local(mesh, geom, hdi, stab)
                fvec = cell_rhs(mesh, geom, hdi.cell_degree, rhs_fun)
                fd = assembly.dirichlet_face_data(mesh, hdi, sol_fun)
                g_loc = assembly.local_dirichlet_data(dofmap, mesh, fd)
                rhs = assembly.assemble_rhs(dofmap, fvec, lc, g_loc)
                A = assembly.assemble_bcoo(dofmap, lc).todense()
                from proton_tpu.solvers.cg import solve_spd_dense
                x = solve_spd_dense(A, rhs)
                local = assembly.take_local_data(dofmap, x, g_loc)
                sol = poisson.PoissonSolution(
                    x, local, oper, jnp.int32(0), jnp.int32(0),
                    jnp.asarray(0.0), None)
            else:
                sol = poisson.solve_poisson(mesh, dofmap, hdi, rhs_fun,
                                            sol_fun, stab, cgp)
                if int(sol.exit_reason) != cg.CONVERGED:
                    print("Warning! Solver didn't converge...")
            errs = poisson.compute_errors(mesh, hdi, sol, sol_fun, sol_grad)
            e = (float(errs.l2), float(errs.l2_proj), float(errs.energy))
            errors.append(e)

            if write_files and sol.history is not None:
                cg_name = (f"cg_history_precond_{N}_{k}.txt" if ctp.precond
                           else f"cg_history_{N}_{k}.txt")
                h = np.asarray(sol.history)
                h = h[np.isfinite(h)]
                np.savetxt(cg_name, h)

            from proton_tpu.core.geometry import cell_diameters
            mesh_h = float(cell_diameters(mesh)[0])
            hist_rows.append((mesh_h, e[0] ** 2, e[1] ** 2))

            if i > 0:
                prev, cur = errors[i - 1], errors[i]
                orders = [np.log2(p / c) for p, c in zip(prev, cur)]
                print(f"{orders[0]:.6g}\t\t{orders[1]:.6g}\t\t"
                      f"{orders[2]:.6g}")
            N *= 2

        if write_files:
            with open(hist_name, "w") as fh:
                for row in hist_rows:
                    fh.write(" ".join(map(str, row)) + "\n")
        all_results[k] = errors
    return all_results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", help="JSON config file")
    ap.add_argument("--deg-min", type=int)
    ap.add_argument("--deg-max", type=int)
    ap.add_argument("--min-N", type=int, dest="min_N")
    ap.add_argument("--steps", type=int)
    ap.add_argument("--no-precond", action="store_true")
    ap.add_argument("--direct", action="store_true")
    ap.add_argument("--stab-naive", action="store_true")
    ap.add_argument("--no-files", action="store_true")
    args = ap.parse_args(argv)

    ctp = ConvergenceTestParams()
    if args.config:
        with open(args.config) as fh:
            for key, val in json.load(fh).items():
                if hasattr(ctp, key):
                    setattr(ctp, key, val)
                else:
                    print(f"ignoring unknown config key '{key}'")
    if args.deg_min is not None:
        ctp.deg_min = args.deg_min
    if args.deg_max is not None:
        ctp.deg_max = args.deg_max
    if args.min_N is not None:
        ctp.min_N = args.min_N
    if args.steps is not None:
        ctp.steps = args.steps
    if args.no_precond:
        ctp.precond = False
    if args.direct:
        ctp.direct = True
    if args.stab_naive:
        ctp.stab_hho = False

    test_method_convergence(ctp, write_files=not args.no_files)
    return 0


if __name__ == "__main__":
    sys.exit(main())
