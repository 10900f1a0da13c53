"""cutHHO on a unit-square mesh cut by a circle level set
(replaces apps/cuthho/cuthho_square.cpp:1940-2135).

Flags mirror the reference getopt string "k:M:N:r:ifDAd" (:1971):
  -k degree, -M/-N cells per direction, -r interface refinement steps,
  -i solve the interface problem, -f solve the fictitious-domain problem,
  -D displacement bad-cut fix (default), -A agglomeration detection,
  -d dump debug data (VTK mesh info + matplotlib dumps).

(The reference README documents a '-m' flag that does not exist; actual
flags are -D/-A — SURVEY.md "known bugs".)

Usage: python -m proton_tpu.apps.cuthho_square -f -N 16 -k 1
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-k", type=int, default=0, help="method degree")
    ap.add_argument("-M", type=int, default=5, help="cells in x")
    ap.add_argument("-N", type=int, default=5, help="cells in y")
    ap.add_argument("-r", type=int, default=4,
                    help="interface refinement steps")
    ap.add_argument("-i", action="store_true",
                    help="solve interface problem")
    ap.add_argument("-f", action="store_true",
                    help="solve fictitious-domain problem")
    ap.add_argument("-D", action="store_true",
                    help="node displacement for bad cuts (default)")
    ap.add_argument("-A", action="store_true",
                    help="agglomeration detection for bad cuts")
    ap.add_argument("-d", action="store_true", help="dump debug data")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import proton_tpu as pt
    from proton_tpu.cut import classify, fictdom, interface_problem, levelset
    from proton_tpu.utils.timing import TimeCounter, bold, green, yellow

    tc = TimeCounter().tic()
    mesh = pt.make_poly_mesh(Nx=args.M, Ny=args.N)
    tc.toc(mesh.points)
    print(bold(yellow(f"Mesh generation: {tc} seconds")))

    radius = 0.35
    ls = levelset.circle_level_set(radius, 0.5, 0.5)

    tc.tic()
    mesh, cutdata = classify.cut_preprocess(
        mesh, ls, levels=args.r, agglomeration=args.A)
    tc.toc(cutdata.cell_loc)
    print(bold(yellow(f"cutHHO-specific mesh preprocessing: {tc} seconds")))

    if args.d:
        from proton_tpu.io.vtk import output_mesh_info
        output_mesh_info(mesh, cutdata, ls)
        try:
            from proton_tpu.io.debug_plots import dump_mesh, \
                plot_triangulation
            dump_mesh(mesh, cutdata)
            plot_triangulation(mesh, cutdata, classify.LOC_NEG)
        except ImportError:
            print("matplotlib unavailable; skipped debug plots")
        print("wrote cuthho_meshinfo.{vtk,npz}")

    pi = np.pi
    rhs_fun = lambda p: 2.0 * pi ** 2 * jnp.sin(pi * p[..., 0]) * \
        jnp.sin(pi * p[..., 1])
    sol_fun = lambda p: jnp.sin(pi * p[..., 0]) * jnp.sin(pi * p[..., 1])
    sol_grad = lambda p: jnp.stack(
        [pi * jnp.cos(pi * p[..., 0]) * jnp.sin(pi * p[..., 1]),
         pi * jnp.sin(pi * p[..., 0]) * jnp.cos(pi * p[..., 1])], axis=-1)

    if args.i:
        tc.tic()
        res = interface_problem.solve_interface(
            mesh, cutdata, ls, args.k, rhs_fun, sol_fun, sol_grad)
        tc.toc(res.x)
        print(bold(yellow(f"Interface solve: {tc} seconds "
                          f"({int(res.iterations)} CG iterations)")))
        print(bold(green("Energy-norm absolute error:           "
                         f"{float(res.h1_error)}")))

    if args.f:
        tc.tic()
        res = fictdom.solve_fictdom(
            mesh, cutdata, ls, args.k, rhs_fun, sol_fun, sol_grad)
        tc.toc(res.x)
        print(bold(yellow(f"Fictdom solve: {tc} seconds "
                          f"({int(res.iterations)} CG iterations)")))
        print(bold(green("Energy-norm absolute error:           "
                         f"{float(res.h1_error)}")))

        if args.d:
            # point-cloud postprocess outputs (fictdom_uT.dat etc.,
            # cuthho_square.cpp:939-942, 1066-1070)
            from proton_tpu.io.gnuplot import GnuplotOutput, \
                PostprocessOutput
            pts, uT, Ru, diff = fictdom.fictdom_fields(
                mesh, cutdata, ls, args.k, res, sol_fun)
            post = PostprocessOutput()
            for name, vals in (("fictdom_uT.dat", uT),
                               ("fictdom_Ru.dat", Ru),
                               ("fictdom_diff.dat", diff)):
                gp = GnuplotOutput(name)
                gp.add_data(pts, vals)
                post.add_object(gp)
            post.write()
            print("wrote fictdom_{uT,Ru,diff}.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
