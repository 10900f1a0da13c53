"""HHO obstacle problem app (replaces apps/obstacle/obstacle.cpp).

Flags mirror the reference getopt (-k degree in {0,1}, -N subdivisions,
obstacle.cpp:243-266); per-iteration field dumps go to VTK instead of SILO.

Usage: python -m proton_tpu.apps.obstacle -k 1 -N 32 [--dump]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-k", type=int, default=0, help="degree (0 or 1)")
    ap.add_argument("-N", type=int, default=5, help="cells per direction")
    ap.add_argument("--dump", action="store_true",
                    help="write VTK field dumps")
    ap.add_argument("--dump-iterations", action="store_true",
                    help="write obstacle_cycle_<i>.vtk per active-set "
                         "iteration (the reference's per-cycle SILO dumps)")
    args = ap.parse_args(argv)

    from proton_tpu.methods import obstacle
    from proton_tpu.utils.timing import TimeCounter, bold, green, magenta

    callback = None
    if args.dump_iterations:
        import proton_tpu as pt
        from proton_tpu.core.mesh import MeshInitParams
        from proton_tpu.io.vtk import VtkWriter
        dump_mesh = pt.make_quad_mesh(MeshInitParams(
            min_x=-1.0, min_y=-1.0, Nx=args.N, Ny=args.N))

        def callback(i, fields):
            w = VtkWriter(dump_mesh)
            w.add_variable("alpha", np.asarray(fields["alpha"]), "zonal")
            w.add_variable("beta", np.asarray(fields["beta"]), "zonal")
            w.add_variable("active",
                           np.asarray(fields["active"], dtype=float),
                           "zonal")
            w.write_vtk(f"obstacle_cycle_{i - 1}.vtk")

    tc = TimeCounter().tic()
    res = obstacle.run_obstacle(args.N, args.k,
                                iteration_callback=callback)
    tc.toc(res.alpha)
    print(green(f"Active-set solve ({int(res.iterations)} iterations): ")
          + bold(f"{tc} seconds"))
    print(bold(magenta(f"Error: {float(res.energy_error)}")))

    if args.dump:
        import proton_tpu as pt
        from proton_tpu.core.mesh import MeshInitParams
        from proton_tpu.io.vtk import VtkWriter
        mesh = pt.make_quad_mesh(MeshInitParams(min_x=-1.0, min_y=-1.0,
                                                Nx=args.N, Ny=args.N))
        C = mesh.num_cells
        w = VtkWriter(mesh)
        w.add_variable("alpha", np.asarray(res.alpha)[:C], "zonal")
        w.add_variable("beta", np.asarray(res.beta), "zonal")
        w.write_vtk("obstacle_solution.vtk")
        w.write_npz("obstacle_solution.npz")
        print("wrote obstacle_solution.{vtk,npz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
