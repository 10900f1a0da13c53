"""CLI apps + I/O layer smoke/contract tests."""

import json
import os

import numpy as np
import pytest

import proton_tpu as pt


def test_vtk_writer(tmp_path):
    from proton_tpu.io.vtk import VtkWriter
    mesh = pt.make_quad_mesh(Nx=3, Ny=3)
    w = VtkWriter(mesh)
    w.add_variable("u", np.arange(9, dtype=float), "zonal")
    w.add_variable("phi", np.arange(16, dtype=float), "nodal")
    with pytest.raises(ValueError):
        w.add_variable("bad", np.arange(5, dtype=float), "zonal")
    vtk = tmp_path / "out.vtk"
    w.write_vtk(str(vtk))
    text = vtk.read_text()
    assert "UNSTRUCTURED_GRID" in text
    assert "POINTS 16 double" in text
    assert "CELLS 9" in text
    assert "SCALARS u" in text and "SCALARS phi" in text
    npz = tmp_path / "out.npz"
    w.write_npz(str(npz))
    data = np.load(str(npz))
    assert data["zonal_u"].shape == (9,)


def test_gnuplot_output(tmp_path):
    from proton_tpu.io.gnuplot import GnuplotOutput, PostprocessOutput
    gp = GnuplotOutput(str(tmp_path / "a.dat"))
    gp.add_data(np.array([[0.0, 1.0], [2.0, 3.0]]), np.array([4.0, 5.0]))
    po = PostprocessOutput()
    po.add_object(gp)
    assert po.write()
    lines = (tmp_path / "a.dat").read_text().strip().split("\n")
    assert lines[0].split() == ["0.0", "1.0", "4.0"]


def test_output_mesh_info(tmp_path, monkeypatch):
    from proton_tpu.cut import classify, levelset
    from proton_tpu.io.vtk import output_mesh_info
    monkeypatch.chdir(tmp_path)
    mesh = pt.make_poly_mesh(Nx=6, Ny=6)
    ls = levelset.circle_level_set(0.35, 0.5, 0.5)
    mesh, cd = classify.cut_preprocess(mesh, ls, levels=1)
    output_mesh_info(mesh, cd, ls)
    assert (tmp_path / "cuthho_meshinfo.vtk").exists()
    data = np.load(tmp_path / "cuthho_meshinfo.npz")
    assert set(np.unique(data["zonal_cut_cells"])) <= {-1.0, 0.0, 1.0}


def test_convergence_test_app(capsys):
    from proton_tpu.apps.convergence_test import (ConvergenceTestParams,
                                                  test_method_convergence)
    ctp = ConvergenceTestParams(deg_min=1, deg_max=1, min_N=4, steps=2)
    results = test_method_convergence(ctp, write_files=False)
    out = capsys.readouterr().out
    assert "Testing degree 1" in out
    errs = results[1]
    assert errs[0][0] > errs[1][0]  # L2 error decreased


def test_stabilization_test_app():
    from proton_tpu.apps.stabilization_test import test_stabilization
    e1 = test_stabilization(4, 1)
    e2 = test_stabilization(8, 1)
    order = np.log2(e1 / e2)
    assert order > 1.5  # ~k+1 = 2


def test_obstacle_app(capsys):
    from proton_tpu.apps.obstacle import main
    assert main(["-k", "0", "-N", "8"]) == 0
    out = capsys.readouterr().out
    assert "Error: 2.262" in out


def test_cuthho_square_app(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from proton_tpu.apps.cuthho_square import main
    assert main(["-f", "-M", "8", "-N", "8", "-k", "0", "-r", "2"]) == 0
    out = capsys.readouterr().out
    assert "Energy-norm absolute error" in out


def test_polymesh_app(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # write a small poly mesh (2x1 unit rectangle as two squares)
    content = """6
0.0 0.0
1.0 0.0
2.0 0.0
0.0 1.0
1.0 1.0
2.0 1.0
2
4 1 0 1 4 3
4 1 1 2 5 4
6
1 0 1
1 1 2
1 2 5
1 5 4
1 4 3
1 3 0
"""
    fn = tmp_path / "mesh.txt"
    fn.write_text(content)
    from proton_tpu.apps.polymesh import main
    assert main([str(fn)]) == 0
    out = capsys.readouterr().out
    assert "L2-norm error" in out
    assert (tmp_path / "polymesh_solution.vtk").exists()


def test_bench_script(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("PROTON_BENCH_N", "16")
    monkeypatch.setenv("PROTON_BENCH_MAXIT", "2000")
    import subprocess
    import sys
    env = dict(os.environ, PROTON_BENCH_N="16", PROTON_TPU_PLATFORM="cpu",
               PROTON_BENCH_MAXIT="2000")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().split("\n")[-1]
    data = json.loads(line)
    assert data["unit"] == "elements/s"
    assert data["value"] > 0
    assert "vs_baseline" in data


def test_fictdom_family_app(capsys):
    """proton-fictdom-family CLI: 3 geometries at 16^2 in one vmapped
    solve, JSON output with per-geometry results."""
    from proton_tpu.apps import fictdom_family

    assert fictdom_family.main(["-N", "16", "-B", "3"]) == 0
    data = json.loads(capsys.readouterr().out.strip().split("\n")[-1])
    assert data["all_converged"]
    assert data["overflow"] == 0
    assert len(data["h1_errors"]) == 3
    # every geometry cuts differently but all stay at the k=1
    # discretization level on a 16^2 mesh
    assert max(data["h1_errors"]) < 0.05
