"""Obstacle problem: reproduce the reference's stored convergence table
(apps/obstacle/results/convergence.txt — the BASELINE.md accuracy gate)."""

import numpy as np
import pytest

from proton_tpu.methods import obstacle

# energy-norm errors from apps/obstacle/results/convergence.txt:1-5
REFERENCE_TABLE = {
    0: {8: 2.26205, 16: 1.2833, 32: 0.650286},
    1: {8: 0.197735, 16: 0.0588187, 32: 0.0171607},
}
REFERENCE_TABLE_LARGE = {
    0: {64: 0.326314, 128: 0.163344},
    1: {64: 0.00529786, 128: 0.00168321},
}


@pytest.mark.parametrize("k", [0, 1])
def test_obstacle_matches_reference_table(k):
    for N, ref in REFERENCE_TABLE[k].items():
        res = obstacle.run_obstacle(N, k)
        assert bool(res.converged)
        err = float(res.energy_error)
        assert abs(err - ref) / ref < 1e-4, (N, k, err, ref)


@pytest.mark.slow
@pytest.mark.parametrize("k", [0, 1])
def test_obstacle_matches_reference_table_large(k):
    """convergence.txt rows N=64,128 (apps/obstacle/results/convergence.txt:4-5)."""
    for N, ref in REFERENCE_TABLE_LARGE[k].items():
        res = obstacle.run_obstacle(N, k)
        assert bool(res.converged)
        err = float(res.energy_error)
        assert abs(err - ref) / ref < 1e-4, (N, k, err, ref)


def test_obstacle_active_set_properties():
    res = obstacle.run_obstacle(16, 0)
    alpha_cells = np.asarray(res.alpha)[:16 * 16]
    beta = np.asarray(res.beta)
    # complementarity: alpha >= gamma (= 0) up to solver tolerance where
    # inactive; beta nonzero only on the active set, where alpha == gamma
    active = beta != 0
    assert np.allclose(alpha_cells[active], 0.0)
    assert (alpha_cells[~active] > -1e-9).all()
    # active set is the contact region r < r0: check a center cell is active
    # (cell nearest origin) and a corner cell is not
    assert active.sum() > 0
    assert not active[0]  # corner (-1,-1): r > r0


def test_obstacle_degree_fallback(capsys):
    res = obstacle.run_obstacle(8, 3)  # invalid -> falls back to 1
    out = capsys.readouterr().out
    assert "Falling back to 1" in out
    assert bool(res.converged)
