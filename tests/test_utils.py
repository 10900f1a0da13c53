"""utils: checkpoint/resume and debug sweeps."""

import numpy as np
import jax.numpy as jnp
import pytest

import proton_tpu as pt
from proton_tpu.methods import obstacle
from proton_tpu.utils import checkpoint, debug


def test_checkpoint_roundtrip(tmp_path):
    fn = str(tmp_path / "state.npz")
    a = jnp.arange(5.0)
    b = jnp.ones((3,))
    checkpoint.obstacle_checkpoint(fn, a, b, 7)
    a2, b2, it = checkpoint.obstacle_resume(fn)
    assert np.allclose(np.asarray(a2), np.asarray(a))
    assert np.allclose(np.asarray(b2), np.asarray(b))
    assert it == 7


def test_obstacle_resume_equivalence(tmp_path):
    """Resuming from a mid-run snapshot reaches the same answer."""
    res_full = obstacle.run_obstacle(8, 0)
    C = 64
    # snapshot after 2 iterations via the callback
    snaps = {}

    def cb(i, fields):
        snaps[i] = (np.asarray(fields["alpha"]), np.asarray(fields["beta"]))

    obstacle.run_obstacle(8, 0, iteration_callback=cb, max_iter=2)
    a2, b2 = snaps[max(snaps)]
    res_resumed = obstacle.run_obstacle(8, 0, initial_state=(a2, b2))
    assert bool(res_resumed.converged)
    assert np.isclose(float(res_resumed.energy_error),
                      float(res_full.energy_error), rtol=1e-8)


def test_debug_classification_sweep():
    from proton_tpu.cut import classify, levelset
    mesh = pt.make_poly_mesh(Nx=8, Ny=8)
    ls = levelset.circle_level_set(0.35, 0.5, 0.5)
    mesh, cd = classify.cut_preprocess(mesh, ls, levels=2)
    out = debug.check_classification(mesh, cd)
    assert all(v == 0 for v in out.values()), out


def test_debug_assert_spd():
    A = jnp.eye(4)[None] * 2.0
    assert debug.assert_spd(A) > 0
    B = jnp.diag(jnp.array([1.0, -1.0]))[None]
    with pytest.raises(AssertionError):
        debug.assert_spd(B)
