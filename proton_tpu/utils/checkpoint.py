"""Checkpoint / resume for iterative outer loops (SURVEY.md section 5.4:
absent from the reference — its closest artifact is the per-iteration
SILO dumps of the obstacle active-set loop, which are outputs, not
restartable state; this module provides the restartable state).

Plain npz snapshots of array pytrees keyed by field name.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

import jax.numpy as jnp


def save_state(filename: str, **arrays):
    """Save named arrays atomically (write + rename)."""
    tmp = filename + ".tmp.npz"
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, filename)


def load_state(filename: str) -> Dict[str, jnp.ndarray]:
    data = np.load(filename)
    return {k: jnp.asarray(data[k]) for k in data.files}


def obstacle_checkpoint(filename: str, alpha_cells, beta, iteration: int):
    """Snapshot of the obstacle active-set state (obstacle.cpp keeps only
    SILO field dumps per cycle; this is the restartable equivalent)."""
    save_state(filename, alpha_cells=alpha_cells, beta=beta,
               iteration=np.int64(iteration))


def obstacle_resume(filename: str):
    s = load_state(filename)
    return s["alpha_cells"], s["beta"], int(s["iteration"])
