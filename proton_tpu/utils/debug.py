"""Debug/diagnostics toggles (SURVEY.md section 5.2: the reference's Debug
builds use AddressSanitizer; the TPU-native equivalents are JAX's NaN
debugging and checkify-style invariant checks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True):
    """jax_debug_nans: raise on the first NaN produced in any jitted
    computation (the closest analogue of -fsanitize in the reference's
    Debug builds)."""
    jax.config.update("jax_debug_nans", enable)


def check_classification(mesh, cutdata):
    """Host-side invariant sweep over a classified cut mesh (the asserts
    and throws of cuthho_geom.hpp:31-47, 335-336). Returns a dict of
    violation counts (all zero on a healthy mesh)."""
    import numpy as np

    from ..cut.classify import LOC_CUT, LOC_NEG, LOC_POS, detect_cut_cells

    out = {}
    node_loc = np.asarray(cutdata.node_loc)
    out["undef_nodes"] = int((~np.isin(node_loc,
                                       [LOC_NEG, LOC_POS])).sum())
    face_loc = np.asarray(cutdata.face_loc)
    out["undef_faces"] = int((~np.isin(face_loc,
                                       [LOC_NEG, LOC_POS, LOC_CUT])).sum())
    cell_loc = np.asarray(cutdata.cell_loc)
    out["undef_cells"] = int((~np.isin(cell_loc,
                                       [LOC_NEG, LOC_POS, LOC_CUT])).sum())

    # cut faces must separate sides
    fp_loc = node_loc[np.asarray(mesh.face_ptids)]
    cut = face_loc == LOC_CUT
    out["bad_cut_faces"] = int((fp_loc[cut, 0] == fp_loc[cut, 1]).sum())

    # cut cells: exactly two cut faces
    cf_loc = face_loc[np.asarray(mesh.cell_faces)]
    k = np.arange(mesh.max_pts)[None, :]
    valid = k < np.asarray(mesh.cell_npts)[:, None]
    counts = ((cf_loc == LOC_CUT) & valid).sum(axis=1)
    out["bad_cut_counts"] = int(((counts != 0) & (counts != 2)).sum())
    out["cut_cells_wrong_loc"] = int(
        ((counts == 2) != (cell_loc == LOC_CUT)).sum())

    # interface endpoints on the zero set are checked by the caller with
    # the level set in hand (see tests/test_cut_classify.py)
    return out


def assert_spd(matrices, atol: float = 1e-9, name: str = "matrix"):
    """Host-side SPD check of a batch of local matrices (the coercivity
    companion of check_eigs, cuthho_square.cpp:504-560)."""
    import numpy as np

    M = np.asarray(matrices)
    sym = np.max(np.abs(M - np.swapaxes(M, -1, -2)))
    if sym > atol:
        raise AssertionError(f"{name} not symmetric: max asym {sym:.3e}")
    eigs = np.linalg.eigvalsh(M)
    if eigs.min() < -atol:
        raise AssertionError(
            f"{name} not PSD: min eigenvalue {eigs.min():.3e}")
    return float(eigs.min())
