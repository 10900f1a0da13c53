"""Host-setup scaling smoke: time _classify_host (band classification
on the CPU host) and the lean fine-level assembly at growing N — the
4096^2 stretch-readiness check (ROADMAP item 4). Measures wall time and
peak RSS per stage; runs entirely on CPU.

Usage: python scripts/setup_scale_exp.py [N...]  (default 1024 2048 4096)
"""
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_PLATFORM", "cpu")
os.environ.setdefault("PROTON_TPU_X64", "0")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.core.geometry import cell_geometry
from proton_tpu.cut import fictdom_structured as fs


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


Ns = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
k = int(os.environ.get("K", "1"))
hdi = HHODegreeInfo(k + 1, k)
problem = fs.default_problem()
eta = fs.nitsche_eta(k)

for N in Ns:
    t0 = time.perf_counter()
    mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = fs._classify_host(
        N, hdi, problem, 4, mixed=False)
    t_cls = time.perf_counter() - t0
    print(f"N={N:5d} classify_host: {t_cls:7.1f}s  cut={len(cut_ids)} "
          f"dist={len(dist_ids)}  rss={rss_gb():.1f}GB", flush=True)

    t0 = time.perf_counter()
    geom = jax.jit(cell_geometry)(mesh)
    unit_host = fs._unit_cell_host(hdi, 1.0 / N)
    irr = np.union1d(dist_ids, np.asarray(cut_ids))
    unit = tuple(jnp.asarray(a, jnp.float32) for a in unit_host)
    cond = fs._assemble_level_uniform_lean(
        mesh, geom, cell_loc, batch,
        jnp.asarray(dist_ids, dtype=jnp.int32),
        jnp.asarray(irr, dtype=jnp.int32), unit, hdi, problem, eta,
        with_rhs=True)
    jax.block_until_ready(cond.dS)
    t_asm = time.perf_counter() - t0
    print(f"N={N:5d} lean assemble: {t_asm:7.1f}s  "
          f"bF={tuple(cond.bF.shape)} dS={tuple(cond.dS.shape)}  "
          f"rss={rss_gb():.1f}GB", flush=True)
    del mesh, cutdata, batch, cond, geom, cell_loc
    jax.clear_caches()
