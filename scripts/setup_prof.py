"""Profile the bench SETUP phase piece by piece on the real backend
(VERDICT r3: setup_s = 23.2 s warm = 30% of end-to-end at 1024^2).

Usage: python scripts/setup_prof.py [N] [k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTON_TPU_X64", "1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
k = int(sys.argv[2]) if len(sys.argv) > 2 else 1

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from proton_tpu.core.geometry import cell_geometry
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.methods import assembly

hdi = HHODegreeInfo(k + 1, k)
problem = fs.default_problem()
eta = fs.nitsche_eta(k)

jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))


def tic(label, t0):
    print(f"  {label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return time.perf_counter()


t0 = time.perf_counter()
path = fs._setup_cache_file(N, 4, True, problem.cache_key)
hit = fs._classify_from_cache(N, path)
t0 = tic("classify cache load (np.load + topo jit + device_put)", t0)
if hit is None:
    print("  (cache MISS — run bench once first)", flush=True)
    sys.exit(0)
mesh, cutdata, cut_ids, cell_loc, batch, dist_ids = hit
jax.device_get(jnp.sum(mesh.points))
t0 = tic("points sync", t0)

geom = jax.jit(cell_geometry)(mesh)
jax.device_get(jnp.sum(geom.bar))
t0 = tic("cell_geometry jit+run", t0)

dofmap = assembly.build_dofmap_structured(N, hdi)
t0 = tic("build_dofmap_structured (host)", t0)
jax.device_get(jnp.sum(dofmap.asm_idx[:64]))
t0 = tic("dofmap device sync", t0)

sub = fs.cut64_condensed_cached(N, batch, hdi, problem, eta,
                                with_rhs=True)
jax.device_get(jnp.sum(sub.S[:, :16]))
t0 = tic("cut64_condensed_cached", t0)
