"""True per-op costs at 1024^2: each op chained R times inside ONE jit
(data-dependent chain so XLA can't elide), amortizing the remote
dispatch floor. Also prototypes the UNIFORM-STENCIL matvec: the
condensed operator of the generated mesh is a constant-coefficient
stencil away from the interface (see fictdom_structured
_unit_cell_condensed), so the matvec needs to read only x — not the
[nfd*nfd, C] S array.

Usage: python scripts/op_chain_prof.py [N] [k]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
os.environ.setdefault("PROTON_TPU_X64", "0")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from proton_tpu.core import bases
from proton_tpu.core.ops import HHODegreeInfo
from proton_tpu.cut import fictdom_structured as fs
from proton_tpu.methods import cells_last as cl
from proton_tpu.methods.structured import make_structured_system

hdi = HHODegreeInfo(k + 1, k)
fbs = bases.face_basis_size(hdi.face_degree)
nfd = 4 * fbs
sys_f = make_structured_system(N, N, fbs)
key = jax.random.PRNGKey(0)
x = cl.GridVecCL(
    jax.random.normal(key, (fbs, N + 1, N), jnp.float32),
    jax.random.normal(key, (fbs, N, N + 1), jnp.float32))

# random S (value-agnostic for timing); SPD-ish not needed
S_fine = jax.random.normal(key, (nfd * nfd, N * N), jnp.float32)

R = 20


def chain(label, op, *args, reps=R):
    """Time op chained `reps` times inside one jit (per-apply ms)."""
    def run(v, *a):
        def body(_, vv):
            out = op(vv, *a)
            # re-normalize so the chain can't over/underflow
            return jax.tree.map(lambda t: t * 0.999, out)
        return jax.lax.fori_loop(0, reps, body, v)

    f = jax.jit(run)
    out = jax.block_until_ready(f(x, *args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(x, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (3 * reps) * 1e3
    print(f"{label:36s} {dt:8.3f} ms", flush=True)


def t_dispatch():
    f = jax.jit(lambda v: jax.tree.map(lambda t: t + 1.0, v))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(x)
    jax.block_until_ready(out)
    print(f"{'dispatch floor (x+1)':36s} "
          f"{(time.perf_counter()-t0)/50*1e3:8.3f} ms", flush=True)


t_dispatch()

# current matvec
chain("matvec (S-read)",
      lambda v, S: cl.make_structured_operator_cl(sys_f, S)(v), S_fine)

# gather/scatter/mask
chain("gather+scatter",
      lambda v: cl.grid_scatter_cl(sys_f, cl.grid_gather_cl(sys_f, v)))
chain("mask", lambda v: cl.mask_cl(sys_f, v))

# block-jacobi
iH = jax.random.normal(key, (fbs, fbs, N + 1, N), jnp.float32)
iV = jax.random.normal(key, (fbs, fbs, N, N + 1), jnp.float32)
chain("block-jacobi (plane-read)",
      lambda v, a, b: cl.apply_block_jacobi_cl(a, b, v), iH, iV)


# ---------------- uniform-stencil matvec (pure XLA shifts) --------------
def uniform_matvec(S_u):
    """apply_S for CONSTANT per-cell S (S_u [nfd, nfd] np.ndarray of
    Python floats -> scalar multiply-adds on shifted planes)."""
    Su = np.asarray(S_u)
    b, r, t, l = (0, fbs, 2 * fbs, 3 * fbs)   # slot offsets

    def shift_rows(a, d):
        # a [fbs, Ny(+1), ...] -> rows shifted by d (zero fill)
        if d == 0:
            return a
        z = jnp.zeros_like(a[:, :abs(d)])
        return (jnp.concatenate([a[:, d:], z], axis=1) if d > 0
                else jnp.concatenate([z, a[:, :d]], axis=1))

    def shift_lanes(a, d):
        if d == 0:
            return a
        z = jnp.zeros_like(a[..., :abs(d)])
        return (jnp.concatenate([a[..., d:], z], axis=-1) if d > 0
                else jnp.concatenate([z, a[..., :d]], axis=-1))

    def apply(v):
        H = v.H * sys_f.freeH[None]
        V = v.V * sys_f.freeV[None]
        # contrib planes on the CELL grid [fbs, Ny, Nx] per slot row s:
        # c[s] = sum_s' S[s, s'] xl[s']
        xl = [None] * nfd
        for m in range(fbs):
            xl[b + m] = H[m, :-1, :]
            xl[t + m] = H[m, 1:, :]
            xl[l + m] = V[m, :, :-1]
            xl[r + m] = V[m, :, 1:]
        c = [sum(float(Su[s, s2]) * xl[s2] for s2 in range(nfd))
             for s in range(nfd)]
        zrow = jnp.zeros((1, N), jnp.float32)
        yH = jnp.stack([
            jnp.concatenate([c[b + m], zrow], axis=0) +
            jnp.concatenate([zrow, c[t + m]], axis=0)
            for m in range(fbs)])
        zcol = jnp.zeros((N, 1), jnp.float32)
        yV = jnp.stack([
            jnp.concatenate([c[l + m], zcol], axis=1) +
            jnp.concatenate([zcol, c[r + m]], axis=1)
            for m in range(fbs)])
        return cl.GridVecCL(
            yH * sys_f.freeH[None] + v.H * (~sys_f.freeH[None]),
            yV * sys_f.freeV[None] + v.V * (~sys_f.freeV[None]))

    return apply


S_u = np.random.default_rng(0).standard_normal((nfd, nfd)).astype(np.float32)
chain("matvec UNIFORM stencil (XLA)", uniform_matvec(S_u))

# correctness: uniform stencil == S-read matvec with broadcast S
Sb = jnp.broadcast_to(jnp.asarray(S_u).reshape(nfd * nfd, 1), (nfd * nfd,
                                                               N * N))
y1 = jax.jit(lambda v, S: cl.make_structured_operator_cl(sys_f, S)(v))(
    x, Sb)
y2 = jax.jit(uniform_matvec(S_u))(x)
err = max(float(jnp.max(jnp.abs(y1.H - y2.H))),
          float(jnp.max(jnp.abs(y1.V - y2.V))))
ref = float(jnp.max(jnp.abs(y1.H)))
print(f"uniform == S-read: rel err {err/ref:.2e}", flush=True)

# indexed patch-style gather+scatter cost (the cut-patch smoother shape)
ids = np.unique(np.random.default_rng(1).integers(0, N * N, 25000))
jj = jnp.asarray(ids // N, jnp.int32)
ii = jnp.asarray(ids % N, jnp.int32)


def patch_shape(v):
    rl = jnp.concatenate([v.H[:, jj, ii], v.V[:, jj, ii + 1],
                          v.H[:, jj + 1, ii], v.V[:, jj, ii]], axis=0)
    rl = rl * 1.0001
    xc = rl.reshape(4, fbs, -1)
    H = jnp.zeros_like(v.H)
    H = H.at[:, jj, ii].add(xc[0]).at[:, jj + 1, ii].add(xc[2])
    V = jnp.zeros_like(v.V)
    V = V.at[:, jj, ii].add(xc[3]).at[:, jj, ii + 1].add(xc[1])
    return cl.GridVecCL(H, V)


print(f"patch ids: {len(ids)}", flush=True)
chain("patch-style gather+scatter (25k)", patch_shape)
