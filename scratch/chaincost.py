"""Isolate the cost of chaining megastep windows in a fori_loop vs the
standalone cell_megastep_plane call (which includes transposes)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from hoomd_tpu.ops.pallas_pair import (cell_megastep_plane,
                                       cell_megastep_planes,
                                       build_cell_shifts)
from hoomd_tpu._config import PAD_COORD

cell_dim = (12, 14, 14)
C = 40
nx, ny, nz = cell_dim
nc = nx * ny * nz
rho = 0.8442
N = 64000
L = (N / rho) ** (1.0 / 3.0)
w = np.array([L / nx, L / ny, L / nz])

rng = np.random.RandomState(0)
pos = np.full((nc, C, 3), PAD_COORD, np.float32)
vel = np.zeros((nc, C, 3), np.float32)
mass = np.ones((nc, C), np.float32)
mean = N / nc
for c in range(nc):
    iz, iy, ix = c // (nx * ny), (c // nx) % ny, c % nx
    kk = min(C, int(rng.poisson(mean)))
    org = np.array([ix, iy, iz]) * w - L / 2
    pos[c, :kk] = (org + rng.uniform(0, 1, (kk, 3)) * w).astype(np.float32)
    vel[c, :kk] = (rng.randn(kk, 3) * 0.1).astype(np.float32)

_, shift_np = build_cell_shifts(cell_dim, np.array([L, L, L]))
shifts = jnp.asarray(shift_np, jnp.float32)
pv = jnp.asarray([6.25, 0.0, 4.0, 4.0, 2.5], jnp.float32)
dt = jnp.float32(0.005)
skin = jnp.float32(0.43)
k = 8
kt = jnp.ones((k,), jnp.float32)
z = jnp.zeros((), jnp.float32)

jp, jv = jnp.asarray(pos), jnp.asarray(vel)
jf = jnp.zeros_like(jp)
jm = jnp.asarray(mass)
jw = 1.0 / jm

common = dict(C=C, k=k, method='nvt', eval_name='lj',
              pnames=('lj1', 'lj2', 'rcut'), recip='approx',
              ndof=3.0 * N, tau_inv2=4.0, unroll_z=False)


def bench(fn, label, steps_per_call, reps=16):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / reps / steps_per_call
    print(f"{label}: {el*1e3:7.3f} ms/step  ({N/el/1e6:6.1f}M pss)",
          flush=True)


# 1. standalone wrapper (transposes + one pallas_call)
bench(lambda: cell_megastep_plane(jp, jv, jf, jm, jw, cell_dim, shifts,
                                  pv, dt, kt, z, z, skin, **common),
      "plane wrapper (1 call + transposes)", k)


def planes(a):
    return jnp.transpose(a.reshape(nz, ny, nx, C, 3), (4, 0, 1, 2, 3))


gp, gv, gf = planes(jp), planes(jv), planes(jf)
gm4 = jm.reshape(nz, ny, nx, C)
gw4 = 1.0 / gm4

# 2. planes entry, single call (jitted wrapper, no transposes)
bench(lambda: cell_megastep_planes(gp, gv, gf, gw4, gm4, gp, cell_dim,
                                   shifts, pv, dt, kt, z, z, skin,
                                   **common),
      "planes entry (1 call, no transpose)", k)


# 3. chained m windows inside one jit
@functools.partial(jax.jit, static_argnames=('m',))
def chain(gp, gv, gf, *, m):
    def wstep(_, st):
        p, v, f = st
        p, v, f, xi, eta, d, _, md = cell_megastep_planes(
            p, v, f, gw4, gm4, gp, cell_dim, shifts, pv, dt, kt, z, z,
            skin, **common)
        return p, v, f
    return jax.lax.fori_loop(0, m, wstep, (gp, gv, gf))


for m in (1, 2, 4):
    bench(lambda m=m: chain(gp, gv, gf, m=m), f"chained fori m={m}", k * m)
