"""HONEST kernel timing: block_until_ready on the axon tunnel does NOT
wait for remote completion (measured: np.asarray after 'blocking' takes
longer than the 'blocked' time).  Every timing here forces a device->host
fetch of a scalar derived from the full result.  Tunnel round-trip is
amortized by putting many steps in one dispatch."""
import sys
sys.path.insert(0, "/root/repo")
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from hoomd_tpu.ops.pallas_pair import (cell_megastep_planes,
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
z = jnp.zeros((), jnp.float32)

jp, jv = jnp.asarray(pos), jnp.asarray(vel)
jf = jnp.zeros_like(jp)
jm = jnp.asarray(mass)


def planes(a):
    return jnp.transpose(a.reshape(nz, ny, nx, C, 3), (4, 0, 1, 2, 3))


gp, gv, gf = planes(jp), planes(jv), planes(jf)
gm4 = jm.reshape(nz, ny, nx, C)
gw4 = 1.0 / gm4


def make_chain(k, m, unroll):
    kt = jnp.ones((k,), jnp.float32)
    common = dict(C=C, k=k, method='nvt', eval_name='lj',
                  pnames=('lj1', 'lj2', 'rcut'), recip='approx',
                  ndof=3.0 * N, tau_inv2=4.0, unroll_z=unroll)

    @jax.jit
    def chain(gp, gv, gf):
        def wstep(_, st):
            p, v, f = st
            p, v, f, xi, eta, d, ke, md = cell_megastep_planes(
                p, v, f, gw4, gm4, p, cell_dim, shifts, pv, dt, kt, z,
                z, skin, **common)
            return p, v, f
        p, v, f = jax.lax.fori_loop(0, m, wstep, (gp, gv, gf))
        # scalar probe forces full completion at fetch time
        return p, v, f, jnp.sum(v[0, 0, 0, 0, :8])
    return chain


def honest(fn, steps, label, reps=3):
    t0 = time.perf_counter()
    out = fn(gp, gv, gf)
    float(out[3])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(gp, gv, gf)
        float(out[3])             # forced fetch per rep
    el = (time.perf_counter() - t0) / reps
    per = (el - 0.015) / steps    # subtract ~15ms tunnel round-trip
    print(f"{label}: compile {tc:5.1f}s  raw {el*1e3:8.2f} ms/dispatch  "
          f"~{per*1e3:6.3f} ms/step  ({N/per/1e6:6.1f}M pss)", flush=True)


for k, m in ((8, 16), (4, 32), (2, 64), (8, 64)):
    honest(make_chain(k, m, False), k * m, f"k={k} m={m} rolled")
