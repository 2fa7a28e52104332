"""Compile time + step time of cell_megastep_plane at the 64k grid,
rolled vs unrolled z loop.  Usage: python scratch/megacompile.py [on|off]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from hoomd_tpu.ops.pallas_pair import (cell_megastep_plane,
                                       build_cell_shifts)
from hoomd_tpu._config import PAD_COORD

mode = sys.argv[1] if len(sys.argv) > 1 else 'off'
unroll = mode == 'on'

cell_dim = (12, 14, 14)
C = 40
k = 8
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
    vel[c, :kk] = rng.randn(kk, 3) * 0.1

_, shift_np = build_cell_shifts(cell_dim, np.array([L, L, L]))
shifts = jnp.asarray(shift_np, jnp.float32)
jp, jv = jnp.asarray(pos), jnp.asarray(vel)
jf = jnp.zeros_like(jp)
jm = jnp.asarray(mass)
jw = 1.0 / jm
pv = jnp.asarray([6.25, 0.0, 4.0, 4.0, 2.5], jnp.float32)  # rc2,eshift,lj1,lj2,rcut
kt = jnp.ones((k,), jnp.float32)

t0 = time.perf_counter()
out = cell_megastep_plane(jp, jv, jf, jm, jw, cell_dim, shifts, pv,
                          jnp.float32(0.005), kt, jnp.float32(0.0),
                          jnp.float32(0.0), jnp.float32(0.43), C=C, k=k,
                          method='nvt', eval_name='lj',
                          pnames=('lj1', 'lj2', 'rcut'), recip='approx',
                          ndof=3.0 * N, tau_inv2=4.0, unroll_z=unroll)
jax.block_until_ready(out)
t_compile = time.perf_counter() - t0
print(f"unroll={unroll}: first call {t_compile:.1f} s", flush=True)

t0 = time.perf_counter()
reps = 20
for _ in range(reps):
    out = cell_megastep_plane(jp, jv, jf, jm, jw, cell_dim, shifts, pv,
                              jnp.float32(0.005), kt, jnp.float32(0.0),
                              jnp.float32(0.0), jnp.float32(0.43), C=C,
                              k=k, method='nvt', eval_name='lj',
                              pnames=('lj1', 'lj2', 'rcut'),
                              recip='approx', ndof=3.0 * N, tau_inv2=4.0,
                              unroll_z=unroll)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / reps / k
print(f"unroll={unroll}: {dt*1e3:.3f} ms/step -> "
      f"{N/dt/1e6:.1f}M pss kernel-only", flush=True)
