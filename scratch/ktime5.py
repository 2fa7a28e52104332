"""Per-step time of chained cell_megastep_planes windows vs kernel k.
Measures: for each k in {1,2,4,8}, m windows chained so total steps = 16,
time per step.  Also times the pallas rebin and the sort rebin.
"""
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
params = jnp.array([6.25, 0.0, 4.0, 4.0, 2.5], jnp.float32)
import sys as _s
UNROLL = (_s.argv[1] == 'on') if len(_s.argv) > 1 else True
dt = jnp.float32(0.005)
skin = jnp.float32(0.4)


def planes(a):
    return jnp.transpose(a.reshape(nz, ny, nx, C, 3), (4, 0, 1, 2, 3))


gp = planes(jnp.asarray(pos))
gv = planes(jnp.asarray(vel))
gf = jnp.zeros_like(gp)
gm = jnp.asarray(mass).reshape(nz, ny, nx, C)
gw = 1.0 / gm

TOT = 16
for k in (1, 2, 4, 8):
    m = TOT // k
    kt = jnp.ones((k,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=('k', 'm'))
    def run(gp, gv, gf, *, k, m):
        def wstep(_, st):
            p, v, f, dng, wmax = st
            p, v, f, xi, eta, d, _, md = cell_megastep_planes(
                p, v, f, gw, gm, gp, cell_dim, shifts, params, dt,
                jnp.ones((k,), jnp.float32), jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32), skin, C=C, k=k,
                method='nvt', eval_name='lj',
                pnames=('lj1', 'lj2', 'rcut'),
                recip='approx', ndof=3.0 * N, tau_inv2=4.0,
                unroll_z=UNROLL)
            return p, v, f, dng | d, jnp.maximum(wmax, md)
        st = jax.lax.fori_loop(
            0, m, wstep,
            (gp, gv, gf, jnp.zeros((), jnp.bool_),
             jnp.zeros((), jnp.float32)))
        return st

    t0 = time.time()
    out = run(gp, gv, gf, k=k, m=m)
    jax.block_until_ready(out)
    tc = time.time() - t0
    reps = 8
    t0 = time.time()
    for _ in range(reps):
        out = run(gp, gv, gf, k=k, m=m)
    jax.block_until_ready(out)
    el = (time.time() - t0) / reps
    print(f"k={k} m={m}: compile {tc:6.1f}s  "
          f"{el / TOT * 1e3:7.3f} ms/step  "
          f"({N * TOT / el / 1e6:6.1f}M pss kernel-only)", flush=True)
