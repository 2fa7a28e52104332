"""Honest kernel timing: full stencil vs lean N3L megastep at 64k."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from hoomd_tpu.ops.pallas_pair import cell_megastep_planes, build_cell_shifts
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
skin = jnp.float32(0.4)

def planes(a):
    return jnp.transpose(a.reshape(nz, ny, nx, C, 3), (4, 0, 1, 2, 3))
gp = planes(jnp.asarray(pos))
gv = planes(jnp.asarray(vel))
gf = jnp.zeros_like(gp)
gm4 = jnp.asarray(mass).reshape(nz, ny, nx, C)
gw4 = 1.0 / gm4
z = jnp.zeros(())

def make_chain(k, m, half, unroll=False):
    kt = jnp.ones((k,), jnp.float32)
    common = dict(C=C, k=k, method='nvt', eval_name='lj',
                  pnames=('lj1', 'lj2', 'rcut'), recip='approx',
                  ndof=3.0 * N, tau_inv2=4.0, unroll_z=unroll, half=half)
    @jax.jit
    def chain(gp, gv, gf):
        def wstep(_, st):
            p, v, f = st
            p, v, f, xi, eta, d, ke, md = cell_megastep_planes(
                p, v, f, gw4, gm4, p, cell_dim, shifts, pv, dt, kt, z,
                z, skin, **common)
            return p, v, f
        p, v, f = jax.lax.fori_loop(0, m, wstep, (gp, gv, gf))
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
        float(out[3])
    el = (time.perf_counter() - t0) / reps
    per = (el - 0.015) / steps
    print(f"{label}: compile {tc:5.1f}s  raw {el*1e3:8.2f} ms/dispatch  "
          f"~{per*1e3:6.3f} ms/step  ({N/per/1e6:6.1f}M pss)", flush=True)

for half in (False, 'lean'):
    honest(make_chain(8, 16, half), 128, f"k=8 m=16 half={half!s:5} rolled")
